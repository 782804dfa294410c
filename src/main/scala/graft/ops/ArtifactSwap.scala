package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Driver-side file IO for the maintenance swaps' crash protocol.
  *
  * A COMMIT marker, written only after the scratch artifact is complete,
  * turns crash recovery from a heuristic ("do the live inputs still
  * exist?") into a decision ("was this swap committed?"). The heuristic
  * failed two reviewed crash windows: a crash MID-retire (some inputs
  * already deleted) looked like a pre-swap crash, so the scratch — by then
  * the only complete copy — was discarded, silently losing the retired
  * inputs' data; and a partially-deleted live dir (fs.delete of a parquet
  * dir is not atomic on a local filesystem) looked intact, with the same
  * outcome. With the marker: committed → FINISH the swap idempotently
  * (re-delete remnants, promote whatever is still in scratch); not
  * committed → the live inputs are untouched by construction, discard.
  *
  * The manifests make retirement PRECISE instead of wildcard:
  *  - `applied_tombs` lists the tombstone dirs the compactor actually
  *    applied, so a tombstone written CONCURRENTLY by a delete stream
  *    (between the compactor's listing and the retire) is never destroyed
  *    unapplied — destroying one resurrects deleted docs, while retaining
  *    an already-applied one is safe (serve-time corrections are
  *    idempotent on rows that no longer exist);
  *  - `retire_segs` lists the exact segment dirs being replaced, so a
  *    segment appended AFTER the crash but BEFORE recovery (the ingest
  *    stream's next batch) survives the finish instead of being wiped by
  *    a delete-all-segments loop.
  */
private[graft] object ArtifactSwap {
  val CommitMarker = "_COMMIT"
  val TombManifest = "applied_tombs"
  val SegManifest = "retire_segs"

  def commit(fs: FileSystem, scratch: String): Unit = {
    val o = fs.create(new Path(s"$scratch/$CommitMarker"), true)
    o.close()
  }

  def committed(fs: FileSystem, scratch: String): Boolean =
    fs.exists(new Path(s"$scratch/$CommitMarker"))

  def writeManifest(fs: FileSystem, scratch: String, name: String,
      paths: Seq[String]): Unit = {
    val o = fs.create(new Path(s"$scratch/$name"), true)
    o.write(paths.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    o.close()
  }

  def readManifest(fs: FileSystem, scratch: String, name: String): Seq[String] = {
    val p = new Path(s"$scratch/$name")
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** Delete exactly the manifested paths (idempotent — missing is fine). */
  def retire(fs: FileSystem, paths: Seq[String]): Unit =
    paths.foreach(t => fs.delete(new Path(t), true))

  /** The tombstone dirs under an artifact root right now — the listing a
    * policy takes BEFORE compacting, so the manifest is a subset of what
    * the compactor applies (tombstones are append-only between the two
    * listings; retiring a subset is safe, retiring a superset is not). */
  def tombDirs(fs: FileSystem, root: String): Seq[String] = {
    val tomb = new Path(s"$root/tombstones")
    if (!fs.exists(tomb)) Seq.empty
    else fs.listStatus(tomb).filter(_.isDirectory)
      .map(_.getPath.toString).sorted.toSeq
  }
}
