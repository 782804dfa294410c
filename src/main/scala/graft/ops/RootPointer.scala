package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** VERSIONED-ROOT SERVING POINTER — the mechanism that makes the
  * single-writer / many-readers contract enforceable instead of
  * documented: the in-place maintenance swaps ([[graft.ops.Similarity
  * .maybeMaintainIvf]], [[graft.ops.Retrieval.maybeCompactLex]]) assume
  * one serving process coordinating the maintenance window; a FLEET of
  * readers cannot coordinate, so maintenance must roll roots forward
  * copy-on-write and flip a pointer. This object is that pointer.
  *
  * Layout under a `base` directory:
  * {{{
  *   base/v00001/...        # a complete artifact root (immutable once published)
  *   base/v00001/_ROOT_COMPLETE
  *   base/v00002/...        # the next root being staged (no marker yet)
  *   base/_CURRENT          # tiny file naming the published version
  * }}}
  *
  * WRITER protocol (single maintenance writer, the policies' contract):
  *  1. stage the full artifact into `base/v<next>`;
  *  2. [[publish]] — writes `_ROOT_COMPLETE` into the version dir, THEN
  *     updates `_CURRENT`.
  * READER protocol: [[resolve]] once per serve, then read only under the
  * resolved root. A reader can NEVER observe an incomplete root:
  *  - the pointer is only ever updated AFTER the completeness marker, so
  *    whatever version it names is complete;
  *  - if the pointer itself is mid-rewrite (the one non-atomic window —
  *    a tiny create-overwrite), [[resolve]] falls back to the NEWEST
  *    version carrying `_ROOT_COMPLETE`, which is either the old current
  *    (marker order) or the new one — both complete;
  *  - published roots are IMMUTABLE: maintenance never touches them, so
  *    a serve that resolved v1 keeps reading consistent files even while
  *    v2 publishes and after the pointer flips (retirement is the only
  *    mutation, and it honors a grace window — [[retireOld]]).
  *
  * The price of reader isolation is one artifact copy per maintenance
  * window (the clone the versioned policies stage into) — the documented
  * fleet trade; the in-place policies remain the single-process economy
  * path. */
object RootPointer {
  val Pointer = "_CURRENT"
  val Complete = "_ROOT_COMPLETE"
  private val VersionRe = "^v(\\d{5})$".r

  private def fsOf(s: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** All version dirs under base carrying the completeness marker,
    * oldest → newest. */
  def completeVersions(s: SparkSession, base: String): Seq[String] = {
    val fs = fsOf(s, base)
    val b = new Path(base)
    if (!fs.exists(b)) Seq.empty
    else fs.listStatus(b).toSeq
      .filter(st => st.isDirectory && VersionRe.findFirstIn(st.getPath.getName).isDefined)
      .map(_.getPath.getName).sorted
      .filter(v => fs.exists(new Path(s"$base/$v/$Complete")))
  }

  /** The next version NAME to stage into (max existing + 1, complete or
    * not — a crashed staging dir must not be reused until cleaned). */
  def nextVersion(s: SparkSession, base: String): String = {
    val fs = fsOf(s, base)
    val b = new Path(base)
    val maxN =
      if (!fs.exists(b)) 0
      else fs.listStatus(b).toSeq.map(_.getPath.getName).collect {
        case VersionRe(n) => n.toInt
      }.foldLeft(0)(math.max)
    f"v${maxN + 1}%05d"
  }

  /** Mark `version` complete and flip the pointer to it. The marker write
    * precedes the pointer write — the order the reader fallback relies
    * on. */
  def publish(s: SparkSession, base: String, version: String): Unit = {
    val fs = fsOf(s, base)
    require(fs.exists(new Path(s"$base/$version")),
      s"cannot publish missing version dir $base/$version")
    val m = fs.create(new Path(s"$base/$version/$Complete"), true)
    m.close()
    val o = fs.create(new Path(s"$base/$Pointer"), true)
    o.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    o.close()
  }

  /** Resolve the current serving root (a full path under base). Pointer
    * first; if it is missing, unreadable, or names an incomplete/absent
    * version (the mid-rewrite window, or a crashed publish), fall back to
    * the newest COMPLETE version. Throws only when nothing was ever
    * published. */
  def resolve(s: SparkSession, base: String): String = {
    val fs = fsOf(s, base)
    val p = new Path(s"$base/$Pointer")
    val fromPointer: Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val v =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        Some(v).filter(v => v.nonEmpty &&
          fs.exists(new Path(s"$base/$v/$Complete")))
      }
    val v = fromPointer.orElse(completeVersions(s, base).lastOption)
      .getOrElse(throw new IllegalStateException(
        s"no published artifact root under $base"))
    s"$base/$v"
  }

  /** Retire published roots past the grace window: keep the newest `keep`
    * complete versions (and always the pointer target, whichever it is).
    * Returns the deleted version names. Writer-only call — run it AFTER a
    * publish, when every serve started before the flip has had its grace
    * window. */
  def retireOld(s: SparkSession, base: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = fsOf(s, base)
    val current = resolve(s, base).split('/').last
    val victims = completeVersions(s, base).dropRight(keep)
      .filter(_ != current)
    victims.foreach(v => fs.delete(new Path(s"$base/$v"), true))
    victims
  }

  /** Delete UNPUBLISHED version dirs (no completeness marker) — crashed
    * stagings. Writer-only: only the single maintenance writer creates
    * version dirs, so any unmarked one it did not just create is a crash
    * remnant, never an in-flight publish. */
  def cleanStaging(s: SparkSession, base: String): Seq[String] = {
    val fs = fsOf(s, base)
    val b = new Path(base)
    if (!fs.exists(b)) return Seq.empty
    val victims = fs.listStatus(b).toSeq
      .filter(st => st.isDirectory && VersionRe.findFirstIn(st.getPath.getName).isDefined)
      .map(_.getPath.getName)
      .filter(v => !fs.exists(new Path(s"$base/$v/$Complete")))
    victims.foreach(v => fs.delete(new Path(s"$base/$v"), true))
    victims.sorted
  }

  /** Recursive dir copy (Hadoop FileUtil) — the clone step of a versioned
    * maintenance pass. */
  private[graft] def copyDir(s: SparkSession, src: String, dst: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val sp = new Path(src); val dp = new Path(dst)
    val fs = sp.getFileSystem(conf)
    require(fs.exists(sp), s"copyDir: missing source $src")
    require(org.apache.hadoop.fs.FileUtil.copy(fs, sp, fs, dp, false, conf),
      s"copyDir: failed $src -> $dst")
  }
}
