package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.RedskinsPipeline

/** Exhaustive/randomized invariants for the pure pieces (plain loops — the
  * domains are small enough to sweep fully or with a seeded RNG). */
class PropertySpec extends AnyFunSuite with CacheHygiene {

  test("election day is always the first Tuesday after the first Monday of November") {
    (1848 to 2096).foreach { y =>
      var monday = java.time.LocalDate.of(y, 11, 1)
      while (monday.getDayOfWeek != java.time.DayOfWeek.MONDAY) monday = monday.plusDays(1)
      val expected = monday.plusDays(1)
      val got = RedskinsPipeline.electionDays(y, y).head.toLocalDate
      assert(got == expected, s"year $y")
      assert(got.getDayOfWeek == java.time.DayOfWeek.TUESDAY)
      assert(got.getDayOfMonth >= 2 && got.getDayOfMonth <= 8)
    }
  }

  test("simhash band decomposition covers hamming<=3 by pigeonhole") {
    val rnd = new scala.util.Random(42)
    (1 to 10000).foreach { _ =>
      val v = rnd.nextLong() & ((1L << 48) - 1)
      val flips = Seq.fill(rnd.nextInt(4))(rnd.nextInt(48))
      val w = flips.foldLeft(v)((acc, b) => acc ^ (1L << b))
      val bandsEqual = (0 until 4).exists { k =>
        ((v >> (k * 12)) & 0xfff) == ((w >> (k * 12)) & 0xfff)
      }
      assert(bandsEqual, s"v=$v flips=$flips")
    }
  }

  test("bloom: split-build + OR-merge equals sequential build, membership total") {
    import graft.functions.BloomUtil
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val bits = 64 << rnd.nextInt(6) // 64..2048, power of two
      val k = 1 + rnd.nextInt(5)
      val xs = Array.fill(1 + rnd.nextInt(200))(rnd.nextLong())
      def fresh() = { val w = new Array[Long](1 + bits / 64); w(0) = k.toLong; w }
      val whole = fresh()
      xs.foreach(BloomUtil.add(whole, _))
      // split anywhere, build halves, OR-merge — must be bit-identical
      // (this is exactly what partial aggregation does across partitions)
      val cut = rnd.nextInt(xs.length + 1)
      val (a, b) = (fresh(), fresh())
      xs.take(cut).foreach(BloomUtil.add(a, _))
      xs.drop(cut).foreach(BloomUtil.add(b, _))
      (1 until a.length).foreach(i => a(i) |= b(i))
      assert(a.toSeq == whole.toSeq, s"bits=$bits k=$k n=${xs.length} cut=$cut")
      // no false negatives, ever
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(whole)
      xs.foreach(x => assert(BloomUtil.contains(arr, x), s"member $x reported absent"))
    }
  }

  test("rank-sort helper orders by (df, value) with df=1 for unknowns") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val vals = Array.fill(rnd.nextInt(30))(rnd.nextLong() % 1000)
      val heavy = vals.distinct.filter(_ => rnd.nextBoolean())
        .map(v => v -> (2L + rnd.nextInt(100))).toMap
      val table = graft.functions.RankSort.buildTable(heavy.toArray)
      val bc = TestSpark.spark.sparkContext.broadcast(table)
      val got = graft.functions.RankSort
        .sortByRank(new GenericArrayData(vals), bc).toLongArray().toSeq
      val want = vals.sortBy(x => (heavy.getOrElse(x, 1L), x)).toSeq
      assert(got == want, s"vals=${vals.toSeq} heavy=$heavy")
    }
    // empty array and empty table
    val empty = TestSpark.spark.sparkContext.broadcast(
      graft.functions.RankSort.buildTable(Array.empty))
    assert(graft.functions.RankSort
      .sortByRank(new GenericArrayData(Array.empty[Long]), empty)
      .numElements() == 0)
  }

  test("srp buckets: interpreted eval matches plane-by-plane recomputation") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val tables = 3; val bits = 4; val dim = 64
    val planes = graft.ops.Similarity.srpPlanes(tables * bits)
    val expr = graft.functions.SrpBuckets(
      Literal(new GenericArrayData(Array.empty[Double]),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      planes.flatten.toSeq, tables, bits)
    val rnd = new scala.util.Random(5)
    (1 to 50).foreach { _ =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val got = expr.nullSafeEval(new GenericArrayData(v))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
      val want = (0 until tables).map { t =>
        (0 until bits).foldLeft(0) { (acc, j) =>
          val dot = planes(t * bits + j).zip(v).map { case (a, b) => a * b }.sum
          if (dot > 0) acc | (1 << j) else acc
        }
      }
      assert(got == want)
    }
  }

  test("topk aggregate equals sort-and-take under random splits and merges") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val agg = graft.functions.TopKAgg(
      BoundReference(0, DoubleType, nullable = false),
      BoundReference(1, LongType, nullable = false), 3)
    val rnd = new scala.util.Random(23)
    (1 to 300).foreach { _ =>
      // duplicate scores are common on purpose (tie-break must pick lower
      // id) and NaN appears occasionally: the IEEE total order ranks it
      // above every number, like DESC sort in both engines
      val rows = Seq.fill(rnd.nextInt(40))(
        (if (rnd.nextInt(12) == 0) Double.NaN else rnd.nextInt(6).toDouble,
          rnd.nextLong() % 100))
      // split into random partitions, update each, merge pairwise
      val parts = rows.grouped(math.max(1, rnd.nextInt(5) + 1)).toSeq
      val bufs = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach { case (s, i) =>
          agg.update(b, org.apache.spark.sql.catalyst.InternalRow(s, i))
        }
        // exercise the serde path the shuffle uses
        agg.deserialize(agg.serialize(b))
      }
      val merged = bufs.foldLeft(agg.createAggregationBuffer())(agg.merge)
      val got = (0 until merged.n).map(j => (merged.scores(j), merged.ids(j)))
      // reference: explicit (Double.compare desc, id asc) sort — the same
      // total order the aggregate and the window oracle use
      val wantDup = rows.sortWith { (x, y) =>
        val c = java.lang.Double.compare(x._1, y._1)
        c > 0 || (c == 0 && x._2 < y._2)
      }.take(3)
      // compare via Double.compare-aware equality (NaN == NaN here)
      val same = got.length == wantDup.length && got.zip(wantDup).forall {
        case ((gs, gi), (ws, wi)) =>
          java.lang.Double.compare(gs, ws) == 0 && gi == wi
      }
      assert(same, s"rows=$rows got=$got want=$wantDup")
    }
  }

  test("cluster fallback: a chain deeper than the round cap still converges") {
    val s = TestSpark.spark
    import s.implicits._
    // a 160-node chain has diameter 159 ≫ the 50-round min-label cap, so
    // clusterPairs must route through the large-star/small-star fallback
    // and still produce the exact labeling (everything → node 0)
    val pairs = (0L until 160L).sliding(2).map(w => (w(0), w(1))).toSeq
    val got = graft.ops.Dedup.clusterPairs(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 160)
    assert(got.map(_._1).toSeq == (0L until 160L).toSeq)
    assert(got.forall(_._2 == 0L), got.filterNot(_._2 == 0L).take(5).mkString(","))
  }

  test("large-star/small-star equals union-find on random graphs") {
    val sc = TestSpark.spark.sparkContext
    val rnd = new scala.util.Random(17)
    (1 to 4).foreach { trial =>
      val n = 40 + rnd.nextInt(60)
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = graft.ops.Dedup.starCluster(sc.parallelize(edges, 4))
        .collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("bench jstr emits valid JSON string literals for hostile input") {
    // strict decoder for exactly the escapes jstr may emit — any raw
    // control char, unescaped quote, or unknown escape fails the test
    def decode(lit: String): String = {
      assert(lit.length >= 2 && lit.head == '"' && lit.last == '"', lit)
      val body = lit.substring(1, lit.length - 1)
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        body(i) match {
          case '\\' =>
            body(i + 1) match {
              case '"'   => sb += '"'; i += 2
              case '\\'  => sb += '\\'; i += 2
              case 'u'   =>
                sb += Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar
                i += 6
              case other => fail(s"illegal escape \\$other in $lit")
            }
          case '"'          => fail(s"unescaped quote in $lit")
          case c if c < ' ' => fail(s"raw control char ${c.toInt} in $lit")
          case c            => sb += c; i += 1
        }
      }
      sb.toString
    }
    val hostile = Seq("", "\"", "\\", "\\\"", "a\"b\\c", "line\nbreak\ttab\r",
      " ", "q24_dedup_ngram", "/root/testdata/sf0.1")
    val rnd = new scala.util.Random(99)
    val fuzz = Seq.fill(300)(
      Seq.fill(rnd.nextInt(24))(rnd.nextInt(128).toChar).mkString)
    (hostile ++ fuzz).foreach { s0 =>
      assert(decode(Bench.jstr(s0)) == s0, s0.map(_.toInt.toHexString).mkString(" "))
    }
  }

  test("GenCorpus is frozen: changing it would invalidate the BASELINE anchors") {
    // the BASELINE.md anchor table was measured on this exact corpus; any
    // edit to the generator (vocab, lengths, mutation bands) must
    // consciously re-measure, so the first 200 docs' digest is pinned
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0L until 200L).foreach { id =>
      digest.update(GenCorpus.docText(id, 10000L).getBytes("UTF-8"))
    }
    val hex = digest.digest().map("%02x".format(_)).mkString
    assert(hex == GenCorpusSnapshot, s"GenCorpus output changed: $hex — " +
      "re-measure the BASELINE.md anchors and update this pin")
  }
  private val GenCorpusSnapshot = "88ef945ff7b586ff95c833e3acd16f42"

  test("native near-cells ≡ the HOF array_sort formulation it replaced, on random inputs") {
    // graft_near_cells / graft_pq_near must be BIT-identical to the
    // interpreted slice(array_sort(transform(...))) chain — same IEEE op
    // order, same (distance, cent_id) ties — or every IVF oracle hash
    // breaks. Differential over seeded random vectors INSIDE Spark so both
    // sides run the engine's own expression evaluators.
    val s = TestSpark.spark
    graft.functions.VectorFunctions.register(s)
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 8
    val nCents = 17
    val rows = Seq.tabulate(40) { i =>
      (i.toLong, Array.fill(dim)(math.floor(rnd.nextDouble() * 1000) / 250.0 - 2.0))
    }
    val cents = Seq.tabulate(nCents) { c =>
      // duplicated centroid vectors (c and c+100) force exact distance ties
      // so the cent_id tiebreak is actually exercised
      val base = Array.fill(dim)(math.floor(rnd.nextDouble() * 1000) / 250.0 - 2.0)
      Seq((c.toLong, base)) ++ (if (c < 3) Seq((c + 100L, base)) else Nil)
    }.flatten
    val emb = rows.toDF("vec_id", "e")
    val cc = cents.toDF("cent_id", "ce")
      .agg(org.apache.spark.sql.functions.collect_list(
        org.apache.spark.sql.functions.struct($"cent_id", $"ce")).as("cc"))
    val joined = emb.crossJoin(org.apache.spark.sql.functions.broadcast(cc))
    for (k <- Seq(1, 2, 5, 100)) {
      val hof = joined.selectExpr("vec_id",
        s"transform(slice(array_sort(transform(cc, c -> struct(" +
          "graft_dot(e, e) - 2 * graft_dot(e, c.ce) + graft_dot(c.ce, c.ce) AS _d, " +
          s"c.cent_id AS cent_id))), 1, $k), s -> struct(s._d, s.cent_id)) AS r")
        .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
      val native = joined.selectExpr("vec_id", s"graft_near_cells(e, cc, $k) AS r")
        .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
      rows.foreach { case (id, _) =>
        assert(native(id).map(r => (r.getDouble(0), r.getLong(1))) ==
          hof(id).map(r => (r.getDouble(0), r.getLong(1))), s"k=$k vec $id")
      }
    }
    // pq variant: subspace-tagged codebook, argmin must honor the m filter
    val csPq = cents.zipWithIndex.map { case ((id, ce), i) => (i % 4, id, ce) }
      .toDF("m", "cent_id", "ce")
      .agg(org.apache.spark.sql.functions.collect_list(
        org.apache.spark.sql.functions.struct($"m", $"cent_id", $"ce")).as("cs"))
    val jp = emb.crossJoin(org.apache.spark.sql.functions.broadcast(csPq))
    for (m <- 0 until 4) {
      val hof = jp.selectExpr("vec_id",
        s"array_min(transform(filter(cs, c -> c.m = $m), c -> struct(" +
          "graft_dot(e, e) - 2 * graft_dot(e, c.ce) + graft_dot(c.ce, c.ce) AS _d, " +
          "c.cent_id AS cent_id))) AS r")
        .collect().map(r => r.getStruct(1)).map(r => (r.getDouble(0), r.getLong(1)))
      val native = jp.selectExpr("vec_id",
        s"element_at(graft_pq_near(e, cs, $m, 1), 1) AS r")
        .collect().map(r => r.getStruct(1)).map(r => (r.getDouble(0), r.getLong(1)))
      assert(native.toSeq == hof.toSeq, s"m=$m")
    }
  }

  test("hll sketch is partition-layout invariant and merge is associative/commutative/idempotent") {
    val spark = TestSpark.spark
    graft.functions.HllAgg.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)((rnd.nextInt(4096).toLong, (rnd.nextInt(50) + 1).toLong))
    import spark.implicits._
    def stats(parts: Int): (Long, Long) = {
      val st = rows.toDF("bucket", "rho").repartition(parts)
        .agg(org.apache.spark.sql.functions.expr(
          "graft_hll_stats(graft_hll_agg(bucket, rho))").as("st"))
        .select("st.v_empty", "st.s_scaled").head()
      (st.getLong(0), st.getLong(1))
    }
    val base = stats(1)
    Seq(2, 7, 32).foreach { p =>
      assert(stats(p) == base, s"sketch diverged at $p partitions")
    }
    // buffer algebra directly: merge is elementwise max — assoc/comm/idem
    val u = graft.functions.HllUtil
    def sk(pairs: Seq[(Long, Long)]): Array[Byte] = {
      val b = u.newSketch(); pairs.foreach { case (bk, r) => u.update(b, bk, r) }; b
    }
    val (x, y, z) = (sk(rows.take(1000)), sk(rows.slice(1000, 3000)), sk(rows.drop(3000)))
    def m(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val c = a.clone(); u.mergeInto(c, b); c
    }
    assert(java.util.Arrays.equals(m(m(x, y), z), m(x, m(y, z))), "not associative")
    assert(java.util.Arrays.equals(m(x, y), m(y, x)), "not commutative")
    assert(java.util.Arrays.equals(m(x, x), x), "not idempotent")
    // serde round-trip
    val agg = graft.functions.HllAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    assert(java.util.Arrays.equals(agg.deserialize(agg.serialize(x)), x))
  }

  test("BPE merge fold: the generated expression equals the plain-Scala greedy re-pair on random token streams") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.expr
    import graft.ops.TextOps
    def reference(toks: Vector[String], l: String, r: String): Vector[String] =
      toks.tail.foldLeft(Vector(toks.head)) { (acc, x) =>
        if (acc.last == l && x == r) acc.init :+ (l + r) else acc :+ x
      }
    val rnd = new scala.util.Random(1234)
    val syms = Vector("a", "b", "ab", "ba", "aa")
    // 60 random (stream, pair) cases in ONE Spark job: adjacent repeats,
    // self-pairs (l == r), merged-token symbols that must never re-match
    val cases = Vector.fill(60) {
      val toks = Vector.fill(1 + rnd.nextInt(12))(syms(rnd.nextInt(syms.length)))
      val (l, r) = (syms(rnd.nextInt(syms.length)), syms(rnd.nextInt(syms.length)))
      (toks, l, r)
    }
    cases.groupBy { case (_, l, r) => (l, r) }.foreach { case ((l, r), grp) =>
      val got = grp.map(_._1).toDF("toks")
        .select(expr(TextOps.bpeMergeExpr("toks", l, r)).as("m"))
        .collect().map(_.getSeq[String](0).toVector)
      got.zip(grp.map(_._1)).foreach { case (g, toks) =>
        assert(g == reference(toks, l, r), s"toks=$toks merge=($l,$r)")
      }
    }
    // structural invariants on one adversarial stream: merged mass is
    // conserved (concatenation of tokens unchanged) and length shrinks by
    // the number of merges
    val adversarial = Vector("a", "a", "a", "a", "a", "b", "a", "a")
    val out = reference(adversarial, "a", "a")
    assert(out.mkString == adversarial.mkString)
    assert(out == Vector("aa", "aa", "a", "b", "aa"))
  }

  test("graft_cos_hits equals the plain-Scala fold on random vectors, exact through Round HALF_UP") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(s)
    val rnd = new scala.util.Random(77)
    def vec(): Seq[Double] = Seq.fill(8)(rnd.nextGaussian())
    val train = Vector.tabulate(40)(i => (i.toLong, vec()))
    val ev = Vector.tabulate(7)(i => (1000L + i, vec()))
    def nrm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // tau drawn FROM an achieved rounded sim — the >= boundary is exact,
    // so a sim equal to tau must flag (the off-by-ulp failure mode)
    val allSims = for ((_, t) <- train; (_, e) <- ev)
      yield r6(t.zip(e).map { case (a, b) => a * b }.sum / (nrm(t) * nrm(e)))
    Seq(allSims(rnd.nextInt(allSims.length)), 0.2, -0.1).foreach { tau =>
      val evDf = ev.toDF("vec_id", "e")
        .select(col("vec_id"), col("e"), expr("sqrt(graft_dot(e, e))").as("nrm"))
        .agg(collect_list(struct(col("vec_id").as("eid"), col("e").as("ee"),
          expr("nrm").as("en"))).as("ev"))
      val got = train.toDF("vec_id", "e")
        .withColumn("nrm", expr("sqrt(graft_dot(e, e))"))
        .crossJoin(broadcast(evDf))
        .select(col("vec_id"), expr(s"graft_cos_hits(e, nrm, ev, ${tau}D)").as("h"))
        .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
      train.foreach { case (id, t) =>
        val hits = ev.map { case (eid, e) =>
          (eid, r6(t.zip(e).map { case (a, b) => a * b }.sum / (nrm(t) * nrm(e))))
        }.filter(_._2 >= tau)
        val h = got(id)
        assert(h.getLong(2) == hits.length.toLong, s"n_over for $id tau=$tau")
        if (hits.nonEmpty) {
          assert(h.getLong(0) == hits.map(_._1).min, s"witness for $id")
          assert(h.getDouble(1) == hits.map(_._2).max, s"max_sim for $id")
        }
      }
    }
  }

  test("minhash buffer round-trips through serialization") {
    val agg = graft.functions.MinHashAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 8)
    val b1 = agg.createAggregationBuffer()
    assert(agg.serialize(b1).length == 64)
    assert(agg.deserialize(agg.serialize(b1)).toSeq == b1.toSeq)
    // merge is element-wise min
    val a = Array(5L, 1L, 9L, 0L, 7L, 3L, 2L, 8L)
    val b = Array(4L, 2L, 9L, 1L, 6L, 3L, 1L, 9L)
    val m = agg.merge(a.clone(), b)
    assert(m.toSeq == Seq(4L, 1L, 9L, 0L, 6L, 3L, 1L, 8L))
  }
}
