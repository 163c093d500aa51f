package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Retrieval

/** BM25 retrieval: exact reference recompute (same formula, driver
  * side), ranking semantics, and the scale-shape pins the scaladoc
  * claims. */
class RetrievalSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  /** Driver-side reference BM25 with the operator's exact quantization
    * (idf → nano, per-term contribution → micro, integer doc sums). */
  private def refBm25(docs: Seq[(Long, String, String)], query: String,
                      k: Int, k1: Double = 1.2, b: Double = 0.75)
      : Seq[(Long, Long, Double)] = {
    val terms = query.split(" ").filter(_.nonEmpty).distinct
    val toks = docs.map { case (id, src, text) =>
      (id, src, text.split(" ").filter(_.nonEmpty).toSeq)
    }.filter(_._3.nonEmpty)
    val n = toks.size.toLong
    val sumDl = toks.map(_._3.size.toLong).sum
    val tf = for {
      (id, _, tk) <- toks
      w <- terms
      c = tk.count(_ == w) if c > 0
    } yield (id, tk.size.toLong, w, c.toLong)
    val df = tf.groupBy(_._3).map { case (w, rs) => (w, rs.size.toLong) }
    val idfNano = df.map { case (w, d) =>
      (w, math.round(math.log(
        (n.toDouble - d.toDouble + 0.5) / (d.toDouble + 0.5) + 1.0) * 1e9))
    }
    val perDoc = tf.groupBy(_._1).map { case (id, rs) =>
      val s = rs.map { case (_, dl, w, c) =>
        val tfq = (c.toDouble * (k1 + 1.0)) /
          (c.toDouble + k1 * ((1.0 - b) +
            b * ((dl.toDouble * n.toDouble) / sumDl.toDouble)))
        math.round(idfNano(w).toDouble * tfq / 1000.0)
      }.sum
      (id, s)
    }.toSeq
    perDoc.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex
      .map { case ((id, s), i) => (i + 1L, id, math.rint(s / 1e6 * 1e6) / 1e6) }
  }

  private val corpus: Seq[(Long, String, String)] = Seq(
    (0L, "a", "dup merge window merge merge"),      // rare term + repeats
    (1L, "a", "merge window scan batch scan scan"), // common terms only
    (2L, "b", "dup dup dup dup dup dup dup dup"),   // tf saturation
    (3L, "b", "scan batch table row"),              // no query term
    (4L, "a", "window"),                            // shortest doc
    (5L, "b", "merge " + Seq.fill(60)("filler").mkString(" ")), // long doc
    (6L, "a", "dup merge window"))                  // all three terms

  private def run(k: Int): Seq[(Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    Retrieval.bm25TopK(
      corpus.toDF("doc_id", "source", "text"), "dup merge window", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
  }

  test("matches the driver-side reference recompute exactly") {
    assert(run(7) == refBm25(corpus, "dup merge window", 7))
  }

  test("docs without any query term never appear; rare term dominates") {
    val got = run(10)
    assert(!got.exists(_._2 == 3L))          // doc 3 has no query term
    assert(got.size == 6)                    // 6 matching docs
    // the rare-term docs (idf(dup) >> idf(merge/window)) outrank the
    // common-only docs
    val rankOf = got.map(t => t._2 -> t._1).toMap
    assert(rankOf(1L) > rankOf(0L) && rankOf(1L) > rankOf(2L)
      && rankOf(1L) > rankOf(6L))
    // length normalization: the 61-token doc 5's single 'merge' scores
    // below doc 4's single 'window' (equal tf, equal idf class — but
    // check with actual idfs: merge df=4, window df=3, so window also
    // has the higher idf; both effects point the same way)
    assert(rankOf(5L) > rankOf(4L))
  }

  test("k truncates; ranks are 1..k; determinism across invocations") {
    val got = run(3)
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(run(3) == run(3))
  }

  test("empty query rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus.toDF("doc_id", "source", "text"), "  ")
    }
  }

  test("batch BM25 == the single-query operator run per query") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "source", "text")
    val qs = Seq((0L, "dup merge window"), (1L, "scan batch"), (2L, "window"))
    val batch = Retrieval.bm25BatchTopK(df, qs, 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
      .toSeq
    val singles = qs.flatMap { case (qid, q) =>
      Retrieval.bm25TopK(df, q, 4).collect()
        .map(r => (qid, r.getLong(0), r.getLong(1), r.getDouble(4)))
    }
    assert(batch == singles)
  }

  test("store probe == scan path (shared scoring tail), and the store " +
    "builds once per (process, signature)") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_store_spec").toString
    try {
      def viaStore() = Retrieval.bm25TopKViaStore(
        df, "bm25_spec_tbl", dir, "dup merge window", 7)
        .collect().map(_.toString).toSeq
      val direct = Retrieval.bm25TopK(df, "dup merge window", 7)
        .collect().map(_.toString).toSeq
      assert(viaStore() == direct)
      // second probe reuses the store (memo holds: same signature)
      val t0 = s.table("bm25_spec_tbl").inputFiles.toSeq
      assert(viaStore() == direct)
      assert(s.table("bm25_spec_tbl").inputFiles.toSeq == t0,
        "store files changed — the memo rebuilt on an unchanged base")
    } finally s.sql("DROP TABLE IF EXISTS bm25_spec_tbl")
  }

  test("batch store probe == batch scan path (shared batch scoring tail)") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "source", "text")
    val qs = Seq((0L, "dup merge window"), (1L, "scan batch"), (2L, "window"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_batch_store_spec").toString
    try {
      Retrieval.buildBm25Store(df, "bm25_bspec_tbl", dir)
      val viaStore = Retrieval
        .bm25BatchProbeStore(s, "bm25_bspec_tbl", dir, qs, 4)
        .collect().map(_.toString).toSeq
      val direct = Retrieval.bm25BatchTopK(df, qs, 4)
        .collect().map(_.toString).toSeq
      assert(viaStore == direct)
    } finally s.sql("DROP TABLE IF EXISTS bm25_bspec_tbl")
  }

  test("store lifecycle: append folds a batch (probe == rebuilt-on-" +
    "union), ingest REPLAY is a no-op (postings, stats, manifest), " +
    "and compaction preserves probe + bucket spec") {
    val s = spark
    import s.implicits._
    val a = corpus.filter(_._1 <= 3L).toDF("doc_id", "source", "text")
    val batch = corpus.filter(_._1 > 3L).toDF("doc_id", "source", "text")
    val union = corpus.toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_lifecycle").toString
    try {
      Retrieval.buildBm25Store(a, "bm25_lc_tbl", dir)
      Retrieval.appendBm25Store(batch, "bm25_lc_tbl", dir)
      def probe() = Retrieval.bm25ProbeStore(s, "bm25_lc_tbl", dir,
        "dup merge window", 7).collect().map(_.toString).toSeq
      val direct = Retrieval.bm25TopK(union, "dup merge window", 7)
        .collect().map(_.toString).toSeq
      assert(probe() == direct, "probe-after-append != rebuilt semantics")
      // replay: the manifest anti-join must make this a no-op
      val statsBefore = s.read.parquet(dir + "_stats").head().toString
      val nPostings = s.table("bm25_lc_tbl").count()
      Retrieval.appendBm25Store(batch, "bm25_lc_tbl", dir)
      assert(probe() == direct, "replayed append changed the probe")
      assert(s.read.parquet(dir + "_stats").head().toString == statsBefore)
      assert(s.table("bm25_lc_tbl").count() == nPostings)
      // compaction: probe-before == probe-after, bucket spec survives
      Retrieval.compactBm25Store(s, "bm25_lc_tbl", dir)
      assert(probe() == direct, "compaction changed the probe")
      val pp = Retrieval.bm25ProbeStore(s, "bm25_lc_tbl", dir)
      pp.collect()
      assert(pp.queryExecution.executedPlan.toString.contains("Bucketed: true"))
    } finally s.sql("DROP TABLE IF EXISTS bm25_lc_tbl")
  }

  test("store stale-guard: a CHANGED base at the same table+path " +
    "rebuilds — the probe answers for the NEW corpus") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_guard").toString
    val a = corpus.toDF("doc_id", "source", "text")
    // different id set (and different texts): doc 2's dup-flood gone
    val b = corpus.filterNot(_._1 == 2L)
      .map { case (id, src, t) => (id + 100L, src, t) }
      .toDF("doc_id", "source", "text")
    try {
      def viaStore(c: org.apache.spark.sql.DataFrame) =
        Retrieval.bm25TopKViaStore(c, "bm25_guard_tbl", dir,
          "dup merge window", 7).collect().map(_.toString).toSeq
      viaStore(a) // builds for A
      val directB = Retrieval.bm25TopK(b, "dup merge window", 7)
        .collect().map(_.toString).toSeq
      assert(viaStore(b) == directB)
    } finally s.sql("DROP TABLE IF EXISTS bm25_guard_tbl")
  }

  test("scale shape: TakeOrderedAndProject, no cartesian, BNLJ only as " +
    "the 1-row stats attach, and AQE reuses the tf exchange (the dual-" +
    "consumed postings subtree scans the corpus ONCE at runtime)") {
    val df = SparkEntry.queries("q174_bm25_topk")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    // AdaptiveSparkPlan.toString prints Final Plan then Initial Plan —
    // count nodes in the FINAL (post-AQE) section only
    val full = df.queryExecution.executedPlan.toString
    val p = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1)
    assert(p.contains("ReusedExchange"),
      "expected AQE to collapse the duplicated tf subtree")
  }
}
