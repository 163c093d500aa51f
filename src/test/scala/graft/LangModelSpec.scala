package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextStats

/** Independent driver-side recompute of the interpolated bigram LM
  * (q164): hand-built counts, java.lang.Math.log (the same libm entry
  * Spark's Log expression calls), the same integer-nanolog
  * quantization, Spark-round (BigDecimal HALF_UP) at the end, and
  * Spark-percentile interpolation — on a corpus small enough to audit
  * by eye but adversarial enough to exercise every branch (repeated
  * bigrams in one doc, a single-token doc, a doc sharing no bigram
  * with any other, multiple sources). */
class LangModelSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private val docs: Seq[(Long, String, String)] = Seq(
    (0L, "a b a b c", "web"),
    (1L, "a b c", "web"),
    (2L, "z", "web"), // single token: unigram term only
    (3L, "c a a a", "book"),
    (4L, "q r q r q", "book"))

  private def sparkRound(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark `percentile(x, 0.5)`: sort, pos = 0.5·(n−1), linear
    * interpolation between the neighbors. */
  private def p50(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val pos = 0.5 * (s.size - 1)
    val lo = pos.toInt
    if (lo == s.size - 1) s(lo)
    else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
  }

  test("q164 matches a driver-side reference recompute") {
    val lambda = 0.875
    val toks = docs.map { case (id, t, src) =>
      (id, src, t.split(" ").filter(_.nonEmpty).toSeq) }
    val cu = toks.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.map(_._3.size.toLong).sum
    val bigrams = toks.flatMap { case (_, _, tk) => tk.zip(tk.drop(1)) }
    val cb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cctx = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def nano(p: Double): Long =
      BigDecimal(Math.log(p) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val perDoc = toks.map { case (id, src, tk) =>
      val first = nano(cu(tk.head).toDouble / n.toDouble)
      val rest = tk.zip(tk.drop(1)).map { bg =>
        nano(lambda * (cb(bg).toDouble / cctx(bg._1).toDouble)
          + (1.0 - lambda) * (cu(bg._2).toDouble / n.toDouble))
      }.sum
      (id, src, tk.size.toLong, first + rest)
    }
    val expect = perDoc.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (src, ds) =>
        (src, ds.size.toLong,
          sparkRound(ds.map(_._4).sum.toDouble / ds.map(_._3).sum.toDouble / 1e9, 6),
          sparkRound(p50(ds.map(d => d._4.toDouble / d._3.toDouble / 1e9)), 6))
    }
    val s = spark
    import s.implicits._
    val got = TextStats.bigramLmScores(
      docs.toDF("doc_id", "text", "source"), lambda)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expect)
  }

  test("q178 cross-corpus scoring matches a driver-side reference — " +
    "OOV words, unseen contexts, unseen bigrams, single-token docs") {
    val lambda = 0.875
    // model: small vocab {a b c}; target plants every smoothing branch
    val model: Seq[(Long, String, String)] = Seq(
      (0L, "a b a b c", "web"),
      (2L, "a b c c", "web"))
    val target: Seq[(Long, String, String)] = Seq(
      (1L, "a b c", "web"),     // fully in-vocab, all bigrams seen
      (3L, "a c b", "web"),     // seen context, UNSEEN bigrams (a c, c b)
      (5L, "x y z", "book"),    // fully OOV: unseen contexts AND words
      (7L, "z", "book"),        // single OOV token: smoothed w0 only
      (9L, "c a b", "book"))    // 'c' context seen, (c,a) unseen
    val mToks = model.map(_._2.split(" ").filter(_.nonEmpty).toSeq)
    val cu = mToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = mToks.map(_.size.toLong).sum
    val v = cu.size.toLong
    val mBigrams = mToks.flatMap(tk => tk.zip(tk.drop(1)))
    val cb = mBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cctx = mBigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def nano(p: Double): Long =
      BigDecimal(Math.log(p) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def pu(w: String): Double =
      (cu.getOrElse(w, 0L).toDouble + 1.0) / (n.toDouble + v.toDouble + 1.0)
    val perDoc = target.map { case (id, t, src) =>
      val tk = t.split(" ").filter(_.nonEmpty).toSeq
      val first = nano(pu(tk.head))
      val rest = tk.zip(tk.drop(1)).map { bg =>
        val ml = if (cctx.contains(bg._1))
          cb.getOrElse(bg, 0L).toDouble / cctx(bg._1).toDouble else 0.0
        nano(lambda * ml + (1.0 - lambda) * pu(bg._2))
      }.sum
      val nOov = tk.count(w => !cu.contains(w)).toLong
      (id, src, tk.size.toLong, nOov, first + rest)
    }
    val expect = perDoc.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (src, ds) =>
        (src, ds.size.toLong,
          sparkRound(ds.map(_._5).sum.toDouble / ds.map(_._3).sum.toDouble / 1e9, 6),
          sparkRound(p50(ds.map(d => d._5.toDouble / d._3.toDouble / 1e9)), 6),
          sparkRound(ds.map(_._4).sum.toDouble / ds.map(_._3).sum.toDouble, 6))
    }
    val s = spark
    import s.implicits._
    val got = TextStats.bigramLmCrossScores(
      model.toDF("doc_id", "text", "source"),
      target.toDF("doc_id", "text", "source"), lambda)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got == expect)
    // the OOV branch really fired: book is fully out-of-vocab
    assert(got.find(_._1 == "book").exists(_._5 > 0.0))
  }

  test("interpolation guard rejects degenerate lambda") {
    val s = spark
    import s.implicits._
    val df = docs.toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] {
      TextStats.bigramLmScores(df, 0.0)
    }
    intercept[IllegalArgumentException] {
      TextStats.bigramLmScores(df, 1.0)
    }
  }
}
