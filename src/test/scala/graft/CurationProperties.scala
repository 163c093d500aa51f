package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.pipeline.Curation

/** Property suite for weighted sampling without replacement (E-S
  * A-Res): the selection is a pure function of (doc_id, source,
  * n_chars) — stable across runs — and invariant to scaling every
  * weight by a power of two (u^(1/w) ordering depends only on weight
  * RATIOS; dyadic scaling divides the ranking key exactly, so even the
  * rounded-key rank is preserved bar a 1e-9 tie, which the doc_id
  * tie-break resolves identically on both orderings). */
object CurationProperties extends Properties("weightedSample") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10)

  private def spark = SparkTestSession.spark

  private val genDocs: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.chooseNum(1, 50)
    rows <- Gen.listOfN(n, for {
      src <- Gen.oneOf("web", "book", "code")
      w <- Gen.chooseNum(1L, 4000L)
    } yield (src, w))
  } yield rows.zipWithIndex.map { case ((s, w), i) => (i.toLong, s, w) }

  private def sample(rows: List[(Long, String, Long)], k: Int) = {
    val s = spark
    import s.implicits._
    Curation.weightedSample(
      rows.toDF("doc_id", "source", "n_chars"), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toList
  }

  property("deterministic across invocations") = forAll(genDocs) { rows =>
    sample(rows, 5) == sample(rows, 5)
  }

  property("k >= group size returns every doc once") =
    forAll(genDocs) { rows =>
      val got = sample(rows, rows.size + 1)
      got.map(t => (t._1, t._3)).toSet ==
        rows.map(t => (t._2, t._1)).toSet && got.size == rows.size
    }

  property("weight scaling by 2 preserves the selection and order") =
    forAll(genDocs) { rows =>
      val scaled = rows.map { case (id, s, w) => (id, s, w * 2) }
      sample(rows, 7).map(t => (t._1, t._2, t._3)) ==
        sample(scaled, 7).map(t => (t._1, t._2, t._3))
    }
}
