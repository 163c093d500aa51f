package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.pipeline.EditJoin

/** The PassJoin pigeonhole blocking is LOSSLESS: the blocked join's
  * pair set must equal the brute-force quadratic reference on every
  * corpus — including ones built by planting exactly-d edits (the
  * boundary the segment/window arithmetic must not clip). */
object EditJoinProperties extends Properties("editDistancePairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxDiscardRatio(10)

  private def spark = SparkTestSession.spark

  /** Classic DP Levenshtein (unit costs) — the semantic reference. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val prefixLen = 20
  private val alphabet = "abc" // small alphabet → natural near-pairs

  private def genString(n: Int): Gen[String] =
    Gen.listOfN(n, Gen.oneOf(alphabet.toSeq)).map(_.mkString)

  /** Apply exactly k random edits (sub/ins/del) to s, then re-clip to
    * the fixed key length so indel effects cross segment boundaries. */
  private def mutate(s: String, k: Int): Gen[String] = {
    def step(cur: String): Gen[String] = for {
      op <- Gen.chooseNum(0, 2)
      pos <- Gen.chooseNum(0, math.max(0, cur.length - 1))
      ch <- Gen.oneOf(alphabet.toSeq)
    } yield op match {
      case 0 => cur.updated(math.min(pos, cur.length - 1), ch)
      case 1 => cur.substring(0, pos) + ch + cur.substring(pos)
      case _ if cur.length > 1 => cur.substring(0, pos) + cur.substring(pos + 1)
      case _ => cur
    }
    (1 to k).foldLeft(Gen.const(s))((g, _) => g.flatMap(step))
      .flatMap { m =>
        if (m.length >= prefixLen) Gen.const(m.take(prefixLen))
        else genString(prefixLen - m.length).map(m + _)
      }
  }

  private val genCorpus: Gen[List[String]] = for {
    nBase <- Gen.chooseNum(3, 10)
    bases <- Gen.listOfN(nBase, genString(prefixLen))
    maxD <- Gen.const(3)
    mutants <- Gen.sequence[List[String], String](
      bases.flatMap(b => (0 to maxD).map(k => mutate(b, k))))
  } yield bases ++ mutants

  private def blocked(texts: List[String], d: Int): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    EditJoin.editDistancePairs(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), d, prefixLen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def brute(texts: List[String], d: Int): Set[(Long, Long, Long)] =
    (for {
      i <- texts.indices; j <- texts.indices if i < j
      if texts(i).length >= prefixLen && texts(j).length >= prefixLen
      dist = lev(texts(i).take(prefixLen), texts(j).take(prefixLen))
      if dist <= d
    } yield (i.toLong, j.toLong, dist.toLong)).toSet

  property("blocked == brute force at d=3 on planted-edit corpora") =
    forAll(genCorpus) { texts => blocked(texts, 3) == brute(texts, 3) }

  property("blocked == brute force at d=1 (tight window)") =
    forAll(genCorpus) { texts => blocked(texts, 1) == brute(texts, 1) }

  property("d=0 degenerates to exact prefix dedup") =
    forAll(genCorpus) { texts => blocked(texts, 0) == brute(texts, 0) }
}
