package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.AsOfJoin

/** Property suite for the as-of join: on arbitrary (key, time) sets
  * the window implementation must agree with an independent driver-
  * side brute-force reference — latest-prior inclusive match, inner
  * drop, per-key isolation, and the tolerance bound. Right sides are
  * pre-deduped to one row per (key, time), the operator's documented
  * precondition. */
object AsOfJoinProperties extends Properties("asof") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private def spark = SparkTestSession.spark

  private def ts(m: Long): Timestamp = new Timestamp(1700000000000L + m * 60000L)

  private val genRows: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      nl <- Gen.chooseNum(1, 15)
      nr <- Gen.chooseNum(1, 15)
      l <- Gen.listOfN(nl, for {
        k <- Gen.chooseNum(0L, 3L); t <- Gen.chooseNum(0L, 50L)
      } yield (k, t, 0L))
      r <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(0L, 3L); t <- Gen.chooseNum(0L, 50L)
      } yield (k, t, 0L))
    } yield (
      l.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) },
      // pre-dedup: one right row per (key, time)
      r.groupBy(x => (x._1, x._2)).values.map(_.head).toList
        .zipWithIndex.map { case ((k, t, _), i) => (k, t, 1000L + i) })

  /** Brute force: for each left row the right row with the max
    * rt ≤ lt (and lt − rt ≤ tol when bounded) sharing the key. */
  private def reference(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)],
                        tolMinutes: Option[Long]): Set[(Long, Long)] =
    l.flatMap { case (k, lt, lid) =>
      r.filter { case (rk, rt, _) =>
        rk == k && rt <= lt && tolMinutes.forall(tol => lt - rt <= tol)
      }.sortBy(_._2).lastOption.map { case (_, _, rid) => (lid, rid) }
    }.toSet

  private def run(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)],
                  tolMinutes: Option[Long]): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    val left = l.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "lt", "lid")
    val right = r.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "rt", "rid")
    val joined = tolMinutes match {
      case None => AsOfJoin.asofJoin(left, right, "k", "lt", "rt")
      case Some(tol) =>
        AsOfJoin.asofJoinTolerance(left, right, "k", "lt", "rt", tol * 60L)
    }
    joined.select("lid", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
  }

  property("asofJoin == brute-force latest-prior reference") =
    forAll(genRows) { case (l, r) =>
      run(l, r, None) == reference(l, r, None)
    }

  property("asofJoinTolerance == brute-force bounded reference") =
    forAll(genRows, Gen.chooseNum(0L, 20L)) { case ((l, r), tol) =>
      run(l, r, Some(tol)) == reference(l, r, Some(tol))
    }
}
