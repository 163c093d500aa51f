package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Property suite for the bucket-decomposed interval join: on arbitrary
  * point/anchor sets — including adversarial timestamps planted exactly
  * ON window ends and bucket boundaries — the bucketed equi-join must
  * equal the brute-force cross-join-and-filter reference. This is the
  * scale claim's correctness half: the decomposition may only change
  * the PLAN (no cartesian), never the answer. */
object IntervalJoinProperties extends Properties("intervalJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private def spark = SparkTestSession.spark

  private val HalfWidth = 600L // us, so buckets are 1200 us wide

  /** Timestamps cluster near bucket multiples and exact window edges:
    * anchor±HalfWidth and k·2·HalfWidth are the off-by-one surfaces. */
  private val genUs: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(0L, 12000L),
    Gen.chooseNum(0L, 10L).map(_ * 2 * HalfWidth), // bucket boundaries
    Gen.chooseNum(0L, 10L).map(_ * 2 * HalfWidth + HalfWidth),
    Gen.chooseNum(0L, 12000L).map(u => u - u % HalfWidth))

  private val genCase: Gen[(List[(Long, Long, Long)], List[(Long, Long)])] =
    for {
      np <- Gen.chooseNum(1, 60)
      pts <- Gen.listOfN(np, for {
        us <- genUs; uid <- Gen.chooseNum(0L, 5L)
      } yield (us, uid))
      na <- Gen.chooseNum(1, 10)
      as <- Gen.listOfN(na, genUs)
    } yield (
      pts.zipWithIndex.map { case ((us, uid), i) => (i.toLong, uid, us) },
      as.zipWithIndex.map { case (us, i) => (i.toLong, us) })

  property("bucketed == brute force, edges inclusive") =
    forAll(genCase) { case (pts, as) =>
      val s = spark
      import s.implicits._
      val points = pts.toDF("event_id", "user_id", "us")
      val anchors = as.toDF("anchor_id", "us")
      val got = IntervalJoin.pointsInWindows(points, anchors, HalfWidth)
        .orderBy("anchor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toList
      // brute force in driver code — an independent spelling
      val ref = as.flatMap { case (aid, aus) =>
        val in = pts.filter { case (_, _, us) =>
          us >= aus - HalfWidth && us <= aus + HalfWidth }
        if (in.isEmpty) Nil
        else List((aid, in.size.toLong, in.map(_._2).distinct.size.toLong))
      }.sortBy(_._1)
      got == ref
    }
}
