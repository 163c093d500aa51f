package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingPipeline

/** Property suite for streaming gap sessionization: on arbitrary
  * micro-precise event sets, fed through the real streaming operator
  * under ARBITRARY chunk boundaries (the replay harness sizes its feed
  * chunks from the corpus, so boundary-independence is load-bearing),
  * Append output must equal a driver-side brute-force reference.
  * The feed is ts-ordered — the replay contract — but where the
  * micro-batch cuts fall is adversarial here. */
object SessionizeProperties extends Properties("sessionize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private def spark = SparkTestSession.spark

  private val Epoch = 1700000000000L

  private def mkTs(minute: Long, micro: Long): Timestamp = {
    val t = new Timestamp(Epoch + minute * 60000L)
    t.setNanos((micro * 1000L).toInt)
    t
  }

  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** (user, minute, microOfSecond, value), plus gap and chunk cut points. */
  private val genCase: Gen[(List[(Long, Long, Long, Double)], Int, List[Int])] =
    for {
      n <- Gen.chooseNum(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(0L, 3L)
        minute <- Gen.chooseNum(0L, 60L)
        micro <- Gen.chooseNum(0L, 999999L)
        v <- Gen.chooseNum(-5, 5)
      } yield (u, minute, micro, v.toDouble))
      gap <- Gen.chooseNum(1, 4)
      cuts <- Gen.listOf(Gen.chooseNum(0, n))
    } yield (evs, gap, cuts)

  /** Brute-force reference: per user, sort by micros, split where the
    * gap is exceeded, fold bounds/count/sum. */
  private def reference(rows: Seq[(Long, Timestamp, Double)], gapMin: Int)
      : Set[(Long, Long, Long, Long, Double)] = {
    val gapUs = gapMin.toLong * 60000000L
    rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map(e => (micros(e._2), e._3)).sortBy(_._1)
      val sessions = sorted.foldLeft(List.empty[(Long, Long, Long, Double)]) {
        case ((s, e, n, tot) :: t, (us, v)) if us <= e + gapUs =>
          (s, math.max(e, us), n + 1, tot + v) :: t
        case (acc, (us, v)) => (us, us, 1L, v) :: acc
      }.reverse
      sessions.map { case (s, e, n, tot) =>
        (u, s, e, n, math.rint(tot * 1e6) / 1e6)
      }
    }.toSet
  }

  property("append output == brute force under arbitrary feed chunking") =
    forAll(genCase) { case (evs, gapMin, cuts) =>
      val sess = spark
      import sess.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = sess.sqlContext

      val rows = evs.map { case (u, minute, micro, v) =>
        (u, mkTs(minute, micro), v)
      }.sortBy(r => micros(r._2))
      val maxT = rows.map(r => r._2.getTime).max

      val stream = MemoryStream[(Long, Timestamp, Double)]
      val out = StreamingPipeline.sessionize(
        stream.toDF().toDF("user_id", "ts", "value"), gapMin)
      val qname = "prop_sess_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_prop_sess")
      val query = out.writeStream.format("memory").queryName(qname)
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt.toString)
        .start()
      val got =
        try {
          // adversarial chunking: cut the ts-ordered feed at the random
          // boundaries (dedup + sort makes them usable indices)
          val bounds = (cuts.map(_ min rows.length).toSet + rows.length)
            .toList.sorted.filter(_ > 0)
          var prev = 0
          bounds.foreach { b =>
            if (b > prev) {
              stream.addData(rows.slice(prev, b))
              query.processAllAvailable()
              prev = b
            }
          }
          val day = 86400000L
          stream.addData((-1L, new Timestamp(maxT + day), 0.0))
          query.processAllAvailable()
          stream.addData((-1L, new Timestamp(maxT + 2 * day), 0.0))
          query.processAllAvailable()
          sess.table(qname)
            .where($"user_id" =!= -1L)
            .collect().map { r =>
              (r.getLong(0), micros(r.getTimestamp(1)),
                micros(r.getTimestamp(2)), r.getLong(3),
                math.rint(r.getDouble(4) * 1e6) / 1e6)
            }.toSet
        } finally {
          query.stop()
          sess.catalog.dropTempView(qname)
        }
      val want = reference(rows, gapMin)
      if (got != want) {
        println(s"MISMATCH gap=$gapMin cuts=$cuts\n got=$got\nwant=$want")
      }
      got == want
    }
}
