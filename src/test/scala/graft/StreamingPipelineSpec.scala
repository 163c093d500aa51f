package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingPipeline

/** Data-plane streaming: windowed event aggregation finalizes windows
  * as the watermark passes, and hash-dedup drops within-horizon copies
  * while keeping state bounded. */
class StreamingPipelineSpec extends AnyFunSuite {
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed agg: watermark closes old windows; late-but-in-budget rows count") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String, Double)]
    val out = StreamingPipeline.eventsWindowedAgg(
        stream.toDF().toDF("ts", "event_type", "value"),
        window = "1 hour", lateness = "10 minutes")
    val query = out.writeStream.format("memory").queryName("s_agg")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sagg").toString)
      .start()
    try {
      stream.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 10:50:00"), "view", 5.0))
      query.processAllAvailable()
      // within-budget late arrival for the 10:00 window
      stream.addData((ts("2024-01-01 10:59:00"), "click", 4.0))
      query.processAllAvailable()
      // watermark jumps past 11:00 → the 10:00 window finalizes
      stream.addData((ts("2024-01-01 12:30:00"), "view", 9.0))
      query.processAllAvailable()

      val rows = spark.table("s_agg")
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq == Seq(
        (ts("2024-01-01 10:00:00"), "click", 3L, 7.0),
        (ts("2024-01-01 10:00:00"), "view", 1L, 5.0)))
    } finally query.stop()
  }

  test("streaming hash-dedup keeps the first copy within the watermark horizon") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingPipeline.dedupStream(
      stream.toDF().toDF("ts", "doc_id", "text"), lateness = "10 minutes")
    val query = out.writeStream.format("memory").queryName("s_dedup")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sdedup").toString)
      .start()
    try {
      stream.addData(
        (ts("2024-01-01 10:00:00"), 1L, "same text"),
        (ts("2024-01-01 10:01:00"), 2L, "same text"),
        (ts("2024-01-01 10:02:00"), 3L, "other text"))
      query.processAllAvailable()
      val kept = spark.table("s_dedup").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 3L)) // duplicate doc 2 dropped
    } finally query.stop()
  }
}
