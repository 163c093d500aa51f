package graft

import org.apache.spark.sql.SparkSession

/** Characterize the per-micro-batch FIXED cost of the file-stream
  * replay gates (r16 VERDICT task 6): wall time of one representative
  * gate dataflow — q127's many-wave FileStreamSource sessionization —
  * as a function of requested wave count, same corpus, same session.
  * The replay gates' cost is dominated by per-wave overhead (state
  * store open/commit, file-source listing, micro-batch planning), not
  * data volume; this prints the measured curve (waves × wall, with
  * repetitions) so that claim is a number, not prose. The intercept
  * at waves→1 is the dataflow's own cost; the slope is the per-wave
  * fixed overhead that q127/q137/q147 pay by design.
  *
  * The first streaming query a session runs pays JVM/codegen/state-
  * store warm-up that has nothing to do with wave count (r17's curve
  * recorded a 12.6 s cold first sample vs 5.4 s warm at waves=2, and
  * with only 2 reps that one outlier dominated the point). So: one
  * UNTIMED warm-up run before any measured point, and 3 reps by
  * default (r17 VERDICT task 6).
  * Usage: tools/run.sh graft.StreamCostTool <sfDir> [reps] [waveList]
  */
object StreamCostTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val waves =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(2, 4, 8, 16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.sources.Corpus.table(spark, sfDir, "events")
    // pid-suffixed dirs under graft-fixtures ride SparkEntry's
    // shutdown-hook cleanup (touching fixturePid registers it)
    val pid = SparkEntry.fixturePid
    // warm-up: run the smallest point once, untimed and discarded —
    // absorbs the session's one-time streaming costs so every
    // measured sample sits on the same warm floor
    graft.streaming.StreamingPipeline
      .sessionizeFileStreamWaves(events, 30,
        s"${SparkEntry.fixtureRoot}/streamcost_warm_p$pid",
        nWaves = waves.min)
      .write.format("noop").mode("overwrite").save()
    val pts = waves.map { nw =>
      val runs = (1 to reps).map { i =>
        val dir =
          s"${SparkEntry.fixtureRoot}/streamcost_${nw}_${i}_p$pid"
        val t0 = System.nanoTime()
        graft.streaming.StreamingPipeline
          .sessionizeFileStreamWaves(events, 30, dir, nWaves = nw)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      s"""{"waves":$nw,"runs":[${runs.map(r => f"$r%.2f").mkString(",")}]}"""
    }
    println(s"""{"metric":"stream_wave_cost","sf":"$sfDir","gap_minutes":30,"reps":$reps,"warmup_discarded":1,"points":[${pts.mkString(",")}]}""")
    spark.stop()
  }
}
