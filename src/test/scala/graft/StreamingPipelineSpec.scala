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

  test("sessionization: gap closes sessions via event-time timeout and in-batch splits") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingPipeline.sessionize(
      stream.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30)
    val query = out.writeStream.format("memory").queryName("s_sess")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sess").toString)
      .start()
    try {
      // user 7: two events 10 min apart (one session), then an in-batch
      // gap of 2 h — the first session closes inside the batch
      stream.addData(
        (7L, ts("2024-01-01 10:00:00"), 1.0),
        (7L, ts("2024-01-01 10:10:00"), 2.0),
        (7L, ts("2024-01-01 12:10:00"), 5.0))
      query.processAllAvailable()
      // user 9 far in the future pushes the watermark past 12:40 so
      // user 7's open session times out and closes
      stream.addData((9L, ts("2024-01-02 00:00:00"), 9.0))
      query.processAllAvailable()
      stream.addData((9L, ts("2024-01-03 00:00:00"), 1.0))
      query.processAllAvailable()

      val rows = spark.table("s_sess")
        .orderBy("user_id", "session_start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
      assert(rows.toSeq == Seq(
        (7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 3.0),
        (7L, ts("2024-01-01 12:10:00"), ts("2024-01-01 12:10:00"), 1L, 5.0),
        (9L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:00"), 1L, 9.0)))
    } finally query.stop()
  }

  test("sessionization holds sessions until the watermark: a late event merges instead of overlapping") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingPipeline.sessionize(
      stream.toDF().toDF("user_id", "ts", "value"),
      gapMinutes = 30, lateness = "3 hours")
    val query = out.writeStream.format("memory").queryName("s_sess_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sess_late").toString)
      .start()
    try {
      // batch 1: user 7's first session gap-closes INSIDE the batch
      // ([10:00,10:10], then 13:00) — but must NOT be emitted yet: its
      // end+gap (10:40) is still ahead of the watermark (10:00)
      stream.addData(
        (7L, ts("2024-01-01 10:00:00"), 1.0),
        (7L, ts("2024-01-01 10:10:00"), 2.0),
        (7L, ts("2024-01-01 13:00:00"), 4.0))
      query.processAllAvailable()
      assert(spark.table("s_sess_late").count() == 0)
      // batch 2: a late-but-in-budget event (10:35 ≥ watermark 10:00)
      // lands within the gap of the held session → MERGES into it (the
      // early-emission design emitted [10:00,10:10] already and then
      // produced an overlapping second session here)
      stream.addData((7L, ts("2024-01-01 10:35:00"), 8.0))
      query.processAllAvailable()
      // batches 3+4: user 9 advances the watermark so user 7 finalizes
      stream.addData((9L, ts("2024-01-02 00:00:00"), 9.0))
      query.processAllAvailable()
      stream.addData((9L, ts("2024-01-03 00:00:00"), 1.0))
      query.processAllAvailable()

      val streamed = spark.table("s_sess_late")
        .orderBy("user_id", "session_start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSeq
      assert(streamed == Seq(
        (7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:35:00"), 3L, 11.0),
        (7L, ts("2024-01-01 13:00:00"), ts("2024-01-01 13:00:00"), 1L, 4.0),
        (9L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:00"), 1L, 9.0)))

      // Append output == batch sessionization of the same data for every
      // finalized session (the still-open 01-03 session is the only one
      // the stream hasn't emitted)
      val static = Seq(
        (7L, ts("2024-01-01 10:00:00"), 1.0),
        (7L, ts("2024-01-01 10:10:00"), 2.0),
        (7L, ts("2024-01-01 13:00:00"), 4.0),
        (7L, ts("2024-01-01 10:35:00"), 8.0),
        (9L, ts("2024-01-02 00:00:00"), 9.0),
        (9L, ts("2024-01-03 00:00:00"), 1.0)).toDF("user_id", "ts", "value")
      val batch = graft.operators.RelationalOps.sessionizeBatch(static, 30)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSeq
      assert(batch.filterNot(_._2 == ts("2024-01-03 00:00:00")) == streamed)
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

  test("ingest admission: base dups rejected, in-stream dups rejected, new docs admitted") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Seq((100L, "already ingested"), (101L, "base only"))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingPipeline.admitStream(
      stream.toDF().toDF("ts", "doc_id", "text"), base,
      lateness = "10 minutes")
    val query = out.writeStream.format("memory").queryName("s_admit")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sadmit").toString)
      .start()
    try {
      stream.addData(
        (ts("2024-01-01 10:00:00"), 1L, "already ingested"), // base dup
        (ts("2024-01-01 10:01:00"), 2L, "fresh document"),   // admitted
        (ts("2024-01-01 10:02:00"), 3L, "fresh document"),   // stream dup
        (ts("2024-01-01 10:03:00"), 4L, "another new one"))  // admitted
      query.processAllAvailable()
      val admitted = spark.table("s_admit").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(admitted == Seq(2L, 4L))
    } finally query.stop()
  }

  test("q147 quarantine stream: contaminated docs flagged on arrival; a LATE contaminated arrival is still rejected") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 16-token eval doc: guarantees pure-eval 13-grams; a doc sharing
    // any 13-token run with it is contaminated
    val evalText = (1 to 16).map(i => s"ev$i").mkString(" ")
    val evalHashes = Seq(Tuple1(evalText)).toDF("text")
      .select(org.apache.spark.sql.functions.explode(
        graft.pipeline.TextFunctions.shingleHashes(
          org.apache.spark.sql.functions.col("text"), 13, "dc")).as("g"))
      .distinct()
    def contaminated(extra: String) = evalText + " " + extra
    val clean = (1 to 20).map(i => s"cl$i").mkString(" ")

    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingPipeline.deconQuarantineStream(
      stream.toDF().toDF("doc_id", "ts", "text"), evalHashes, 13,
      lateness = "60 minutes")
    val query = out.writeStream.format("memory").queryName("s_decon")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sdecon").toString)
      .start()
    try {
      // wave 1: one clean, one contaminated — the contaminated doc
      // quarantines in ITS OWN micro-batch (arrival-time admission,
      // no watermark finalization wait)
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), clean),
        (2L, ts("2024-01-01 10:00:30"), contaminated("x1 x2")))
      query.processAllAvailable()
      assert(spark.table("s_decon").collect().map(_.getLong(0)).toSet
        == Set(2L))
      // wave 2: a LATE contaminated doc — event time 40 min BEHIND
      // the stream's max, inside the 60-min lateness budget. The
      // screen must still reject it (the production contract: late
      // data is data, not a bypass).
      stream.addData(
        (3L, ts("2024-01-01 09:20:00"), contaminated("y1 y2")))
      query.processAllAvailable()
      val got = spark.table("s_decon").collect().map(_.getLong(0)).toSet
      assert(got == Set(2L, 3L), got.toString)
    } finally query.stop()
  }

  test("ingest admission state survives a stop/restart from checkpoint") {
    // the production property q90's single-run parity can't see: the
    // within-stream dedup state must come back from the checkpoint, so
    // a duplicate of a doc admitted BEFORE the restart is still
    // dropped AFTER it. The memory sink refuses checkpoint recovery,
    // so the sink is foreachBatch into a local buffer (the recoverable
    // sink shape); foreachBatch is at-least-once, so the post-restart
    // assertions are membership, not exact-sequence.
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Seq((100L, "already ingested")).toDF("doc_id", "text")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sadmit_restart").toString
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    def start() = StreamingPipeline.admitStream(
        stream.toDF().toDF("ts", "doc_id", "text"), base,
        lateness = "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select("doc_id").collect().map(_.getLong(0))
        admitted.synchronized { admitted ++= ids }
        ()
      }
      .start()

    val q1 = start()
    try {
      stream.addData(
        (ts("2024-01-01 10:00:00"), 1L, "first doc"),        // admitted
        (ts("2024-01-01 10:01:00"), 2L, "already ingested")) // base dup
      q1.processAllAvailable()
      assert(admitted.synchronized(admitted.sorted.toSeq) == Seq(1L))
    } finally q1.stop()

    admitted.synchronized(admitted.clear())
    stream.addData(
      (ts("2024-01-01 10:02:00"), 3L, "first doc"),   // dup of PRE-restart 1
      (ts("2024-01-01 10:03:00"), 4L, "brand new"))   // admitted
    val q2 = start()
    try {
      q2.processAllAvailable()
      val post = admitted.synchronized(admitted.toSet)
      assert(post.contains(4L))  // genuinely new content admitted
      assert(!post.contains(3L)) // state recovered: pre-restart dup dropped
    } finally q2.stop()
  }

  test("file-source sessionization survives a stop/restart from checkpoint") {
    // the production-ingress property q116's single-run parity can't
    // see: FileStreamSource must recover its offset log (not re-read
    // batch-0 files) AND flatMapGroupsWithState must recover held
    // sessions, so sessions spanning the restart still finalize
    // exactly once with the right bounds. Memory sink refuses
    // recovery, so foreachBatch into a buffer (at-least-once →
    // membership assertions on the final set).
    val spark = SparkTestSession.spark
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_fss_restart").toFile
    val srcDir = new java.io.File(root, "in"); srcDir.mkdirs()
    def stageOne(rows: Seq[(Long, Timestamp, Double)], name: String,
                 mtime: Long): Unit = {
      val tmp = new java.io.File(root, s"stage_$name")
      rows.toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(srcDir, name)
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(mtime))
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
    val t0 = System.currentTimeMillis() - 60000L
    // tight pre-restart window: max ts 10:10 → watermark 10:00, so no
    // session's end+gap (≥10:35) can ripen before the restart — both
    // users' sessions must be HELD in state across it
    stageOne(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:05:00"), 2.0),
      (2L, ts("2024-01-01 10:10:00"), 8.0)), "000.parquet", t0)

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    val ckpt = new java.io.File(root, "ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    def start() = StreamingPipeline.sessionize(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString), 30)
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect().map(r =>
          (r.getLong(0), r.getLong(3), r.getDouble(4)))
        got.synchronized { got ++= rows }
        ()
      }
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // nothing can have finalized yet: watermark hasn't passed any gap
    assert(got.synchronized(got.isEmpty))

    // post-restart: an in-gap event must merge INTO the recovered
    // session (not spawn an overlapping one), then sentinels ripen
    // everything; the processed corpus file must not re-read
    stageOne(Seq((1L, ts("2024-01-01 10:20:00"), 4.0)),
      "001.parquet", t0 + 20000L)
    stageOne(Seq((-1L, ts("2024-01-03 00:00:00"), 0.0)),
      "002.parquet", t0 + 40000L)
    stageOne(Seq((-1L, ts("2024-01-05 00:00:00"), 0.0)),
      "003.parquet", t0 + 60000L)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val sessions = got.synchronized(got.filter(_._1 != -1L).toSet)
    assert(sessions == Set(
      (1L, 3L, 7.0),   // 10:00+10:05 recovered, 10:20 merged in
      (2L, 1L, 8.0)))
  }

  test("q90 replay: streamed admission hash set equals batch admission") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "documents")
    val streamed = StreamingPipeline.admitStreamFileFeed(docs, 10L,
        java.nio.file.Files.createTempDirectory("graft_q90t").toString)
      .collect().map(_.getString(0)).toSeq
    val batch = docs.select(sha2(col("text"), 256).as("h")).distinct()
      .join(docs.where(col("doc_id") % 10 === 0)
          .select(sha2(col("text"), 256).as("h")).distinct(),
        Seq("h"), "left_anti")
      .orderBy("h").collect().map(_.getString(0)).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("replay state partitions are corpus-sized: floor 8, ~250k rows each, session cap") {
    assert(StreamingPipeline.replayStatePartitions(0L, 32) == 8)
    assert(StreamingPipeline.replayStatePartitions(600000L, 32) == 8)
    assert(StreamingPipeline.replayStatePartitions(2500000L, 32) == 10)
    assert(StreamingPipeline.replayStatePartitions(6000000L, 32) == 24)
    assert(StreamingPipeline.replayStatePartitions(60000000L, 32) == 32)
    assert(StreamingPipeline.replayStatePartitions(60000000L, 200) == 240.min(200))
    // a session tuned below the floor keeps its own setting as the cap
    assert(StreamingPipeline.replayStatePartitions(100L, 4) == 8.max(4).min(8))
  }

  test("replay conf dial: batch shuffle partitions restored after a replay") {
    val spark = SparkTestSession.spark
    val key = "spark.sql.shuffle.partitions"
    val retain = "spark.sql.streaming.minBatchesToRetain"
    val before = spark.conf.get(key)
    val retainBefore = spark.conf.get(retain) // SQLConf default surfaces here
    // a replay pins its own state-partition count at query start; the
    // session Verify/Bench share must get its batch setting back (and
    // the replay-only retention override must not linger)
    val docs = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "documents")
    StreamingPipeline.dedupStreamFileFeed(docs,
      java.nio.file.Files.createTempDirectory("graft_q105c").toString)
      .collect()
    assert(spark.conf.get(key) == before)
    assert(spark.conf.get(retain) == retainBefore)
  }

  test("q127 many-wave ingress: >=8 data micro-batches, a genuinely " +
      "late file admitted, output == batch sessionization") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // deterministic corpus: 20 users, one event every 47 s, with an
    // hour-long void injected every 200 events so sessions split and
    // real mid-stream finalizations happen across the waves
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 3000).map { i =>
      ((i % 20).toLong,
        new Timestamp(base + i * 47000L + (i / 200) * 3600000L),
        (i % 7).toDouble)
    }
    val ev = rows.toDF("user_id", "ts", "value")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q127").toFile.toString
    val got = StreamingPipeline
      .sessionizeFileStreamWaves(ev, 30, dir, 8)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3), r.getDouble(4)))
      .toSet
    // driver-side reference sessionization of the same rows
    val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map(e => (e._2.getTime, e._3)).sorted
      val sessions = sorted.foldLeft(List.empty[List[(Long, Double)]]) {
        case (h :: t, e) if e._1 <= h.head._1 + 30 * 60000L => (e :: h) :: t
        case (acc, e) => List(e) :: acc
      }
      sessions.map { s =>
        (u, s.map(_._1).min, s.map(_._1).max, s.size.toLong,
          math.rint(s.map(_._2).sum * 1e6) / 1e6)
      }
    }.toSet
    assert(got == expected)
    // staged layout: >=8 main-wave files + 2 sentinels, one per
    // micro-batch (maxFilesPerTrigger = 1) — the incremental-advance
    // claim is structural, not a single batch-0 corpus
    val srcDir = new java.io.File(dir, "in")
    val files = srcDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet").toInt).sorted
    val dataFiles = files.dropRight(2)
    assert(dataFiles.count(_ % 2 == 0) >= 8,
      s"only ${dataFiles.count(_ % 2 == 0)} main-wave files staged")
    // at least one late file is nonempty AND out-of-order: its oldest
    // event precedes the newest event of the already-delivered main
    // file — the genuinely-late admission the gate exists to exercise
    def tsRange(idx: Int) = spark.read
      .parquet(new java.io.File(srcDir, f"$idx%03d.parquet").toString)
      .agg(org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).head()
    val lateProven = dataFiles.filter(i => i % 2 == 1).exists { i =>
      val late = tsRange(i)
      late.getLong(2) > 0L && {
        val main = tsRange(i - 1)
        late.getTimestamp(0).before(main.getTimestamp(1))
      }
    }
    assert(lateProven, "no nonempty out-of-order late file staged")
  }

  test("single-wave stager: streaming FILE-source feed (no MemoryStream), " +
      "wave layout, sentinel replication") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val corpus = (0 until 10).map(i =>
      (i.toLong, ts(f"2024-01-01 10:${i}%02d:00"), i.toDouble))
      .toDF("user_id", "ts", "value")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stager").toString
    val sentinel = Seq((-1L, ts("2024-01-05 00:00:00"), 0.0))
      .toDF("user_id", "ts", "value")
    val stream = StreamingPipeline.stageSingleWaveFeed(
      corpus, 10L, dir, Seq(sentinel))
    // the FEED pin (r13 VERDICT task 2): the gate's source is the
    // production FileStreamSource over the staged landing dir — a
    // streaming relation whose source is FileSource, not MemoryStream
    assert(stream.isStreaming)
    val rel = stream.queryExecution.analyzed.toString
    assert(rel.contains("FileSource"), rel.take(300))
    assert(!rel.contains("MemoryStream"), rel.take(300))
    // staged layout: corpus wave 000_* then the sentinel wave 001_*
    // replicated to the corpus wave's file count, strictly later mtime
    val files = new java.io.File(dir, "in").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val corpusWave = files.filter(_.getName.startsWith("000_"))
    val sentWave = files.filter(_.getName.startsWith("001_"))
    assert(corpusWave.nonEmpty && sentWave.length == corpusWave.length)
    assert(corpusWave.map(_.lastModified()).max <
      sentWave.map(_.lastModified()).min)
    // sentinel wave: one replicated row per file
    assert(spark.read.parquet(sentWave.map(_.toString).toIndexedSeq: _*)
      .where($"user_id" === -1L).count() == sentWave.length)
  }

  test("q132 stream-stream interval join: output == batch interval join; state bounded by watermark") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q132t").toString
    val got = StreamingPipeline.clickPurchaseJoinFileFeed(ev, 30, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value"))
    val want = c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("value")), 6).as("purchase_total"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == want)
    // the state-cleanup contract: a watermark + event-time interval
    // condition lets Spark evict both sides' join state — the
    // streaming plan must carry watermarks on BOTH sides, and the
    // join must be the symmetric-hash stream-stream join, keyed on
    // the user equality (never a cartesian over the time range)
    val stream = StreamingPipeline.stageSingleWaveFeed(
      ev.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")),
      ev.count(),
      java.nio.file.Files.createTempDirectory("graft_q132p").toString,
      Nil)
    val joined = StreamingPipeline.clickPurchaseJoin(
      stream.where(col("event_type") === "click"),
      stream.where(col("event_type") === "purchase"), 30)
    val analyzed = joined.queryExecution.analyzed.toString
    assert(analyzed.sliding("EventTimeWatermark".length)
      .count(_ == "EventTimeWatermark") == 2, analyzed.take(1500))
    assert(joined.isStreaming)
  }

  test("q133 left-outer stream-stream join: watermark-finalized nulls == batch left join") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q133t").toString
    val got = StreamingPipeline.clickPurchaseLeftJoinFileFeed(ev, 30, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value"))
    val want = c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        count(col("p_ts")).as("n_matched"),
        round(sum(coalesce(col("value"), lit(0.0))), 6)
          .as("purchase_total"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.nonEmpty && got == want)
    // the gate must exercise BOTH emission paths of the outer join's
    // state machine: completed pairs (match in-batch) and
    // watermark-finalized null rows (no purchase within the window) —
    // otherwise it degenerates into q132
    assert(got.exists(_._3 > 0L), "no matched pairs in the corpus")
    assert(got.exists(r => r._3 < r._2),
      "every click matched — the finalization path was not exercised")
  }

  test("q137 many-wave join: pairs complete across micro-batches; output == batch join") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // crafted corpus: one event every 47 s for ~39 h, two users with
    // interleaved click/click/purchase/purchase runs — each click
    // pairs with ~9 same-user purchases inside the 30-min window, so
    // pairs straddle every wave boundary (proven below, not assumed)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 3000).map { i =>
      (i.toLong, new Timestamp(base + i * 47000L), (i % 2).toLong,
        if ((i / 2) % 2 == 0) "click" else "purchase", (i % 7).toDouble)
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q137t").toString
    val got = StreamingPipeline.clickPurchaseJoinWaves(ev, 30, dir, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value"))
    val want = c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("value")), 6).as("purchase_total"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == want)
    // PROVE the cross-batch path fired: recompute the stager's
    // closed-form wave routing and find a matched pair whose click
    // and purchase land in different waves — that pair can only have
    // completed from carried join state
    val minUs = base * 1000L
    val maxUs = (base + 2999L * 47000L) * 1000L
    val span = maxUs - minUs + 1
    val w = 8L
    def wave(tsMs: Long): Long =
      math.min(w - 1, ((tsMs * 1000L - minUs) * w) / span)
    val crossWave = for {
      (ci, cts, cu, "click", _) <- rows
      (pi, pts, pu, "purchase", _) <- rows
      if pu == cu && pts.getTime >= cts.getTime &&
        pts.getTime <= cts.getTime + 30 * 60000L &&
        wave(pts.getTime) != wave(cts.getTime)
    } yield (ci, pi)
    assert(crossWave.nonEmpty,
      "crafted corpus has no wave-straddling pair — the test is vacuous")
    // and the staging really was many waves, one file per micro-batch
    val files = new java.io.File(dir, "in").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 8, s"only ${files.length} files staged")
  }

  test("q88 file feed: production ingress, output == batch hourly agg") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q88t").toString
    val got = StreamingPipeline.windowedAggFileStream(ev, dir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq
    val want = ev.groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("replay egress is the file sink: result reads from files, " +
      "never a driver-held local relation") {
    val spark = SparkTestSession.spark
    val docs = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "documents")
    val result = StreamingPipeline.dedupStreamFileFeed(docs,
      java.nio.file.Files.createTempDirectory("graft_q105e").toString)
    // the memory-sink harness surfaced the result as a LocalTableScan
    // (driver rows riding every downstream task's closure — 600 MB
    // tasks at sf10); the file-sink egress must plan as a parquet scan
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), plan.take(500))
    assert(!plan.contains("LocalTableScan"), plan.take(500))
    // and it still returns the exact survivor set
    assert(result.count() ==
      docs.select(org.apache.spark.sql.functions
        .sha2(org.apache.spark.sql.functions.col("text"), 256))
        .distinct().count())
  }

  test("sink reclaim is age-gated: a frame held across TWO newer replays stays readable") {
    val spark = SparkTestSession.spark
    val docs = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "documents")
    def run() = StreamingPipeline.dedupStreamFileFeed(docs,
      java.nio.file.Files.createTempDirectory("graft_q105a").toString)
    val held = run() // lazy — its sink parquet must outlive what follows
    val n2 = run().count()
    val n3 = run().count()
    // pre-r15 the third replay reclaimed the first's sink dir (keep-
    // newest-prior-only); the 10-minute age gate now keeps young dirs,
    // so the held frame still reads its files (r14 VERDICT task 7)
    val n1 = held.count()
    assert(n1 > 0 && n1 == n2 && n2 == n3)
  }

  test("sessionizeReplay (spec-only MemoryStream twin since r15) == batch sessionization") {
    // the former q80 gate, demoted per r14 VERDICT task 4: the hash
    // gate for this contract is q116 (production FileStreamSource);
    // this spec keeps the driver-controlled MemoryStream replay —
    // deterministic batch boundaries, chunked addData — exercised and
    // bit-equal to the batch q41 sessionization
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingPipeline.sessionizeReplay(
      graft.sources.Corpus.table(spark, dir, "events"), 30)
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.operators.RelationalOps.sessionizeEvents(spark, dir, 30)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q158 probe: evidence across waves quarantines on arrival, the latch emits each doc ONCE, flag set == batch probe") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Winnow
    val rng = new scala.util.Random(53)
    def words(n: Int) = Seq.fill(n)("s" + rng.nextInt(9000)).mkString(" ")
    val runX = words(40); val runY = words(40)
    val base = Seq((1L, runX + " " + words(12)),
      (2L, words(8) + " " + runY)).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q158_probe").toString
    Winnow.buildWinnowStore(base, "q158_probe_tbl", dir)
    val basePerFp = Winnow.storeDocLists(spark, "q158_probe_tbl",
      Winnow.WinnowMaxDf)
    val docA = (100L, ts("2024-01-01 10:00:00"), words(6) + " " + runX)
    val docB = (101L, ts("2024-01-01 10:10:00"), words(5) + " " + runY)
    val clean = (102L, ts("2024-01-01 10:01:00"), words(30))
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingPipeline.winnowProbeStream(
      stream.toDF().toDF("doc_id", "ts", "text"), basePerFp,
      Winnow.WinnowK, Winnow.WinnowW, minShared = 1L,
      lateness = "1 hour", latenessMs = 3600000L)
    val query = out.toDF().writeStream.format("memory")
      .queryName("q158_probe").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_q158ck").toString)
      .start()
    try {
      // wave 1: the runX copy quarantines IN ITS ARRIVAL BATCH (no
      // watermark advance needed — emission is threshold-triggered)
      stream.addData(docA, clean)
      query.processAllAvailable()
      assert(spark.table("q158_probe").collect()
        .map(_.getLong(0)).toSeq == Seq(100L))
      // wave 2: a new copier emits; docA REPLAYED (a re-delivered
      // file) accumulates more counts but the latch blocks re-emission
      stream.addData(docB, docA)
      query.processAllAvailable()
      val rows = spark.table("q158_probe").collect()
        .map(_.getLong(0)).toSeq.sorted
      assert(rows == Seq(100L, 101L), rows.toString)
      // the streamed flag set == the batch probe's on the same store
      val batchFlags = Winnow.winnowStorePairs(
          Seq((100L, docA._3), (101L, docB._3), (102L, clean._3))
            .toDF("doc_id", "text"),
          "q158_probe_tbl", Winnow.WinnowK, Winnow.WinnowW,
          Winnow.WinnowMaxDf, 1L)
        .select("delta_doc").distinct().collect()
        .map(_.getLong(0)).toSet
      assert(batchFlags == Set(100L, 101L))
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS q158_probe_tbl")
    }
  }

  test("q194: streamed semantic admission == the batch decon's kept set") {
    val spark = SparkTestSession.spark
    val embs = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val fixture = java.nio.file.Files
      .createTempDirectory("graft_q194_fixture").toString
    val streamed = StreamingPipeline.semanticAdmitStream(embs, fixture)
      .collect().map(_.toString).toSeq
    val batch = graft.pipeline.Similarity.semanticDecontamination(embs)
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("q191: streamed query answers == the batch BM25 over the same corpus") {
    val spark = SparkTestSession.spark
    val docs = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "documents")
    val store = java.nio.file.Files
      .createTempDirectory("graft_q191_store").toString
    val fixture = java.nio.file.Files
      .createTempDirectory("graft_q191_fixture").toString
    try {
      val streamed = StreamingPipeline.bm25QueryStream(
          docs, "q191_spec_tbl", store, fixture)
        .collect().map(_.toString).toSeq
      val batch = graft.pipeline.Retrieval.bm25BatchTopK(docs)
        .collect().map(_.toString).toSeq
      assert(streamed == batch)
    } finally spark.sql("DROP TABLE IF EXISTS q191_spec_tbl")
  }
}
