package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Row/state shapes for gap sessionization (top level for Encoders). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
case class SessionState(start: Long, end: Long, n: Long, total: Double)
case class SessionBuf(sessions: Seq[SessionState])
case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                       session_end: java.sql.Timestamp,
                       n_events: Long, total_value: Double)

/** Row/state shapes for the streaming winnow admission probe (q158;
  * top level for Encoders): one hit row per (arriving doc, shared
  * fingerprint, base holder); state = per-base shared-fingerprint
  * counts plus the emitted latch. */
case class WinnowHit(doc_id: Long, ts: java.sql.Timestamp, ds: Seq[Long])
case class WinnowProbeState(counts: Map[Long, Long], emitted: Boolean)
case class QuarantinedDoc(doc_id: Long)

/** Data-plane Structured Streaming operators — the streaming spellings
  * of the batch pipeline's event aggregation (q14/q34) and exact dedup
  * (q16/q17). Each takes a streaming DataFrame (readStream source or
  * MemoryStream in tests) and returns the transformed streaming frame;
  * the caller picks sink/trigger/checkpoint.
  *
  * 100 TB / continuous-ingest stance:
  *  - Watermarks bound state: windowed aggregation drops state for
  *    windows older than the lateness budget, so state size tracks the
  *    (lateness × event-rate) product, not the stream's history.
  *  - Streaming dedup keys state by content hash; with the watermark it
  *    evicts hashes once their event-time horizon passes — the standard
  *    bounded-state exact-dedup for ingest pipelines (re-ingest of an
  *    old document past the horizon is a new record by design; combine
  *    with the batch tiers for full-history dedup).
  *  - Aggregations are partial+final exactly as in batch (same Catalyst
  *    physical operators under the micro-batch runner), so the
  *    partitioning story carries over unchanged.
  */
object StreamingPipeline {

  /** Windowed event aggregation (streaming q14-shape): per event_type
    * per tumbling window, count + sum(value), tolerating `lateness` of
    * out-of-order arrival. Output mode: append (finalized windows only)
    * or update, caller's choice. */
  def eventsWindowedAgg(events: DataFrame,
                        window: String = "1 hour",
                        lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Gap-based sessionization — the custom-state surface
    * (flatMapGroupsWithState + event-time timeout) that windowed
    * aggregation can't express: a session ends `gapMinutes` after its
    * last event, not at a fixed boundary.
    *
    * Exactness contract: a session is emitted ONLY once the watermark
    * passes its end + gap — at that point any event that could still
    * merge into it (t ≤ end + gap ≤ watermark) is already outside the
    * lateness budget and would be dropped by the watermark filter, so
    * Append-mode output equals the batch sessionization of the same
    * data (pinned in StreamingPipelineSpec). Unfinalized sessions — the
    * open one AND any gap-closed-but-not-yet-ripe ones — are held in
    * state as a sorted interval list; each batch interval-merges the
    * incoming events into that list (a late-but-in-budget event lands
    * in, or bridges, held sessions instead of spawning an overlapping
    * one, which Append could never retract).
    *
    * State per user is the handful of sessions inside one lateness
    * horizon (bounded by lateness/gap + 1, NOT history length), so the
    * 100 TB story is unchanged: one shuffle on user_id plus O(active
    * users × sessions-in-horizon) state. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 lateness: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    // State timestamps are MICROSECONDS — Spark's own timestamp
    // precision. Timestamp.getTime (millis) would silently truncate
    // sub-millisecond event times, making streaming session bounds
    // drift from the batch sessionization of the same data (caught by
    // the q80 gate: the corpus carries microsecond stamps).
    val gapUs = gapMinutes.toLong * 60000000L

    def toMicros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def toSession(user: Long, s: SessionState): UserSession =
      UserSession(user, fromMicros(s.start), fromMicros(s.end), s.n, s.total)

    // sorted interval merge with gap tolerance: any two sessions (or a
    // session and an event) within `gapUs` coalesce; n/total are sums,
    // so merging already-merged sessions stays exact
    def mergeAll(ss: Seq[SessionState]): Seq[SessionState] =
      ss.sortBy(s => (s.start, s.end))
        .foldLeft(List.empty[SessionState]) { (acc, s) =>
          acc match {
            case h :: t if s.start <= h.end + gapUs =>
              SessionState(math.min(h.start, s.start), math.max(h.end, s.end),
                h.n + s.n, h.total + s.total) :: t
            case _ => s :: acc
          }
        }.reverse

    // one code path for data batches AND timeouts (incoming is empty on
    // timeout): merge, emit ripe sessions, hold + re-arm the rest
    def update(user: Long, incoming: Iterator[SessionEvent],
               state: GroupState[SessionBuf]): Iterator[UserSession] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val held = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      val merged = mergeAll(held ++ incoming.map { e =>
        val us = toMicros(e.ts)
        SessionState(us, us, 1, e.value)
      })
      // strict <: an event with t == watermark may still be admitted,
      // and t == end + gap == watermark would belong to this session
      val (ripe, open) = merged.partition(_.end + gapUs < wmUs)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionBuf(open))
        // earliest possible finalization (millis, rounded UP so the
        // micro-precise ripeness test has passed when it fires); must
        // stay ahead of the watermark
        val fireMs = math.floorDiv(open.map(_.end).min + gapUs, 1000L) + 1L
        state.setTimeoutTimestamp(
          math.max(fireMs, state.getCurrentWatermarkMs() + 1))
      }
      ripe.iterator.map(toSession(user, _))
    }

    events.selectExpr("user_id", "ts", "value").as[SessionEvent]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  private def rmTree(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(rmTree); f.delete(); ()
  }

  /** Pid-scoped lifecycle for replay SINK dirs, following the
    * graft-fixtures convention (`…_p<pid>` suffix under the shared
    * root). This IS SparkEntry.fixturePid — one shared initializer, so
    * first sink use also registers the shutdown hook AND runs the
    * orphan sweep (dead-pid + age-floor dirs reclaimed); a streaming
    * process SIGKILL'd before any fixture query no longer leaks its
    * sink dirs until some later fixture run happens to sweep
    * (ADVICE r12). Dirs must be cleaned at exit, not per-call: the
    * read-back frame is LAZY, so its files have to outlive the replay
    * invocation. */
  private def sinkPid: Long = graft.SparkEntry.fixturePid

  /** Minimum age before a superseded replay sink dir may be deleted:
    * a lazily-held result frame younger than this can never have its
    * parquet reclaimed out from under it, however many newer replays
    * of the same gate run in the meantime (r14 VERDICT task 7). */
  private[graft] val SinkReclaimAgeMs: Long = 10L * 60L * 1000L

  /** Run a replay streaming query through the PRODUCTION parquet file
    * sink — not the memory sink — and hand back the committed result
    * as a distributed file read. The memory sink held the full result
    * in driver memory and surfaced it as a one-partition local
    * relation, which at 100× (q80/q116 emit 9.5 M sessions) made every
    * downstream write a single 600 MB task carrying the rows in its
    * closure. The file sink is the egress a production deployment
    * uses: executors write their partitions directly, the driver never
    * materializes the result, and the read-back parallelizes like any
    * parquet scan (Spark reads exactly the files the sink's
    * `_spark_metadata` log committed). Each invocation gets a FRESH
    * pid-scoped dir — the parquet sink appends, so reuse would double
    * rows on a bench rerun; the checkpoint is deleted eagerly once the
    * query stops, the gate-sized data dir at process exit.
    *
    * CALLER CONTRACT (ADVICE r13, age-gated r15): the returned frame
    * is lazy; its files survive at least ONE newer replay of the same
    * gate AND at least [[SinkReclaimAgeMs]] (10 min) of wall clock
    * regardless of replay count — the reclaim below keeps the newest
    * prior sink dir unconditionally and deletes an older one only
    * once it has aged past the window. Consume (or persist) a gate's
    * result within 10 minutes if the gate may replay twice more in
    * the meantime. Every in-repo caller (Verify, Bench, the specs)
    * consumes each result before re-invoking its gate, so neither
    * bound ever binds. */
  private def runReplayToFileSink(out: DataFrame, qtag: String,
      nRows: Long)(feed: org.apache.spark.sql.streaming.StreamingQuery
        => Unit): DataFrame = {
    val spark = out.sparkSession
    val root = new java.io.File(graft.SparkEntry.fixtureRoot)
    // Repeated replays of the same gate must not stack hundreds of MB
    // of sink data until JVM exit (ADVICE r12) — but the PREVIOUS
    // invocation's parquet may still back a live lazily-read frame
    // (its result is consumed only after this method returns), so the
    // reclaim keeps the NEWEST prior dir and deletes only older ones
    // that have also AGED past the 10-minute window (r14 VERDICT
    // task 7): a burst of replays can briefly hold a few dirs, but a
    // frame held for under 10 min can never read deleted parquet,
    // and the shutdown hook still reclaims everything at exit.
    val cutoff = System.currentTimeMillis() - SinkReclaimAgeMs
    val prev = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"${qtag}_sink_") &&
        f.getName.endsWith(s"_p$sinkPid"))
      .sortBy(_.lastModified())
    prev.dropRight(1).filter(_.lastModified() < cutoff).foreach(rmTree)
    val dir = new java.io.File(root,
      s"${qtag}_sink_" + java.util.UUID.randomUUID().toString
        .replace("-", "") + s"_p$sinkPid")
    dir.mkdirs()
    val data = new java.io.File(dir, "data")
    val ckpt = new java.io.File(dir, "ckpt")
    withReplayConf(spark, nRows) {
      val query = out.writeStream.format("parquet")
        .option("path", data.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Append)
        .start()
      try feed(query) finally {
        dumpProgress(qtag, query)
        query.stop()
      }
    }
    rmTree(ckpt)
    spark.read.schema(out.schema).parquet(data.toString)
  }

  /** Diagnostics (SPARK_GRAFT_STREAM_PROGRESS=1): per-micro-batch
    * durationMs breakdown to stderr, so "where does the per-wave fixed
    * cost go" is measured, not guessed (guide §1). No-op when unset. */
  private def dumpProgress(qtag: String,
      query: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    if (sys.env.get("SPARK_GRAFT_STREAM_PROGRESS").contains("1"))
      try query.recentProgress.foreach { p =>
        System.err.println(s"[stream-progress] $qtag batch=${p.batchId} " +
          s"rows=${p.numInputRows} durationMs=${p.durationMs}")
      } catch { case _: Throwable => () }

  /** Replay sentinel user id: Long.MinValue, a value the replay REJECTS
    * in its input (require below) rather than silently dropping — the
    * old `user_id >= 0` output filter would have swallowed genuine
    * negative ids (ADVICE r8/r9). */
  private val SentinelUser = Long.MinValue

  /** State-partition count for a REPLAY over `n` input rows. A
    * streaming query pins `spark.sql.shuffle.partitions` into its
    * offset log at start, and every stateful micro-batch then
    * opens/commits that many state stores. Replay gates process the
    * corpus in few micro-batches, so the store count must be sized to
    * the DATA, not left at the session's batch setting: 32 stores per
    * batch over a gate-sized corpus is pure per-batch fixed cost
    * (measured: q80 5.2→3.8 s, q88 5.3→3.1 s at sf0.1), while a
    * pinned LOW count would throttle the genuine shuffle+state work
    * once the corpus outgrows it (measured NEUTRAL at the 6 M-event
    * sf1, where the single-threaded driver feed dominates — the rule
    * exists so the constant can never become the bottleneck at the
    * next replica size).
    * Same corpus-sized-rule discipline as the embedding bucket
    * widths: ~250 k rows per state partition, floor 8 (even under a
    * smaller session setting — 8 tiny stores are harmless), capped at
    * the session's own setting above the floor. Results are
    * partition-count independent
    * (hash-matched vs the batch oracle at every scale factor) —
    * production sizes the same dial to its keyspace × executor count. */
  private[graft] def replayStatePartitions(n: Long, sessionParts: Int): Int =
    math.max(8L, math.min(sessionParts.toLong, (n + 249999L) / 250000L))
      .toInt

  /** Replay feed chunk size for an `n`-row corpus: at most ~8 data
    * micro-batches. Chunking exists to bound any single batch, not for
    * correctness (the feed is ts-sorted, so no chunking choice can
    * late-drop), and the rows are already collected driver-side either
    * way — but each micro-batch pays a fixed planning + state-commit
    * cost, so a pinned 200 k chunk turned the 6 M-event sf1 replay
    * into 30 batches of overhead. Floor stays 200 k so gate-scale
    * behavior is unchanged. */
  private[graft] def replayChunkSize(n: Long): Int =
    math.max(200000L, (n + 7L) / 8L).toInt

  /** Run `body` (a replay: start → feed → stop) with the replay-sized
    * state-partition conf for an `n`-row corpus, restoring the
    * session's batch setting after — the conf is only read at
    * streaming-query start, so batch work before/after the replay is
    * untouched. Also retains only 2 batches of checkpoint log (the
    * replay deletes its checkpoint anyway). */
  private def withReplayConf[T](spark: org.apache.spark.sql.SparkSession,
                                n: Long)(body: => T): T = {
    val parts = "spark.sql.shuffle.partitions"
    val retain = "spark.sql.streaming.minBatchesToRetain"
    val prevParts = spark.conf.get(parts)
    val prevRetain = spark.conf.getOption(retain)
    spark.conf.set(parts,
      replayStatePartitions(n, prevParts.toInt).toString)
    spark.conf.set(retain, "2")
    try body
    finally {
      spark.conf.set(parts, prevParts)
      prevRetain match {
        case Some(v) => spark.conf.set(retain, v)
        case None    => spark.conf.unset(retain)
      }
    }
  }

  /** SPEC-ONLY harness since r15 (formerly gate q80; r14 VERDICT
    * task 4): replay the BATCH events table through the streaming
    * sessionizer via the driver-fed MemoryStream test source and
    * return every finalized session. The gate surface moved wholly to
    * the production FileStreamSource spelling (q116 single-wave, q127
    * many-wave — same q41 oracle); this twin stays because
    * MemoryStream's per-batch addData is the one replay harness with
    * DETERMINISTIC batch boundaries under driver control, so
    * StreamingPipelineSpec uses it to pin chunked-feed semantics
    * (parity with batch sessionization) without touching a
    * filesystem. Two far-future sentinel batches
    * (user SentinelUser) push the watermark past the whole corpus so
    * every real session ripens and emits; the sentinel's own
    * never-finalized session is excluded from the result. Because the corpus arrives
    * as one batch, the first-batch watermark is the epoch and nothing
    * is late-dropped, so Append output must equal the batch
    * sessionization of the same table — the q41 oracle verbatim
    * (asserted in the spec; the hash gate for the identical contract
    * is q116). */
  def sessionizeReplay(events: DataFrame, gapMinutes: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the replay SOURCE is driver-fed by MemoryStream's design (test/
    // replay harness, not the production path — that is readStream);
    // chunked addData keeps any single batch bounded. Feeding in ts
    // order makes late-dropping impossible: after chunk k the
    // watermark is max(ts_k) − lateness, and every later chunk's
    // events are ≥ max(ts_k) by the sort.
    val rows = events.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)].collect()
      .sortBy(_._2.getTime)
    // collision-PROOF, not collision-improbable: a corpus row carrying
    // the reserved sentinel id fails loudly instead of being silently
    // filtered out of the parity result
    require(rows.forall(_._1 != SentinelUser),
      s"events corpus contains reserved replay sentinel user_id $SentinelUser")
    val maxTs = rows.iterator.map(_._2.getTime).max
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = sessionize(stream.toDF().toDF("user_id", "ts", "value"),
      gapMinutes)
    runReplayToFileSink(out.toDF(), "q80", rows.length.toLong) { query =>
      rows.grouped(replayChunkSize(rows.length.toLong)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq)
        query.processAllAvailable()
      }
      // two sentinel batches: the first advances max event time, the
      // second runs with the advanced watermark so timeouts fire
      val day = 86400000L
      stream.addData((SentinelUser, new java.sql.Timestamp(maxTs + day), 0.0))
      query.processAllAvailable()
      stream.addData((SentinelUser, new java.sql.Timestamp(maxTs + 2 * day), 0.0))
      query.processAllAvailable()
    }
      .where(col("user_id") =!= SentinelUser)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("total_value"), 6).as("total_value"))
      .orderBy("user_id", "session_start")
  }

  /** The single-wave file-feed stager, factored out of the q116 gate
    * (r13 VERDICT task 2) so EVERY replay gate — not just sessionize —
    * can feed from the PRODUCTION `spark.readStream.parquet(dir)`
    * entry path with no corpus collect on the driver.
    *
    * Stages `corpus` under `fixtureDir` as ONE mtime wave of parquet
    * files (~250 k rows/file so the batch-0 scan parallelizes like a
    * real landing directory, instead of one giant file read by one
    * task), then each `sentinels` frame — one or more far-future rows
    * (q133 passes two-row click+purchase waves) — as its own
    * strictly-later mtime wave, replicated to the corpus wave's
    * actual file count m. With `maxFilesPerTrigger = m`,
    * FileStreamSource (oldest-first by mtime) delivers exactly
    * 1 + sentinels.size micro-batches: whole corpus, then one batch
    * per sentinel wave — a wave can never split or mix because each
    * wave is exactly m files and strictly older than the next. Batch 0
    * carries the whole corpus, so the first-batch watermark is the
    * epoch and nothing is late-dropped; the sentinel batches advance
    * the watermark so windows finalize / timeouts fire. The staging
    * itself is gate plumbing — a production deployment points
    * readStream at its landing directory. */
  private[graft] def stageSingleWaveFeed(corpus: DataFrame, nRows: Long,
      fixtureDir: String, sentinels: Seq[DataFrame],
      minFiles: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    val root = new java.io.File(fixtureDir)
    rmTree(root)
    val srcDir = new java.io.File(root, "in")
    srcDir.mkdirs()

    // one mtime WAVE per intended micro-batch, every wave the same
    // file count (Spark writes a directory; the part files move into
    // the watched dir under ordered names + an explicit shared mtime).
    // The 250k-rows-per-file heuristic is tuned for THIN event rows;
    // staged file count is also the stream's SCAN parallelism floor
    // (FileStreamSource splits by file), so a feed of FAT rows with
    // heavy per-row stream work must raise `minFiles` — measured on
    // q158 at sf1: the 125k-doc delta in ONE file ran the stream-side
    // winnow fingerprinting near single-threaded, 52 s of a 52 s gate.
    val targetFiles = math.max(minFiles,
      math.max(1L, math.min(32L, (nRows + 249999L) / 250000L)).toInt)
    def stage(df: DataFrame, wave: String, mtime: Long): Int = {
      val tmp = new java.io.File(root, s"stage_$wave")
      df.write.mode("overwrite").parquet(tmp.toString)
      val parts = tmp.listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      parts.zipWithIndex.foreach { case (part, i) =>
        val dest = new java.io.File(srcDir, f"${wave}_$i%03d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        require(dest.setLastModified(mtime), s"cannot set mtime on $dest")
      }
      rmTree(tmp)
      parts.length
    }
    val t0 = System.currentTimeMillis() - 60000L
    // corpus wave: round-robin may leave a partition empty (written
    // files < targetFiles), so the ACTUAL staged count m becomes the
    // wave size everywhere it matters
    val m = stage(corpus.repartition(targetFiles), "000", t0)
    require(m >= 1, "corpus wave staged no files")
    sentinels.zipWithIndex.foreach { case (s, i) =>
      // a sentinel WAVE: m copies of the frame's far-future row(s),
      // one copy per file — spark.range(0, m, 1, m) puts exactly one
      // row in each of its m partitions DETERMINISTICALLY (unlike
      // round-robin); the broadcast cross join tags every partition's
      // row with the sentinel values. range's column is renamed
      // before the join so a corpus carrying its own `id` column can
      // never make the select ambiguous (ADVICE r14). Duplicate
      // sentinel rows collapse into the sentinel groups, which the
      // caller excludes anyway.
      val rep = spark.range(0L, m.toLong, 1L, m).toDF("__graft_rep")
        .crossJoin(broadcast(s))
        .select(corpus.columns.map(col).toIndexedSeq: _*)
      val mi = stage(rep, f"${i + 1}%03d", t0 + (i + 1) * 20000L)
      require(mi == m, s"sentinel wave $i staged $mi files, corpus wave $m")
    }
    spark.readStream
      .schema(corpus.schema)
      .option("maxFilesPerTrigger", m)
      .parquet(srcDir.toString)
  }

  /** Gate composition (q116): the q80 parity contract driven through
    * the PRODUCTION entry path — `spark.readStream.parquet(dir)` over
    * real files — instead of the driver-fed MemoryStream harness. This
    * retires the one caveat every prior streaming gate carried: the
    * operators were oracle-checked, the readStream/FileStreamSource
    * ingress was not.
    *
    * Mechanics: stageSingleWaveFeed delivers exactly three
    * micro-batches (whole corpus, then two far-future sentinel waves).
    * Batch 0 carries the whole corpus, so the first-batch watermark is
    * the epoch and nothing is late-dropped; the sentinel batches
    * advance the watermark and fire the event-time timeouts, ripening
    * every real session. Append output therefore equals the batch
    * sessionization — q41's oracle verbatim, the same contract q80
    * pins over MemoryStream.
    *
    * Scale shape: identical to sessionize (one shuffle on user_id,
    * watermark-bounded state). */
  def sessionizeFileStream(events: DataFrame, gapMinutes: Int,
                           fixtureDir: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val projected = events.select(col("user_id"), col("ts"), col("value"))
    require(projected.where(col("user_id") === SentinelUser).isEmpty,
      s"events corpus contains reserved replay sentinel user_id $SentinelUser")
    val statsRow = projected.agg(max(col("ts")), count(lit(1))).head()
    require(statsRow.getLong(1) > 0L,
      "events corpus is empty — nothing to stage or sessionize")
    val maxTs = statsRow.getTimestamp(0).getTime
    val nRows = statsRow.getLong(1)
    val day = 86400000L
    def sentinel(offset: Long) =
      Seq((SentinelUser, new java.sql.Timestamp(maxTs + offset), 0.0))
        .toDF("user_id", "ts", "value")
    val stream = stageSingleWaveFeed(projected, nRows, fixtureDir,
      Seq(sentinel(day), sentinel(2 * day)))
    val out = sessionize(stream, gapMinutes)
    runReplayToFileSink(out.toDF(), "q116", nRows) { query =>
      query.processAllAvailable()
    }
      .where(col("user_id") =!= SentinelUser)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("total_value"), 6).as("total_value"))
      .orderBy("user_id", "session_start")
  }

  /** Gate composition (q127): the q116 production-ingress contract
    * under MANY-WAVE arrival — the corpus lands as ~2·nWaves mtime-
    * ordered files consumed one per micro-batch
    * (`maxFilesPerTrigger = 1`), so the FileStreamSource path is
    * exercised with INCREMENTAL watermark advance across ≥ nWaves
    * data batches and with GENUINELY LATE FILES, not a single batch-0
    * corpus (the one residual caveat q116 carried).
    *
    * Wave construction (one corpus pass, closed-form file routing):
    * the ts range splits into nWaves contiguous slices; within wave k
    * the events falling [8 min, 4 min) before the wave's upper
    * boundary are carved into a LATE file delivered AFTER the wave's
    * main file. When the late file's batch runs, the watermark is
    * (max ts seen through the main file) − 10 min < boundary − 8 min
    * ≤ every late ts, so the late events are admitted — genuinely
    * out-of-order (the main file already carried ts up to the
    * boundary) but inside the lateness budget, which is what keeps
    * Append output equal to the batch sessionization (q41's oracle
    * verbatim). A late event can never belong to an already-emitted
    * session either: emission needs end + gap < watermark, and
    * gap (30 min) > lateness (10 min) puts every admitted ts beyond
    * such a session's reach. Two far-future sentinel files then ripen
    * every real session, as in the MemoryStream harness.
    *
    * Scale shape: identical to sessionize (one shuffle on user_id,
    * watermark-bounded state); staging is ONE pass
    * (`repartition(fileIdx).write.partitionBy(fileIdx)`), gate
    * plumbing a production deployment replaces with its landing
    * directory. */
  /** The many-wave generalization of [[stageSingleWaveFeed]], factored
    * out of the q127 gate so any replay can ride an INCREMENTAL
    * FileStreamSource ingress: `projected` is staged as up to `nWaves`
    * event-time-ordered files (closed-form integer-µs routing — wave
    * by floor division, the wave's exclusive upper boundary the
    * ceiling form of the SAME fraction, so boundary events can never
    * self-contradict their late test), each wave followed by a LATE
    * file carrying its [8, 4)-minute-before-boundary band; then each
    * `sentinels(maxUs)` frame as its own strictly-later file. With
    * `maxFilesPerTrigger = 1`, every file is one micro-batch, so the
    * watermark advances incrementally and genuinely late rows are
    * admitted inside the lateness budget.
    *
    * No-late-drop argument (holds for EVERY consumer with lateness
    * ≥ 10 min): when wave k's late file is consumed, the watermark is
    * at most (wave k's max event time) − 10 min ≈ boundary_k − 10 min,
    * and the late band starts at boundary_k − 8 min > that — so no
    * staged row is ever behind the watermark on arrival. */
  private[graft] def stageManyWaveFeed(projected: DataFrame, tsCol: String,
      fixtureDir: String, nWaves: Int,
      sentinels: Long => Seq[DataFrame]): DataFrame = {
    val spark = projected.sparkSession
    val statsRow = projected
      .agg(min(unix_micros(col(tsCol))), max(unix_micros(col(tsCol))),
        count(lit(1))).head()
    require(statsRow.getLong(2) > 0L,
      "corpus is empty — nothing to stage")
    val minUs = statsRow.getLong(0)
    val maxUs = statsRow.getLong(1)
    val span = math.max(1L, maxUs - minUs + 1)
    // a wave narrower than the late window cannot stage a meaningful
    // late file; shrink the wave count rather than mis-slice (the
    // gate corpora span days, so this binds only on degenerate input)
    val lateLoUs = 8L * 60 * 1000000L
    val lateHiUs = 4L * 60 * 1000000L
    val w = math.max(1L, math.min(nWaves.toLong, span / (2 * lateLoUs)))

    val root = new java.io.File(fixtureDir)
    rmTree(root)
    val srcDir = new java.io.File(root, "in")
    srcDir.mkdirs()

    // closed-form file routing, all in MICROSECONDS and all in
    // INTEGER division (`div` — Column./ would go through double)
    val staged = new java.io.File(root, "staged")
    val outCols = projected.columns.map(col).toIndexedSeq
    projected
      .withColumn("us", unix_micros(col(tsCol)))
      .withColumn("wave", least(lit(w - 1),
        expr(s"((us - ${minUs}L) * ${w}L) div ${span}L")))
      .withColumn("bHi",
        expr(s"${minUs}L + ((wave + 1L) * ${span}L + ${w - 1}L) div ${w}L"))
      .withColumn("fileIdx", (col("wave") * 2 +
        when(col("us") >= col("bHi") - lateLoUs &&
          col("us") < col("bHi") - lateHiUs, 1L).otherwise(0L)).cast("int"))
      .select(outCols :+ col("fileIdx"): _*)
      .repartition(2 * w.toInt, col("fileIdx"))
      .write.partitionBy("fileIdx").parquet(staged.toString)
    val t0 = System.currentTimeMillis() - 3600000L
    val dataFiles = (0 until 2 * w.toInt).flatMap { idx =>
      val dir = new java.io.File(staged, s"fileIdx=$idx")
      val parts = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      require(parts.length <= 1,
        s"wave file $idx staged as ${parts.length} parts") // one task per idx
      parts.headOption.map { part =>
        val dest = new java.io.File(srcDir, f"$idx%03d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        require(dest.setLastModified(t0 + idx * 20000L),
          s"cannot set mtime on $dest")
        dest
      }
    }
    rmTree(staged)
    require(dataFiles.nonEmpty, "no corpus files staged")
    sentinels(maxUs).zipWithIndex.foreach { case (s, idx) =>
      val f = new java.io.File(root, s"sent_$idx")
      s.repartition(1).write.parquet(f.toString)
      val part = f.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(srcDir, f"${2 * w.toInt + idx}%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      require(dest.setLastModified(t0 + (2 * w.toInt + idx) * 20000L),
        s"cannot set mtime on $dest")
      rmTree(f)
    }
    spark.readStream
      .schema(projected.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
  }

  def sessionizeFileStreamWaves(events: DataFrame, gapMinutes: Int,
                                fixtureDir: String,
                                nWaves: Int = 8): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val projected = events.select(col("user_id"), col("ts"), col("value"))
    require(projected.where(col("user_id") === SentinelUser).isEmpty,
      s"events corpus contains reserved replay sentinel user_id $SentinelUser")
    val nRows = projected.count()
    val day = 86400000000L
    val stream = stageManyWaveFeed(projected, "ts", fixtureDir, nWaves,
      maxUs => Seq(1L, 2L).map { offset =>
        Seq((SentinelUser,
            new java.sql.Timestamp((maxUs + offset * day) / 1000L), 0.0))
          .toDF("user_id", "ts", "value")
      })
    val out = sessionize(stream, gapMinutes)
    runReplayToFileSink(out.toDF(), "q127", nRows) { query =>
      query.processAllAvailable()
    }
      .where(col("user_id") =!= SentinelUser)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("total_value"), 6).as("total_value"))
      .orderBy("user_id", "session_start")
  }

  /** Gate composition (q88): the streaming windowed aggregation fed
    * through the PRODUCTION readStream entry path (stageSingleWaveFeed
    * — whole corpus in batch 0, two far-future sentinel waves so every
    * real window finalizes under Append mode). The r13 spelling
    * collected the corpus to the driver and fed a MemoryStream; the
    * operator pipeline and the oracle are unchanged — only the FEED
    * moved off the driver onto FileStreamSource (r13 VERDICT task 2).
    * Tumbling 1-hour windows align to the epoch, so the batch
    * equivalent is a date_trunc('hour') GROUP BY — the q14/q34-family
    * oracle — giving the watermark+window operator pipeline its own
    * hash gate next to the custom-state sessionizer's (q80). */
  def windowedAggFileStream(events: DataFrame, fixtureDir: String)
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val projected = events.select(col("ts"), col("event_type"), col("value"))
    // per-replay random sentinel type: a fixed literal could collide
    // with a genuine event_type and silently drop its rows (the q80
    // sentinel concern in string form); a UUID suffix cannot occur in
    // the corpus, and the require makes the contract loud anyway (a
    // pushed-down one-column filter, cheap next to the staging write)
    val sentinel = "_sentinel_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    require(projected.where(col("event_type") === sentinel).isEmpty,
      "sentinel collision")
    val statsRow = projected.agg(max(col("ts")), count(lit(1))).head()
    require(statsRow.getLong(1) > 0L,
      "events corpus is empty — nothing to stage or aggregate")
    val maxTs = statsRow.getTimestamp(0).getTime
    val nRows = statsRow.getLong(1)
    val day = 86400000L
    def sent(offset: Long) =
      Seq((new java.sql.Timestamp(maxTs + offset), sentinel, 0.0))
        .toDF("ts", "event_type", "value")
    val stream = stageSingleWaveFeed(projected, nRows, fixtureDir,
      Seq(sent(day), sent(2 * day)))
    val out = eventsWindowedAgg(stream,
      window = "1 hour", lateness = "10 minutes")
    runReplayToFileSink(out, "q88", nRows) { query =>
      query.processAllAvailable()
    }
      .where(col("event_type") =!= sentinel)
      .select(col("window_start"), col("event_type"), col("n"),
        round(col("total"), 6).as("total"))
      .orderBy("window_start", "event_type")
  }

  /** Streaming exact dedup by content hash within the watermark
    * horizon: first arrival of a hash wins; later copies are dropped.
    * dropDuplicatesWithinWatermark keys state on the hash alone and
    * evicts entries once the watermark passes their horizon, so state
    * is bounded by (lateness × ingest rate) instead of growing with
    * stream history. */
  def dedupStream(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("h", sha2(col("text"), 256))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("h")
      .drop("h") // internal dedup key — output schema mirrors the input

  /** Watermarked stream-stream INTERVAL join — the one Structured
    * Streaming operator family the surface had not yet covered:
    * click→purchase attribution, a purchase joins every click by the
    * same user in the preceding `windowMinutes`. Both sides carry a
    * watermark and the join condition bounds the event-time gap, so
    * each side's state is evictable once the watermark passes its
    * horizon — state is O(lateness+window × ingest rate) per side,
    * never stream history. Inner-join matches emit in the micro-batch
    * that completes the pair (no finalization wait), which is what
    * makes the parity gate exact: with the corpus in batch 0, every
    * pair is found in batch 0 and Append output equals the batch
    * interval join verbatim.
    *
    * 100 TB shape: ONE shuffle per side on user_id (the equality
    * key); the time-range predicate is a post-join filter inside the
    * symmetric hash join's per-key scan, never a cartesian; skewed
    * users bound state by the time window, not their event count. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        windowMinutes: Int,
                        lateness: String = "10 minutes",
                        joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", lateness)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      .withWatermark("p_ts", lateness)
    c.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("c_ts"), col("c_id"),
        col("p_ts"), col("p_value"))
  }

  /** Gate composition (q132): the stream-stream interval join fed
    * through the PRODUCTION readStream entry path — one staged wave,
    * both join sides filtered off the same FileStreamSource frame (a
    * streaming self-join). No sentinel waves: inner-join emission
    * needs no watermark finalization, so batch 0 completes every
    * pair. The sink holds the raw pair rows (the streaming operator's
    * own output); the per-user rollup below is batch arithmetic on
    * the read-back, and the oracle recomputes the identical interval
    * join + rollup in SQL. */
  def clickPurchaseJoinFileFeed(events: DataFrame, windowMinutes: Int,
                                fixtureDir: String): DataFrame = {
    val projected = events.select(col("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"))
    val nRows = projected.count()
    require(nRows > 0L, "events corpus is empty — nothing to join")
    val stream = stageSingleWaveFeed(projected, nRows, fixtureDir, Nil)
    val out = clickPurchaseJoin(
      stream.where(col("event_type") === "click"),
      stream.where(col("event_type") === "purchase"),
      windowMinutes)
    runReplayToFileSink(out, "q132", nRows) { query =>
      query.processAllAvailable()
    }
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("p_value")), 6).as("purchase_total"))
      .orderBy("user_id")
  }

  /** Gate composition (q137): the stream-stream interval join driven
    * through the MANY-wave ingress — the cross-micro-batch pair path
    * q132's single wave cannot reach. With the corpus split over ≥8
    * event-time-ordered waves (one per micro-batch), a click arriving
    * in wave k joins purchases arriving in LATER waves from join
    * state, so this gates what the symmetric hash join exists to do:
    * carry per-key state across micro-batches and complete pairs
    * incrementally.
    *
    * Exactness: no staged row is ever behind the watermark on arrival
    * (the [[stageManyWaveFeed]] [8,4)-minute carve vs the 10-minute
    * lateness budget), and a click may only be evicted once the
    * watermark passes c_ts + window — but any still-unseen matching
    * purchase has p_ts ≤ c_ts + window, and every arriving row is
    * ahead of the watermark, so the purchase must arrive while the
    * click is still in state. Hence Append output == the batch
    * interval join verbatim (q132's oracle), with no sentinel waves:
    * inner-join emission needs no finalization. */
  def clickPurchaseJoinWaves(events: DataFrame, windowMinutes: Int,
                             fixtureDir: String,
                             nWaves: Int = 8): DataFrame = {
    val projected = events.select(col("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"))
    val nRows = projected.count()
    require(nRows > 0L, "events corpus is empty — nothing to join")
    val stream = stageManyWaveFeed(projected, "ts", fixtureDir, nWaves,
      _ => Nil)
    val out = clickPurchaseJoin(
      stream.where(col("event_type") === "click"),
      stream.where(col("event_type") === "purchase"),
      windowMinutes)
    runReplayToFileSink(out, "q137", nRows) { query =>
      query.processAllAvailable()
    }
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("p_value")), 6).as("purchase_total"))
      .orderBy("user_id")
  }

  /** Gate composition (q133): the LEFT OUTER spelling of the
    * stream-stream interval join — the semantics q132's inner join
    * cannot reach. An unmatched click emits its null-extended row only
    * once the watermark proves no future purchase can still match
    * (c_ts + window + lateness has passed), i.e. this gate exercises
    * the WATERMARK-FINALIZATION path of the join's state machine, not
    * just pair completion. Two far-future sentinel waves (a click AND
    * a purchase each, so BOTH sides' event-time maxima — and hence the
    * query's global watermark, their min — advance) push every real
    * click past its horizon: wave 1 advances max event time, wave 2
    * runs with the advanced watermark so the evicted state emits. The
    * sentinel user is the reserved SentinelUser, rejected in the input
    * and excluded from the rollup (the q80 discipline).
    *
    * Oracle: the batch LEFT JOIN with the identical interval
    * condition — exact because batch 0 carries the whole corpus (no
    * late drops) and the sentinels finalize everything, so Append
    * output = matched pairs ∪ null-extended unmatched clicks
    * verbatim. */
  def clickPurchaseLeftJoinFileFeed(events: DataFrame, windowMinutes: Int,
                                    fixtureDir: String): DataFrame = {
    val spark = events.sparkSession
    val projected = events.select(col("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"))
    val nRows = projected.count()
    require(nRows > 0L, "events corpus is empty — nothing to join")
    require(projected.where(col("user_id") === SentinelUser).isEmpty,
      s"events corpus contains reserved replay sentinel user_id $SentinelUser")
    val maxTs =
      projected.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val day = 86400000L
    def sentinelWave(offsetMs: Long): DataFrame = {
      import spark.implicits._
      Seq(
        (-1L, new java.sql.Timestamp(maxTs + offsetMs), SentinelUser,
          "click", 0.0),
        (-2L, new java.sql.Timestamp(maxTs + offsetMs), SentinelUser,
          "purchase", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    }
    val stream = stageSingleWaveFeed(projected, nRows, fixtureDir,
      Seq(sentinelWave(day), sentinelWave(2 * day)))
    val out = clickPurchaseJoin(
      stream.where(col("event_type") === "click"),
      stream.where(col("event_type") === "purchase"),
      windowMinutes, joinType = "leftOuter")
    runReplayToFileSink(out, "q133", nRows) { query =>
      query.processAllAvailable()
    }
      .where(col("user_id") =!= SentinelUser)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        count(col("p_ts")).as("n_matched"),
        round(sum(coalesce(col("p_value"), lit(0.0))), 6)
          .as("purchase_total"))
      .orderBy("user_id")
  }

  /** Streaming ingest admission — the streaming spelling of the batch
    * incremental-dedup gate (Dedup.incrementalDedupSummary, q68): every
    * incoming document is admitted only if its content hash is neither
    * (a) already in the STANDING base corpus, nor (b) seen earlier in
    * the stream within the watermark horizon.
    *
    * Tier (a) is a stream-static LEFT ANTI join against the base's
    * distinct hash projection — the static side is planned per
    * micro-batch, so a base refresh (the nightly compaction that folds
    * admitted docs in) is picked up without restarting the query.
    * Tier (b) is the bounded-state within-stream dedup above. Order
    * matters: the anti join drops base dups BEFORE they enter dedup
    * state, so state is spent only on genuinely-new content. At 100 TB
    * the base hash projection is a 64-byte-row table the join shuffles
    * or broadcasts by its true size; no text crosses either boundary. */
  def admitStream(docs: DataFrame, base: DataFrame,
                  lateness: String = "10 minutes"): DataFrame = {
    val baseH = base.select(sha2(col("text"), 256).as("h")).distinct()
    docs
      .withColumn("h", sha2(col("text"), 256))
      .join(baseH, Seq("h"), "left_anti")
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("h")
      .drop("h")
  }

  /** Gate composition (q90): feed the BATCH documents table through
    * the streaming ingest-admission front door (admitStream) via the
    * PRODUCTION readStream entry path (stageSingleWaveFeed — r14; the
    * r13 spelling collected the corpus to the driver and fed a
    * MemoryStream). Base corpus = docs with doc_id % baseMod == 0 (the
    * q68 incremental-dedup construction); every other document streams
    * in with a synthetic event time (epoch + doc_id seconds —
    * documents carry no timestamp).
    *
    * The gate result is the set of admitted CONTENT HASHES, one row
    * per hash, ordered — deliberately NOT (doc_id, source): when two
    * copies of the same text land in one micro-batch,
    * dropDuplicatesWithinWatermark keeps whichever partition's row is
    * processed first, so the winning doc_id is nondeterministic while
    * the admitted hash SET is exact. The oracle is the batch
    * admission semantics verbatim: distinct stream hashes anti-joined
    * against the base's hashes.
    *
    * The replay lateness spans the whole synthetic time range so
    * within-stream state never evicts mid-replay — the gate checks
    * admission logic, not eviction (eviction-horizon behavior is
    * pinned in StreamingPipelineSpec). Production dials lateness to
    * its real out-of-order budget. */
  def admitStreamFileFeed(docs: DataFrame, baseMod: Long = 10L,
                          fixtureDir: String): DataFrame = {
    val base = docs.where(col("doc_id") % baseMod === 0)
    val statsRow = docs
      .agg(min(col("doc_id")), max(col("doc_id")), count(lit(1))).head()
    require(statsRow.getLong(2) > 0L, "empty documents corpus")
    val spanSec = statsRow.getLong(1) - statsRow.getLong(0) + 10L
    val nRows = statsRow.getLong(2)
    // fixed replay epoch (2023-11-14T22:13:20Z) — determinism across
    // runs; documents carry no timestamp, so the synthetic event time
    // is epoch + doc_id seconds, derived IN the scan (no driver pass)
    val feed = docs.select(col("doc_id"),
      expr("timestamp_millis(1700000000000L + doc_id * 1000L)").as("ts"),
      col("text"))
    // no sentinel waves needed: dropDuplicatesWithinWatermark is a
    // stateful FILTER — first arrivals emit in their own micro-batch,
    // nothing is held back for watermark finalization
    val stream = stageSingleWaveFeed(feed, nRows, fixtureDir, Nil)
    val out = admitStream(stream, base, lateness = s"$spanSec seconds")
    runReplayToFileSink(out, "q90", nRows) { query =>
      query.processAllAvailable()
    }
      .select(sha2(col("text"), 256).as("h"))
      .orderBy("h")
  }

  /** Streaming 13-gram decontamination admission — the PRODUCTION
    * shape of the q141 apply (r15 VERDICT task 5): decontaminate at
    * INGEST, not post-hoc. The eval suite's distinct 13-gram hashes
    * are a STATIC side (in production a benchmark suite — thousands
    * of docs, broadcast-sized; here the corpus stand-in split);
    * every arriving document explodes to (doc_id, ts, shingle-hash)
    * rows, a stateless stream-static LEFT SEMI join keeps only hit
    * rows, and `dropDuplicatesWithinWatermark` on doc_id collapses
    * them to ONE quarantine row per contaminated document, emitted in
    * its arrival micro-batch (a stateful filter — first hit emits
    * immediately, nothing waits for watermark finalization; the
    * watermark only bounds the dedup state).
    *
    * Scale shape: the explode is scan-local (8-byte hashes, never
    * text, into the join); the semi join is stateless with the static
    * side broadcast by size; dedup state holds one 8-byte key per
    * contaminated doc inside the lateness horizon — state tracks
    * contamination volume, not stream history. */
  def deconQuarantineStream(docs: DataFrame, evalHashes: DataFrame,
                            k: Int = 13,
                            lateness: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", lateness)
      .select(col("doc_id"), col("ts"),
        explode(graft.pipeline.TextFunctions
          .shingleHashes(col("text"), k, "dc")).as("g"))
      .join(evalHashes, Seq("g"), "left_semi")
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"))

  /** Gate composition (q147): the TRAIN split of the planted 13-gram
    * corpus (q141's exact split — shared Dedup.deconBase) streams
    * through the production readStream ingress; contaminated docs are
    * quarantined on arrival by [[deconQuarantineStream]]; the gate
    * result is the q141 ship digest computed against the streaming
    * quarantine set — and it shares q141's ORACLE verbatim, pinning
    * ingest-time == post-hoc decontamination on the same corpus.
    * Eval hashes are persisted for the replay (computed once, not
    * per micro-batch) and released in the finally. */
  def deconAdmitStreamFileFeed(docs: DataFrame, fixtureDir: String,
                               k: Int = 13): DataFrame = {
    val base = graft.pipeline.Dedup.deconBase(docs,
      graft.pipeline.Dedup.DeconEvalMod, plantBanner = true)
    val evalHashes = base.where(col("is_eval"))
      .select(explode(graft.pipeline.TextFunctions
        .shingleHashes(col("text"), k, "dc")).as("g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val train = base.where(!col("is_eval"))
      val statsRow = train
        .agg(min(col("doc_id")), max(col("doc_id")), count(lit(1))).head()
      require(statsRow.getLong(2) > 0L, "empty train split")
      val spanSec = statsRow.getLong(1) - statsRow.getLong(0) + 10L
      val nRows = statsRow.getLong(2)
      // fixed replay epoch + doc_id seconds (q90's convention);
      // lateness spans the synthetic range so the gate checks
      // admission logic, not eviction (the spec pins late arrivals)
      val feed = train.select(col("doc_id"),
        expr("timestamp_millis(1700000000000L + doc_id * 1000L)").as("ts"),
        col("text"))
      val stream = stageSingleWaveFeed(feed, nRows, fixtureDir, Nil)
      val out = deconQuarantineStream(stream, evalHashes, k,
        s"$spanSec seconds")
      val quarantined = runReplayToFileSink(out, "q147", nRows) { query =>
        query.processAllAvailable()
      }.select(col("doc_id")).distinct()
      // lazy is safe: the replay (the only evalHashes consumer) has
      // completed; the digest reads train + the sink parquet only
      graft.pipeline.Dedup.deconShipDigest(train, quarantined)
    } finally evalHashes.unpersist(false)
  }

  /** Streaming sub-document copy admission — the q149 winnow-store
    * ADMIT at INGEST TIME (r17 VERDICT task 3), completing the
    * streaming front door exactly as q147 completes q141: whole-doc
    * exact admission streams (q90), 13-gram decontamination streams
    * (q147), and now sub-document COPY admission streams too.
    *
    * Dataflow: every arriving document fingerprints IN THE SCAN
    * ([[graft.pipeline.Winnow.winnowFpStructs]] — winnowing is
    * per-doc local, so the batch tier's window-by-doc_id is an
    * implementation convenience a streaming scan simply doesn't
    * need); its distinct fingerprint hashes explode into a STATELESS
    * stream-static join against the store's df-bounded per-fingerprint
    * doc lists (`basePerFp` — the same [[graft.pipeline.Winnow
    * .storeDocLists]] frame the batch probe joins, built once by the
    * caller and re-planned per micro-batch, so a nightly store
    * refresh is picked up without restarting the query); the
    * ≤ maxDf-element holder lists ride the shuffle UN-exploded and
    * the per-base counting folds into the state update (identical
    * increments; measured hit volume is small — 18.6k rows over 2.0k
    * docs at sf1 — so this is shuffle hygiene, not the wall: the
    * gate's wall was the staged feed's SCAN parallelism, see the
    * minFiles note at stageSingleWaveFeed — 52 → 6 s at sf1 warm,
    * identical flag set). The only STATE is the
    * per-doc threshold counter: flatMapGroupsWithState keyed by
    * doc_id accumulates shared-fingerprint counts per base doc and
    * emits the quarantine row THE MOMENT some base doc's count
    * reaches minShared (an emitted latch prevents re-emission if
    * late evidence arrives), holding each doc's counters only until
    * the event-time timeout at ts + lateness — state tracks the
    * in-flight lateness horizon, never stream history.
    *
    * Scale shape: fingerprints, not text, cross the join (16-byte
    * rows); the static side is df-bounded so a boilerplate
    * fingerprint in the store fans out to at most maxDf holders; a
    * clean document (the overwhelming majority at ingest) joins
    * nothing, reaches the stateful operator nowhere, and costs zero
    * state. Flag set == the batch probe's by construction: same
    * distinct (doc, fp_hash) pairs, same store lists, and the
    * per-(doc, base) row count here IS winnowStorePairs' n_shared. */
  def winnowProbeStream(docs: DataFrame, basePerFp: DataFrame,
                        k: Int, w: Int, minShared: Long,
                        lateness: String,
                        latenessMs: Long): Dataset[QuarantinedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def update(doc: Long, incoming: Iterator[WinnowHit],
               state: GroupState[WinnowProbeState])
        : Iterator[QuarantinedDoc] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val prior = state.getOption
          .getOrElse(WinnowProbeState(Map.empty, emitted = false))
        var counts = prior.counts
        var maxTsMs = 0L
        incoming.foreach { h =>
          h.ds.foreach { b =>
            counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
          }
          maxTsMs = math.max(maxTsMs, h.ts.getTime)
        }
        val hit = !prior.emitted && counts.valuesIterator.exists(_ >= minShared)
        state.update(WinnowProbeState(counts, prior.emitted || hit))
        state.setTimeoutTimestamp(math.max(maxTsMs + latenessMs,
          state.getCurrentWatermarkMs() + 1))
        if (hit) Iterator(QuarantinedDoc(doc)) else Iterator.empty
      }
    }
    docs
      .withWatermark("ts", lateness)
      .select(col("doc_id"), col("ts"),
        explode(array_distinct(transform(
          graft.pipeline.Winnow.winnowFpStructs(col("text"), k, w),
          s => s.getField("fp_hash")))).as("fp_hash"))
      .join(basePerFp, Seq("fp_hash"))
      .select(col("doc_id"), col("ts"), col("ds"))
      .as[WinnowHit]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Gate composition (q158): the q149 corpus split and store, the
    * delta streamed through the PRODUCTION readStream ingress,
    * quarantine decisions from [[winnowProbeStream]], and the digest
    * computed by the SAME [[graft.pipeline.Winnow.admitDigest]] the
    * batch gate uses — so q158 shares q149's ORACLE verbatim, pinning
    * ingest-time == batch sub-document copy admission on the same
    * corpus and ONE shared persisted store. The static probe side is
    * persisted for the replay (computed once, not per micro-batch)
    * and released in the finally; replay lateness spans the synthetic
    * time range so the gate checks admission logic, not eviction
    * (multi-wave arrival and the single-emission latch are pinned in
    * StreamingPipelineSpec). */
  def winnowAdmitStreamFileFeed(docs: DataFrame, deltaMod: Long,
                                table: String, path: String,
                                fixtureDir: String): DataFrame = {
    import graft.pipeline.{Dedup, Winnow}
    val (base, delta) = Dedup.deltaSplit(docs, deltaMod)
    Winnow.ensureWinnowStore(base, table, path,
      Winnow.WinnowK, Winnow.WinnowW)
    val basePerFp = Winnow.storeDocLists(docs.sparkSession, table,
        Winnow.WinnowMaxDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val statsRow = delta
        .agg(min(col("doc_id")), max(col("doc_id")), count(lit(1))).head()
      require(statsRow.getLong(2) > 0L, "empty delta split")
      val spanSec = statsRow.getLong(1) - statsRow.getLong(0) + 10L
      val nRows = statsRow.getLong(2)
      // fixed replay epoch + doc_id seconds (q90's convention)
      val feed = delta.select(col("doc_id"),
        expr("timestamp_millis(1700000000000L + doc_id * 1000L)").as("ts"),
        col("text"))
      // fat text rows + the per-doc winnow fingerprint fold: stage at
      // full width so the stream scan parallelizes (see the minFiles
      // note at stageSingleWaveFeed)
      val stream = stageSingleWaveFeed(feed, nRows, fixtureDir, Nil,
        minFiles = 32)
      val out = winnowProbeStream(stream, basePerFp,
        Winnow.WinnowK, Winnow.WinnowW, Winnow.WinnowMinShared,
        s"$spanSec seconds", spanSec * 1000L)
      val quarantined = runReplayToFileSink(out.toDF(), "q158", nRows) {
        query => query.processAllAvailable()
      }.select(col("doc_id")).distinct()
      Winnow.admitDigest(delta, quarantined)
    } finally {
      basePerFp.unpersist(false)
      ()
    }
  }

  /** Gate composition (q105): feed the batch documents table through
    * the PURE within-stream dedup (dedupStream — q90's admission gate
    * covers the composed anti-join + dedup path; this isolates the
    * bounded-state dedup operator itself) via the PRODUCTION
    * readStream entry path (stageSingleWaveFeed — r14; the r13
    * spelling collected the corpus to the driver and fed a
    * MemoryStream). Same hash-SET output contract (the winning doc_id
    * among same-batch copies is partition-order dependent; the kept
    * hash set is exact); oracle = the distinct content hashes of the
    * corpus, verbatim. */
  def dedupStreamFileFeed(docs: DataFrame, fixtureDir: String): DataFrame = {
    val statsRow = docs
      .agg(min(col("doc_id")), max(col("doc_id")), count(lit(1))).head()
    require(statsRow.getLong(2) > 0L, "empty documents corpus")
    val spanSec = statsRow.getLong(1) - statsRow.getLong(0) + 10L
    val nRows = statsRow.getLong(2)
    // fixed replay epoch (2023-11-14T22:13:20Z) — run determinism
    val feed = docs.select(col("doc_id"),
      expr("timestamp_millis(1700000000000L + doc_id * 1000L)").as("ts"),
      col("text"))
    val stream = stageSingleWaveFeed(feed, nRows, fixtureDir, Nil)
    val out = dedupStream(stream, lateness = s"$spanSec seconds")
    runReplayToFileSink(out, "q105", nRows) { query =>
      query.processAllAvailable()
    }
      .select(sha2(col("text"), 256).as("h"))
      .orderBy("h")
  }

  /** STREAMING ingest into the BM25 inverted-index store (q186) — the
    * retrieval tier's streaming member, completing the pattern the
    * winnow tier set (q149 batch admission → q158 streaming
    * admission): documents arrive through the production
    * FileStreamSource ingress in multiple micro-batches, and each
    * batch folds into the standing index via foreachBatch →
    * [[graft.pipeline.Retrieval.appendBm25Store]]. The append's
    * doc-id-manifest anti-join is what makes this sink EXACTLY-ONCE
    * under Structured Streaming's at-least-once foreachBatch
    * contract: a replayed micro-batch (failure/restart) anti-joins to
    * nothing and appends nothing — no output-side transaction needed.
    * After the replay drains, the probe answers from the store alone;
    * the gate shares q174's oracle verbatim (ingest-time == batch).
    *
    * Scale shape: per-batch cost is ingest-batch-sized (tokenize +
    * bucketed insertInto + two 1-row/narrow sidecar updates); the
    * standing index never rewrites. The staged feed re-reads with
    * maxFilesPerTrigger < staged files so the run genuinely exercises
    * MULTIPLE appends, not one bulk build. */
  def bm25StreamIngest(docs: DataFrame, table: String, path: String,
                       fixtureDir: String): DataFrame = {
    import graft.pipeline.Retrieval
    val spark = docs.sparkSession
    val nRows = docs.count()
    require(nRows > 0L, "empty documents corpus")
    val feed = docs.select(col("doc_id"),
      expr("timestamp_millis(1700000000000L + doc_id * 1000L)").as("ts"),
      col("source"), col("text"))
    // stage at full width (32 files — the q158 lesson: staged file
    // count floors the stream scan parallelism, and these are FAT text
    // rows paying a per-row tokenize in each append), then re-read 8
    // files per trigger → 4 genuine micro-batch appends, each batch
    // tokenizing at 8-way parallelism (the staging helper's own
    // reader binds maxFilesPerTrigger to the full wave; ingest wants
    // many batches)
    stageSingleWaveFeed(feed, nRows, fixtureDir, Nil, minFiles = 32)
    val srcDir = new java.io.File(new java.io.File(fixtureDir), "in")
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 8).parquet(srcDir.toString)
    // initialize an EMPTY store so the first append has a manifest +
    // stats sidecar to fold into
    Retrieval.buildBm25Store(docs.limit(0), table, path)
    val ckpt = new java.io.File(new java.io.File(fixtureDir), "ckpt").toString
    val query = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        Retrieval.appendBm25Store(
          batch.select(col("doc_id"), col("source"), col("text")),
          table, path)
      }
      .start()
    try query.processAllAvailable() finally {
      dumpProgress("q186", query); query.stop()
    }
    Retrieval.bm25ProbeStore(spark, table, path)
  }

  /** STREAMING retrieval — the query-side twin of [[bm25StreamIngest]]
    * (q191): queries arrive as a stream through the production
    * FileStreamSource ingress and each micro-batch is answered from
    * the PERSISTED term-bucketed index (q180's store, built once per
    * corpus) — never a corpus scan. Per batch: the arriving query rows
    * are collected to the driver (queries are CONTROL PLANE — a
    * retrieval endpoint's batch is bounded by arrival rate, never by
    * corpus size; the collect is O(queries), the scoring stays fully
    * distributed), scored via [[Retrieval.bm25BatchProbeStore]]
    * (bucket-pruned postings + the 1-row stats sidecar), and the
    * top-k lands in a per-batch result directory keyed by batchId —
    * mode("overwrite") makes foreachBatch's at-least-once contract
    * idempotent (a replayed batch rewrites the same directory, the
    * q186 exactly-once stance in sink form).
    *
    * The staged feed delivers one query per micro-batch (three genuine
    * stream-static probe rounds at the gate), and the assembled answer
    * set equals [[Retrieval.bm25BatchTopK]] by construction (shared
    * scoring tail over the same postings) — q182's oracle verbatim. */
  def bm25QueryStream(docs: DataFrame, table: String, path: String,
                      fixtureDir: String): DataFrame = {
    import graft.pipeline.Retrieval
    val spark = docs.sparkSession
    import spark.implicits._
    Retrieval.ensureBm25Store(docs, table, path)
    val queries = Retrieval.Bm25BatchQueries
    val feed = queries.toDF("query_id", "query")
      .select(col("query_id"),
        expr("timestamp_millis(1700000000000L + query_id * 1000L)").as("ts"),
        col("query"))
    stageSingleWaveFeed(feed, queries.size.toLong, fixtureDir, Nil,
      minFiles = queries.size)
    val srcDir = new java.io.File(new java.io.File(fixtureDir), "in")
    val outDir = new java.io.File(new java.io.File(fixtureDir), "out")
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    val ckpt = new java.io.File(new java.io.File(fixtureDir), "ckpt").toString
    val query = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val qs = batch.select(col("query_id"), col("query")).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
        if (qs.nonEmpty)
          Retrieval.bm25BatchProbeStore(spark, table, path, qs)
            .write.mode("overwrite")
            .parquet(new java.io.File(outDir, s"batch_$id").toString)
      }
      .start()
    try query.processAllAvailable() finally {
      dumpProgress("q191", query); query.stop()
    }
    spark.read.parquet(readBatchDirs(outDir, "bm25QueryStream"): _*)
      .orderBy("query_id", "rank")
  }

  /** Explicit per-batch result dirs, not a glob: a glob over zero
    * matches dies inside DataFrameReader with a bare
    * FileNotFoundException, while an empty listing here is the REAL
    * condition worth naming (the stream processed no batches). */
  private def readBatchDirs(outDir: java.io.File,
                            what: String): Seq[String] = {
    // numeric batch order (batch_2 before batch_10) — lexicographic
    // order was harmless only because every caller re-sorts the
    // unioned result (ADVICE r18)
    val dirs = Option(outDir.listFiles()).map(_.toSeq)
      .getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      .sortBy(_.getName.stripPrefix("batch_").toLong)
      .map(_.toString)
    require(dirs.nonEmpty,
      s"$what: no batches were processed (out=$outDir)")
    dirs
  }

  /** STREAMING semantic admission (q194) — the third member of the
    * ingest-admission triptych (q147 quarantines verbatim 13-gram
    * contamination at arrival, q158 sub-document copies; this catches
    * PARAPHRASE-level contamination sharing no n-gram): train vectors
    * arrive through the production FileStreamSource ingress and each
    * micro-batch sign-buckets its vectors and probes the STATIC eval
    * set bucket-equi-join-wise — admit when no eval vector sits at
    * cos ≥ threshold. Admitted rows land in batchId-keyed dirs
    * (mode(overwrite) ⇒ replay-idempotent, the q191 sink stance).
    *
    * The decision rule is [[Similarity.semanticDecontamination]]'s
    * with the bucket cap quiescent — the adaptive width rule keeps
    * expected bucket size an order of magnitude under the cap at any
    * corpus size, the same contract the q29 oracle ships — so the
    * admitted set equals the batch tier's kept set and q194 shares
    * q192's oracle verbatim (pinned in StreamingPipelineSpec).
    *
    * Scale shape: in production the eval suite is benchmark-sized —
    * the bucket equi-join broadcasts it and arriving batches never
    * shuffle; here the stand-in eval is corpus/evalMod and the join
    * degrades gracefully to a hash join on the bucket key. Per-batch
    * cost is O(batch · bucket-collision cosines), never all-pairs. */
  def semanticAdmitStream(embeddings: DataFrame, fixtureDir: String,
      threshold: Double = graft.pipeline.Similarity.SemDeconThreshold,
      evalMod: Long = graft.pipeline.Similarity.SemDeconEvalMod,
      targetPerBucket: Long = 125L): DataFrame = {
    import graft.pipeline.{Similarity, TextFunctions}
    val spark = embeddings.sparkSession
    val nBits = Similarity.oracleSizedNBits(
      math.max(embeddings.count(), 1L), targetPerBucket)
    val evalOf = (c: Column) => Similarity.semEvalFlag(c, evalMod)
    // the shared-oracle contract REQUIRES the batch tier's bucket cap
    // to be quiescent (the stream probes all bucket collisions; the
    // batch pair index degrades to star pairs past maxBucket). The
    // adaptive width rule keeps expected population ~targetPerBucket,
    // an order of magnitude under the cap — enforce it loudly instead
    // of diverging silently on a pathologically skewed corpus.
    // Session-memoized per (corpus, nBits) — the SessionCache keying
    // discipline of the pair index — so repeated invocations don't pay
    // a dedicated full-corpus histogram pass each time (ADVICE r18).
    val maxBucketPop = graft.SessionCache.getOrBuild(spark,
      ("StreamingPipeline.semAdmitMaxBucketPop", embeddings.semanticHash(),
        graft.SessionCache.lineageFingerprint(embeddings), nBits)) {
      java.lang.Long.valueOf(Similarity.withVectorCols(embeddings, nBits)
        .groupBy(col("bucket")).count()
        .agg(max(col("count"))).head().getLong(0))
    }.longValue()
    require(maxBucketPop <= graft.pipeline.Dedup.DefaultMaxBucket,
      s"semanticAdmitStream: bucket population $maxBucketPop exceeds " +
        s"the batch tier's cap ${graft.pipeline.Dedup.DefaultMaxBucket} — " +
        "streamed admission would diverge from the capped batch/oracle " +
        "semantics on this corpus")
    // static side, frozen: the eval vectors with bucket/ed/norm.
    // createDataFrame-from-rdd after the checkpoint is LOAD-BEARING:
    // localCheckpoint keeps the ORIGIN plan's constraints, which still
    // reference the pruned-away embedding attribute — join this frame
    // on `bucket` and InferFiltersFromConstraints pushes a filter with
    // that dangling attribute into the probe side (executor-side
    // ATTRIBUTE_NOT_FOUND). Rebuilding from the checkpointed RDD drops
    // the origin constraints; the data is already materialized.
    val evalCk = Similarity
      .withVectorCols(embeddings.where(evalOf(col("vec_id"))), nBits)
      .select(col("bucket"), col("ed").as("e_ed"), col("norm").as("e_norm"))
      .localCheckpoint(true)
    val evalSide = spark.createDataFrame(evalCk.rdd, evalCk.schema)
    val train = embeddings.where(!evalOf(col("vec_id")))
      .select(col("vec_id"), col("label"),
        (TextFunctions.hash64(col("vec_id").cast("string"), "sd")
          % 1000000000L).as("vh"))
    val feed = embeddings.where(!evalOf(col("vec_id")))
      .select(col("vec_id"),
        expr("timestamp_millis(1700000000000L + vec_id * 1000L)").as("ts"),
        col("embedding"), col("label"))
    val nTrain = feed.count()
    require(nTrain > 0L, "semanticAdmitStream: empty train side")
    stageSingleWaveFeed(feed, nTrain, fixtureDir, Nil, minFiles = 8)
    val srcDir = new java.io.File(new java.io.File(fixtureDir), "in")
    val outDir = new java.io.File(new java.io.File(fixtureDir), "out")
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 2).parquet(srcDir.toString)
    val ckpt = new java.io.File(new java.io.File(fixtureDir), "ckpt").toString
    val query = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val bv = Similarity.withVectorCols(
          batch.select(col("vec_id"), col("embedding"), col("label")), nBits)
        val flagged = bv.join(evalSide, Seq("bucket"))
          .where(round(Similarity.pairCosine(col("ed"), col("e_ed"),
            col("norm"), col("e_norm")), 6) >= threshold)
          .select(col("vec_id")).distinct()
        bv.join(flagged, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("label"),
            (TextFunctions.hash64(col("vec_id").cast("string"), "sd")
              % 1000000000L).as("vh"))
          .write.mode("overwrite")
          .parquet(new java.io.File(outDir, s"batch_$id").toString)
      }
      .start()
    try query.processAllAvailable() finally {
      dumpProgress("q194", query); query.stop()
    }
    val admitted = spark.read.parquet(
      readBatchDirs(outDir, "semanticAdmitStream"): _*)
    train.groupBy(col("label")).agg(count(lit(1)).as("n_train"))
      .join(admitted.groupBy(col("label")).agg(count(lit(1)).as("n_kept"),
        sum(col("vh")).as("kept_hash_sum")), Seq("label"), "left")
      .na.fill(0L, Seq("n_kept", "kept_hash_sum"))
      .select(col("label"), col("n_train"),
        (col("n_train") - col("n_kept")).as("n_contaminated"),
        col("n_kept"), col("kept_hash_sum"))
      .orderBy("label")
  }
}
