package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver test corpus (TESTDATA.md): TPC-H-ish parquet tables at
  * /root/testdata/sf{0.001,0.01,0.1}. Plain `spark.read.parquet` so
  * Catalyst pushes filters/projections into the scan.
  *
  * `events.parquet` has shipped with TWO physical `ts` encodings across
  * driver corpus generations, so the read is SCHEMA-ADAPTIVE:
  *  - INT64 TIMESTAMP(NANOS), which Spark 4 refuses to read as a
  *    timestamp (PARQUET_TYPE_ILLEGAL): read with
  *    `spark.sql.legacy.parquet.nanosAsLong` (ts arrives as a nanos
  *    LongType) and convert via integral `div 1000` → `timestamp_micros`.
  *    Integral division matters: a double-typed divide of ~1.7e18 nanos
  *    exceeds the 53-bit mantissa and silently corrupts timestamps.
  *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
  *    TIMESTAMP_NTZ: cast to the session type. The session timezone is
  *    pinned UTC everywhere (builder configs + oracle), so the cast is
  *    instant-preserving and downstream operators keep seeing the same
  *    TimestampType they always did.
  */
object Corpus {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case org.apache.spark.sql.types.TimestampNTZType =>
          // TIMESTAMP(MICROS, isAdjustedToUTC=false); session tz is
          // pinned UTC so the cast is instant-preserving.
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case other =>
          // The corpus is driver-regenerated between rounds; an
          // unrecognized ts encoding must fail HERE, loudly, not be
          // coerced to nulls by a blanket cast (ADVICE r11).
          throw new IllegalStateException(
            s"events.ts has unexpected physical type $other — " +
              "the driver regenerated the corpus with a new encoding; " +
              "extend Corpus.table deliberately")
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Decouple CPU-bound per-row work from IO-sized scan parallelism.
    *
    * A parquet scan's task count is its SPLIT count; a small file (or a
    * single row group) scans as ONE task, and any expensive per-row
    * pipeline stacked on it — shingling, hashing, feature extraction —
    * serializes on one core no matter how many the cluster has. (A
    * stalled-bench jstack showed exactly this: one task, 95+ s of CPU,
    * 31 idle cores.) This helper repartitions to the session's default
    * parallelism ONLY when the scan is under-split; at 100 TB a table
    * has more splits than the cluster has cores and the repartition
    * (and its shuffle) vanishes.
    *
    * The probe replicates Spark's own FilePartition packing arithmetic
    * over `inputFiles` + file sizes (listing metadata the scan relation
    * already holds; sizes are one FileSystem.getFileStatus each) — NOT
    * `df.rdd.getNumPartitions`, which would force full physical
    * planning + RDD conversion on the driver at plan-construction time
    * for every operator invocation (and decide pre-AQE), and NOT bare
    * file count, which is wrong in both directions: one large file
    * SPLITS into many partitions (a count-only probe would insert a
    * redundant full-corpus shuffle), and many tiny files BIN-PACK into
    * few partitions (a count-only probe would skip the fan-out exactly
    * when it's needed). Estimated packed partitions =
    * ceil(Σ(size+openCost) / maxSplitBytes) with maxSplitBytes =
    * min(maxPartitionBytes, max(openCost, Σ/parallelism)) — the formula
    * in Spark's FilePartition.maxSplitBytes. Past `StatFileBound` files
    * the probe skips stat-ing and leaves the frame alone: that many
    * files either pack to ≥cores partitions or the corpus is so small
    * the fan-out wouldn't matter. A frame with no file lineage
    * (in-memory test data) reports no files and is left alone — local
    * relations already carry defaultParallelism partitions.
    *
    * Stats are memoized per (session, path) via SessionCache, so the
    * several operators that probe the same table per query pay one
    * FileSystem.getFileStatus per file per session — on an object
    * store the repeat probes would otherwise add real driver latency.
    * A file that vanishes between listing and stat (or any FS error)
    * degrades to the count-only heuristic instead of throwing at
    * plan-construction time: count-only is wrong in both directions
    * (see above) but only costs a redundant-or-missing fan-out, never
    * a failed query (ADVICE r6). */
  private val StatFileBound = 4096

  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= StatFileBound) return df
    def bytesConf(key: String, default: Long): Long =
      spark.conf.getOption(key)
        .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
        .getOrElse(default)
    val openCost = bytesConf("spark.sql.files.openCostInBytes", 4L * 1024 * 1024)
    val maxPart = bytesConf("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
    val sizes = files.map(f => graft.SessionCache.fileStat(spark, f).map(_._1))
    if (sizes.exists(_.isEmpty))
      return if (files.length < target) df.repartition(target) else df
    val totalPadded = sizes.map(_.get + openCost).sum
    val maxSplit = math.min(maxPart, math.max(openCost, totalPadded / math.max(1, target)))
    val estPartitions = math.ceil(totalPadded.toDouble / maxSplit).toLong
    if (estPartitions < target) df.repartition(target) else df
  }

  /** Register all corpus tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))
}
