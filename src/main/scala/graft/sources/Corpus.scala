package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver test corpus (TESTDATA.md): TPC-H-ish parquet tables at
  * /root/testdata/sf{0.001,0.01,0.1}. Plain `spark.read.parquet` so
  * Catalyst pushes filters/projections into the scan.
  *
  * `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark 4
  * refuses to read as a timestamp (PARQUET_TYPE_ILLEGAL). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong` (ts arrives as a nanos LongType)
  * and convert via integral `div 1000` → `timestamp_micros`. Integral
  * division matters: a double-typed divide of ~1.7e18 nanos exceeds the
  * 53-bit mantissa and silently corrupts timestamps.
  */
object Corpus {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
    * The probe is `inputFiles` — file-listing metadata the scan relation
    * already holds — NOT `df.rdd.getNumPartitions`, which would force
    * full physical planning + RDD conversion on the driver at
    * plan-construction time for every operator invocation (and decide
    * pre-AQE). Files here are small (≤ one 128 MB split each), so
    * file count lower-bounds split count; at scale file count exceeds
    * core count long before per-file splitting matters. A frame with no
    * file lineage (in-memory test data) reports no files and is left
    * alone — local relations already carry defaultParallelism
    * partitions. */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val nFiles = df.inputFiles.length
    if (nFiles > 0 && nFiles < target) df.repartition(target) else df
  }

  /** Register all corpus tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))
}
