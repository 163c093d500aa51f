package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver test corpus (TESTDATA.md): TPC-H-ish parquet tables at
  * /root/testdata/sf{0.001,0.01,0.1}. Plain `spark.read.parquet` so
  * Catalyst pushes filters/projections into the scan. */
object Corpus {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all corpus tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))
}
