package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** The persisted form of every "index" in this engine: a table written
  * `partitionBy(<cell column>)` so a probe becomes PARTITION PRUNING —
  * the directory layout IS the inverted file.
  *
  * SCALE.md asserts this shape for the ANN tiers ("persist the assigned
  * table partitionBy(cell), a probe prunes to nProbe partitions") and
  * the LSH tier ("persist the base band table bucketed by (band,
  * bkey)"); this module makes the claim executable instead of prose:
  *
  *  - `writeByCell` materializes (cell, payload…) partitioned by cell —
  *    at 100 TB this is the one-off index-build job, append-able per
  *    ingest batch.
  *  - `probeCells` reads back ONLY the probed cells: the filter is on
  *    the partition column, so Catalyst's partition pruning turns it
  *    into a directory listing of |cells| subtrees — no other file is
  *    opened, verified by PartitionedStoreSpec against `inputFiles`.
  *
  * Works for any cell derivation (sign bucket, k-means cell, LSH band
  * key, date) — the store is deliberately schema-agnostic: it persists
  * whatever frame it is given and prunes on the one column contract.
  */
object PartitionedStore {

  /** Write `df` partitioned by `cellCol` (one directory per cell value).
    * Overwrites; at scale the same call with `Append` mode is the
    * per-batch index maintenance job. */
  def writeByCell(df: DataFrame, dir: String, cellCol: String): Unit =
    df.write.mode("overwrite").partitionBy(cellCol).parquet(dir)

  /** Read the store with the cell column pinned to STRING — the raw
    * directory token. Spark's partition-value type inference would
    * otherwise coerce numeric-looking tokens (a sign-bucket bitstring
    * "0101" becomes the integer 101 — leading zeros GONE, and two
    * distinct cells can collide). The cell is an index key, not data:
    * it reads back exactly as written; cast at the call site when the
    * cell is genuinely numeric. */
  def readAll(spark: SparkSession, dir: String, cellCol: String): DataFrame = {
    val discovered = spark.read.parquet(dir).schema
    val pinned = StructType(discovered.map(f =>
      if (f.name == cellCol) f.copy(dataType = StringType) else f))
    spark.read.schema(pinned).parquet(dir)
  }

  /** Read back only the given cells (compared as directory tokens —
    * see readAll). The `isin` filter sits on the partition column, so
    * the scan lists only the matching subdirectories — partition
    * pruning, not a full-table scan with a post-filter. */
  def probeCells(spark: SparkSession, dir: String, cellCol: String,
                 cells: Seq[String]): DataFrame =
    readAll(spark, dir, cellCol)
      .where(col(cellCol).isin(cells: _*))
}
