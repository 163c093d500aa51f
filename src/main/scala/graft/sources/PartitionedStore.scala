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

  /** Root-level version marker: written with a fresh UUID after every
    * writeByCell, read (36 bytes) by readAll as its schema-memo key.
    * A root MTIME key would go stale when an overwrite lands within
    * the filesystem's timestamp granularity (1 s on many mounts) of
    * the previous write — the marker is content-addressed, so every
    * rewrite invalidates regardless of clock resolution (ADVICE r8). */
  private val VersionMarker = "_graft_store_version"

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Write `df` partitioned by `cellCol` (one directory per cell value).
    * Overwrites; at scale the same call with `Append` mode is the
    * per-batch index maintenance job. Stamps the version marker LAST,
    * so a concurrent reader memoizes either the old or the new version
    * key — never the new key with the old schema. */
  def writeByCell(df: DataFrame, dir: String, cellCol: String): Unit = {
    df.write.mode("overwrite").partitionBy(cellCol).parquet(dir)
    val (hfs, p) = fs(df.sparkSession, dir)
    val out = hfs.create(new org.apache.hadoop.fs.Path(p, VersionMarker), true)
    try out.write(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the store with the cell column pinned to STRING — the raw
    * directory token. Spark's partition-value type inference would
    * otherwise coerce numeric-looking tokens (a sign-bucket bitstring
    * "0101" becomes the integer 101 — leading zeros GONE, and two
    * distinct cells can collide). The cell is an index key, not data:
    * it reads back exactly as written; cast at the call site when the
    * cell is genuinely numeric.
    *
    * Schema handling: a caller that already knows the data schema
    * (e.g. captured at index-build time) passes it and the read plans
    * with ZERO discovery work; otherwise discovery — a full partition-
    * directory listing + footer read — runs ONCE per (session, dir)
    * and is memoized, so a serving path probing a store with thousands
    * of cell directories doesn't pay a throwaway listing per query
    * (ADVICE r7). The memo key carries the store's VERSION MARKER
    * content (one 36-byte read per probe, not a listing; falls back
    * to root mtime for stores written outside writeByCell), so an
    * in-place rewrite re-discovers even within the filesystem's
    * timestamp granularity. LIMIT: appending files with an EVOLVED
    * schema into an existing cell directory does not rewrite the
    * marker — a writer doing schema evolution via in-cell appends
    * must pass the new schema explicitly (same-schema appends, the
    * normal index-maintenance path, are unaffected: the memoized
    * schema stays correct). */
  def readAll(spark: SparkSession, dir: String, cellCol: String,
              schema: Option[StructType] = None): DataFrame = {
    def version: String =
      try {
        val (hfs, p) = fs(spark, dir)
        val mp = new org.apache.hadoop.fs.Path(p, VersionMarker)
        if (hfs.exists(mp)) {
          val in = hfs.open(mp)
          try {
            val buf = new Array[Byte](64)
            val n = in.read(buf)
            new String(buf, 0, math.max(n, 0), "UTF-8")
          } finally in.close()
        } else "mtime:" + hfs.getFileStatus(p).getModificationTime
      } catch { case _: java.io.IOException => "unversioned" }
    val discovered = schema.getOrElse(
      graft.SessionCache.getOrBuild(spark,
          ("PartitionedStore.schema", dir, version)) {
        spark.read.parquet(dir).schema
      })
    val pinned = StructType(discovered.map(f =>
      if (f.name == cellCol) f.copy(dataType = StringType) else f))
    spark.read.schema(pinned).parquet(dir)
  }

  /** Read back only the given cells (compared as directory tokens —
    * see readAll). The `isin` filter sits on the partition column, so
    * the scan lists only the matching subdirectories — partition
    * pruning, not a full-table scan with a post-filter. */
  def probeCells(spark: SparkSession, dir: String, cellCol: String,
                 cells: Seq[String],
                 schema: Option[StructType] = None): DataFrame =
    readAll(spark, dir, cellCol, schema)
      .where(col(cellCol).isin(cells: _*))
}
