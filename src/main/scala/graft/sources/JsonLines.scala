package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL source/sink — the interchange format raw training corpora
  * actually arrive in (one JSON object per line; crawls, API exports,
  * and annotation tools all speak it).
  *
  * The read contract is EXPLICIT SCHEMA, never inference: at 100 TB
  * `inferSchema` is a full extra pass over the data before the real
  * one, and a schema "discovered" from dirty data drifts batch-to-batch
  * (one line with a stringified number retypes the column). Schema is
  * config, not data. Malformed lines follow Spark's PERMISSIVE mode
  * with an explicit corrupt-record column, so dirty input is COUNTABLE
  * (the ingest health metric) instead of silently dropped or fatally
  * throwing mid-job — pass the column name and keep it, or filter it
  * out after auditing.
  *
  * Scale shape: JSONL is line-splittable, so the scan parallelizes like
  * any text source (uncompressed or with a splittable codec; gzip'd
  * JSONL scans one task per FILE — re-chunk upstream). Writing goes
  * through the same partitioned layout as every other sink here. */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with the given schema; malformed lines land in
    * `_corrupt_record` (added to the schema) instead of killing the
    * job or vanishing. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Ingest-health summary: rows parsed clean vs corrupt — the metric a
    * pipeline alerts on before any downstream stage runs. The aggregate
    * also references one DATA column: Spark refuses JSON scans whose
    * referenced columns are ONLY the internal corrupt-record column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
    * can't know a line is corrupt without parsing something); touching
    * a real column keeps the single-pass count legal without caching
    * the frame (Spark's documented alternative — a non-starter at
    * corpus scale). */
  def healthSummary(df: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val dataCol = df.columns.find(_ != CorruptCol).getOrElse(
      throw new IllegalArgumentException("frame has only the corrupt column"))
    val r = df.agg(
      count(lit(1)),
      count(col(CorruptCol)),
      count(col(dataCol))).head()
    (r.getLong(0) - r.getLong(1), r.getLong(1))
  }

  /** healthSummary as a one-row DataFrame — the gate/report shape.
    * Same single-pass contract, but the data-column reference that
    * keeps the scan legal must live INSIDE a surviving output
    * expression: a hidden helper aggregate would be pruned by the
    * optimizer (its output is unused), resurrecting the corrupt-
    * column-only error. So n_clean counts rows where the corrupt
    * column is null, via a coalesce over the data column — never-null
    * when the branch fires (a clean line with a null data field still
    * counts), and un-prunable because the result depends on it. */
  def healthSummaryDf(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataCol = df.columns.find(_ != CorruptCol).getOrElse(
      throw new IllegalArgumentException("frame has only the corrupt column"))
    df.agg(
      count(when(col(CorruptCol).isNull,
        coalesce(col(dataCol).cast("string"), lit("")))).as("n_clean"),
      count(col(CorruptCol)).as("n_corrupt"))
  }

  /** Gate composition (q77): serialize documents with doc_id < maxId
    * as JSONL — lines where doc_id % corruptMod == 0 deliberately
    * truncated mid-object — write to `dir`, read back through the
    * explicit-schema PERMISSIVE contract, and report clean/corrupt
    * counts. End-to-end through a real write+read+parse, so the oracle
    * (which recomputes the planted split from the source table) checks
    * that dirty input is COUNTED, neither dropped nor fatal. */
  def healthReport(docs: DataFrame, dir: String,
                   maxId: Long, corruptMod: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    docs.where(col("doc_id") < maxId)
      .select(when(col("doc_id") % corruptMod === 0,
          // unterminated string + object: unambiguously malformed JSON
          concat(lit("{\"doc_id\": "), col("doc_id"), lit(", \"source\": \"trunca")))
        .otherwise(to_json(struct(col("doc_id"), col("source"))))
        .as("value"))
      .write.mode("overwrite").text(dir)
    val schema = new StructType()
      .add("doc_id", "long").add("source", "string")
    healthSummaryDf(read(spark, dir, schema))
  }

  /** Write a frame as JSONL (drops a corrupt-record column if present —
    * quarantine it separately, don't re-emit it as data). */
  def write(df: DataFrame, path: String): Unit = {
    val clean =
      if (df.columns.contains(CorruptCol)) df.drop(CorruptCol) else df
    clean.write.mode("overwrite").json(path)
  }

  /** The two compressed-ingest codecs the gate certifies, with their
    * scale contracts. Raw corpora land compressed at 100 TB — crawl
    * shards arrive as `.jsonl.gz` — and the codec choice IS a
    * partitioning decision:
    *  - gzip: ubiquitous but NOT splittable — one member, one task, so
    *    scan parallelism equals file count and upstream must shard.
    *  - bzip2: Hadoop's pure-Java SPLITTABLE codec — a single large
    *    file still scans in parallel (block-aligned splits).
    * Both ride the ordinary text-source path; nothing here is custom. */
  val IngestCodecs: Seq[String] = Seq("bzip2", "gzip")

  /** Gate composition (q125): the compressed-ingest round trip. Writes
    * documents with doc_id < maxId as JSONL once per codec, reads each
    * back through the explicit-schema contract, and reports per codec
    * the row count, char total, and the q103-style per-text content
    * hash. The oracle recomputes both rows straight from the parquet
    * source table, so a codec that drops, truncates, re-types, or
    * mangles bytes anywhere in the write → compress → decompress →
    * parse path hash-mismatches. Integer columns only cross the JSON
    * boundary (doubles would re-format); doc_id < maxId keeps the
    * fixture constant-size at every SF by construction. */
  def compressedRoundTripReport(docs: DataFrame, dir: String,
                                maxId: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.pipeline.TextFunctions.hash64
    val spark = docs.sparkSession
    val subset = docs.where(col("doc_id") < maxId)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
    val schema = new StructType()
      .add("doc_id", "long").add("source", "string")
      .add("n_chars", "long").add("text", "string")
    IngestCodecs.map { codec =>
      val path = s"$dir/$codec"
      subset.write.mode("overwrite").option("compression", codec).json(path)
      read(spark, path, schema)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"),
          sum(hash64(col("text"), "jsonl") % 1000000000L)
            .as("text_hash_sum"))
        .select(lit(codec).as("codec"), col("n_docs"),
          col("n_chars_total"), col("text_hash_sum"))
    }.reduce(_.unionAll(_)).orderBy("codec")
  }
}
