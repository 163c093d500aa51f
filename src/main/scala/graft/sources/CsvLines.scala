package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source — the other interchange format raw corpora arrive in
  * (exports, spreadsheets, log dumps). Same contract as [[JsonLines]]:
  * EXPLICIT schema (inference is an extra full pass that drifts with
  * dirty data), PERMISSIVE mode with a countable corrupt-record
  * column, line-splittable scan. The corrupt-column-only scan
  * restriction applies to CSV exactly as to JSON, so the health
  * summary is shared (`JsonLines.healthSummaryDf`). */
object CsvLines {

  val CorruptCol: String = JsonLines.CorruptCol

  /** Read CSV with the given schema; rows that fail to parse against
    * it (type mismatch, wrong arity) land in `_corrupt_record`. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "false")
      .csv(path)

  /** Gate composition (q101): serialize documents with doc_id < maxId
    * as CSV — rows where doc_id % corruptMod == 0 get a non-numeric
    * doc_id field, which cannot parse against the LONG column — write
    * to `dir`, read back through the explicit-schema PERMISSIVE
    * contract, and report clean/corrupt counts (q77's twin for the
    * second ingest format). */
  def healthReport(docs: DataFrame, dir: String,
                   maxId: Long, corruptMod: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    docs.where(col("doc_id") < maxId)
      .select(when(col("doc_id") % corruptMod === 0,
          concat(lit("notanumber,"), col("source")))
        .otherwise(concat(col("doc_id"), lit(","), col("source")))
        .as("value"))
      .write.mode("overwrite").text(dir)
    val schema = new StructType()
      .add("doc_id", "long").add("source", "string")
    JsonLines.healthSummaryDf(read(spark, dir, schema))
  }
}
