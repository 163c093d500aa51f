package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ORC source/sink — Spark's second built-in columnar format (the
  * orc-core jars ship with the distribution; warehouses that standardize
  * on ORC read/write it exactly like parquet). Nothing here needs a
  * custom reader: the point of the gate is LOSSLESSNESS of the full
  * write → read path, checked on content, not just counts. */
object OrcTables {

  /** Gate composition (q103): write documents with doc_id < maxId as
    * ORC, read them back, and summarize per source with a content hash
    * (portable 60-bit digest of each text, summed mod 1e9). The oracle
    * computes the same aggregates straight from the parquet source
    * table, so any column the round trip dropped, re-typed, or
    * corrupted — or any row lost — hash-mismatches. */
  def roundTripReport(docs: DataFrame, dir: String, maxId: Long): DataFrame = {
    import graft.pipeline.TextFunctions.hash64
    docs.where(col("doc_id") < maxId)
      .write.mode("overwrite").orc(dir)
    docs.sparkSession.read.orc(dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        sum(hash64(col("text"), "orc") % 1000000000L).as("text_hash_sum"))
      .orderBy("source")
  }
}
