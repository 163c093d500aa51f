package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions._

/** Approximate-nearest-neighbor search over an
  * `embeddings(vec_id, embedding ARRAY<FLOAT>, label)` table.
  *
  * Two tiers:
  *  - `cosineTopK` — exact brute force: one scan, broadcast query
  *    vector, TakeOrderedAndProject top-k. The correctness baseline,
  *    and at 100 TB still the right shape for a SINGLE query (linear
  *    scan, no shuffle, no state).
  *  - `bucketTopK` — LSH path: a deterministic sign-bit coarse
  *    quantizer assigns every vector to a bucket; search only the
  *    query's bucket. At scale the table is written bucket-partitioned
  *    (partitionBy(bucket)), so a query prunes to one partition —
  *    the IVF probe pattern expressed as partition pruning.
  *
  * The scalar work (dot products) is all built-in higher-order
  * functions inside codegen — no UDFs.
  */
object Similarity {

  /** Exact cosine top-k against the vector with id `queryId`. */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.where(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    embeddings.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("q_emb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN top-k restricted to the query's sign-bucket (first `nBits`
    * dimension signs). Recall is traded for a bucket-local scan. */
  def bucketTopK(embeddings: DataFrame, queryId: Long, k: Int,
                 nBits: Int = 8): DataFrame = {
    val bucketed = embeddings
      .select(col("vec_id"), col("label"), col("embedding"),
        signBucket(col("embedding"), nBits).as("bucket"))
    val q = bucketed.where(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
    bucketed.where(col("vec_id") =!= queryId)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("q_emb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold, bucketed
    * by the sign quantizer so candidate generation is an equi-join on
    * bucket (never all-pairs). */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         nBits: Int = 4): DataFrame = {
    val b = embeddings.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), nBits).as("bucket"))
    val l = b.as("a"); val r = b.as("b")
    l.join(r,
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .where(col("cos") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
