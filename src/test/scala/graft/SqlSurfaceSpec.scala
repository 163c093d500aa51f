package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity}
import graft.sources.Corpus

/** Pins the pure-SQL pipeline surface (QueryRunner + GraftFunctions)
  * to its Scala twins, row-for-row: the SQL path must be the SAME
  * computation reached through the session catalog, not a lookalike.
  * (The oracle gate re-checks q106/q107 against DuckDB; this spec
  * additionally pins the Spark-internal equivalence, including the
  * un-gated graft_lsh_near_dups entry point.) */
class SqlSurfaceSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("graft_exact_dedup view == Dedup.exactDedupSummary") {
    val sql = QueryRunner.sql(spark, sf,
      "SELECT source, n_docs, n_unique FROM graft_exact_dedup")
    val scala = Dedup.exactDedupSummary(Corpus.table(spark, sf, "documents"))
    assert(rows(sql) == rows(scala))
  }

  test("graft_lsh_near_dups view == Dedup.lshNearDupPairs") {
    val sql = QueryRunner.sql(spark, sf, "SELECT * FROM graft_lsh_near_dups")
    val scala = Dedup.lshNearDupPairs(Corpus.table(spark, sf, "documents"), 0.8)
    assert(rows(sql) == rows(scala))
  }

  test("graft_cosine_topk view == Similarity.cosineTopK") {
    val sql = QueryRunner.sql(spark, sf, "SELECT * FROM graft_cosine_topk")
    val scala = Similarity.cosineTopK(Corpus.table(spark, sf, "embeddings"), 0L, 10)
    assert(rows(sql) == rows(scala))
  }

  test("q107 ad-hoc SQL over array_dot == Similarity.cosineTopK bit-for-bit") {
    val sql = SparkEntry.queries("q107_sql_cosine_topk")(spark, sf)
    val scala = Similarity.cosineTopK(Corpus.table(spark, sf, "embeddings"), 0L, 10)
    assert(rows(sql) == rows(scala))
  }

  test("q109 ad-hoc SQL banded LSH == Dedup.lshNearDupPairs bit-for-bit") {
    val sql = SparkEntry.queries("q109_sql_lsh_near_dups")(spark, sf)
    val scala = Dedup.lshNearDupPairs(Corpus.table(spark, sf, "documents"), 0.8)
    assert(rows(sql) == rows(scala))
    // the SQL spelling must FIND something at this SF or the parity
    // assertion is vacuous (sf0.001 plants near-dup pairs)
    assert(sql.count() > 0)
  }

  test("q110 ad-hoc SQL simhash == Dedup.simhashAll bit-for-bit") {
    val sql = SparkEntry.queries("q110_sql_simhash")(spark, sf)
    val scala = Dedup.simhashAll(Corpus.table(spark, sf, "documents"))
    assert(rows(sql) == rows(scala))
  }

  test("q113 ad-hoc SQL as-of join == RelationalOps.purchaseAsofClick bit-for-bit") {
    val sql = SparkEntry.queries("q113_sql_asof_join")(spark, sf)
    val scala = graft.operators.RelationalOps.purchaseAsofClick(spark, sf)
    assert(rows(sql) == rows(scala))
    assert(sql.count() > 0) // non-vacuous: sf0.001 has matched purchases
  }
}
