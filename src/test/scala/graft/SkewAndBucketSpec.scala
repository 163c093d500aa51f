package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewOps
import graft.sources.Corpus

/** Scale-machinery specs: salting preserves join semantics, and
  * bucketed tables co-locate the q32 join so the shuffle disappears —
  * the two claims SCALE.md makes about big-join behavior. */
class SkewAndBucketSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the unsalted join's rows") {
    val orders = Corpus.table(spark, sf, "orders")
    val lineitem = Corpus.table(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val plain = lineitem.join(orders, "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedJoin(lineitem, orders, "o_orderkey",
        col("o_orderkey"), 4)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("adaptive salt factor: 1 on the unskewed corpus, proportional under crafted skew, parity both ways") {
    val s = spark
    import s.implicits._
    val lineitem = Corpus.table(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    // TPC-H's hottest order key holds 7 lines — far under an average
    // partition, so the derivation must pick the PLAIN join
    assert(SkewOps.derivedSaltFactor(lineitem, "o_orderkey") == 1)
    // crafted skew: one key holding ~94% of rows across this
    // session's 4 shuffle partitions must derive the full spread...
    val skewed = ((0 until 600).map(i => (42L, i.toLong)) ++
      (0 until 40).map(i => (100L + i, i.toLong)))
      .toDF("k", "row_id")
    val f = SkewOps.derivedSaltFactor(skewed, "k")
    assert(f == 4, s"derived factor $f for a 94%-hot key over 4 partitions")
    // ...and the salted branch still returns exactly the plain join
    val dim = (Seq(42L) ++ (0 until 40).map(i => 100L + i))
      .map(k => (k, s"label_$k")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val adaptive = SkewOps.adaptiveSaltedJoin(skewed, dim, "k",
        struct(col("k"), col("row_id"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(adaptive == plain)
  }

  test("bucketed tables join without an exchange (q32's at-scale shape)") {
    val s = spark
    import s.implicits._
    // (bucketed tables land in the session's default warehouse dir;
    // dropped in the finally)
    // disable broadcast so the join strategy decision is about
    // co-location, not table size
    val oldThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Corpus.table(s, sf, "orders")
        .write.mode("overwrite").bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      Corpus.table(s, sf, "lineitem")
        .write.mode("overwrite").bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")
      val joined = s.table("orders_b").join(s.table("lineitem_b"),
        $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ==
        Corpus.table(s, sf, "lineitem").count()) // FK join row count
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
