package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, Expression}

/** SQL function registrations for ClickHouse-dialect fidelity.
  *
  * The only registration the reference surface needs (SURVEY §2.8) is
  * `has(arr, x)` (clickhouse_users.py:179) — registered as a zero-cost
  * alias onto Catalyst's native ArrayContains expression (codegen'd;
  * NOT a Scala UDF, so it stays inside whole-stage codegen).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "has",
      (exprs: Seq[Expression]) => ArrayContains(exprs(0), exprs(1)),
      "built-in")
  }
}
