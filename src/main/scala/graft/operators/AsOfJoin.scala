package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single LATEST right row with
  * rightTime <= leftTime sharing the key — the time-series point-lookup
  * join Spark has no native operator for, and the canonical case where
  * composing existing operators beats a custom physical node.
  *
  * Shape: tag sides, union by a common schema, and run ONE window
  * (partitionBy key, orderBy (time, side)) carrying the last right ROW
  * (a single struct of all right columns) forward; keep the left rows. Cost = one shuffle on the
  * key + a per-partition sort — no join node at all, while the naive
  * range-join formulation explodes to O(left × right-per-key) before
  * aggregating back down. At 100 TB both sides shuffle once on the key
  * and skew behaves like any window (a hot key is one partition's
  * sort — salt upstream if a single key exceeds a task).
  *
  * Semantics match DuckDB `ASOF JOIN ... ON l.k = r.k AND l.t >= r.t`
  * (inclusive: a right row AT leftTime matches — the right side sorts
  * first on ties): inner join, left rows with no prior right row drop.
  * Ties among RIGHT rows on the same (key, time) are the caller's to
  * resolve (pre-dedup to one row per (key, time)) — the window order
  * would otherwise be nondeterministic there.
  */
object AsOfJoin {

  /** As-of join with a match-age bound: the latest right row with
    * `leftTime − tolerance ≤ rightTime ≤ leftTime` — the form every
    * real attribution/feature-lookup pipeline needs (an hours-old
    * click should not claim a purchase; a stale feature row should
    * not serve). Implemented as a post-filter on the matched row's
    * carried time: the window already finds the LATEST prior right
    * row, so "latest but too old" is exactly "no match" — inner
    * semantics drop the row, mirroring DuckDB ASOF + interval WHERE.
    * The age test compares integer microseconds (unix_micros), so no
    * float crosses engines. Same one-shuffle cost as asofJoin. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTime: String, rightTime: String,
                        toleranceSeconds: Long): DataFrame = {
    val matched = asofJoinCarryingTime(left, right, key, leftTime, rightTime)
    matched
      .where(unix_micros(col(leftTime)) - unix_micros(col("_matched_t")) <=
        toleranceSeconds * 1000000L)
      .drop("_matched_t")
  }

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame =
    asofJoinCarryingTime(left, right, key, leftTime, rightTime)
      .drop("_matched_t")

  /** Core: asofJoin that also surfaces the matched right row's time as
    * `_matched_t` (the tolerance variant filters on it). */
  private def asofJoinCarryingTime(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.toSeq.filterNot(_ == key)
    val rCols = right.columns.toSeq.filterNot(_ == key)
    require(lCols.intersect(rCols).isEmpty,
      s"left/right column names must be disjoint apart from '$key', " +
        s"clash: ${lCols.intersect(rCols).mkString(", ")}")
    // internal plumbing names: a user column colliding with one would
    // be silently dropped (Spark's drop removes ALL same-named
    // columns) or make the struct getField ambiguous — reject loudly
    val reserved = Set("_t", "_side", "_r", "_asof", "_mt", "_matched_t")
    val clash = (lCols ++ rCols).filter(reserved)
    require(clash.isEmpty,
      s"column names ${clash.mkString(", ")} are reserved by asofJoin — rename them")

    val tagged = left.select(
        Seq(col(key), col(leftTime).cast("timestamp").as("_t"), lit(1).as("_side")) ++
          lCols.map(col) ++
          rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
      .unionByName(right.select(
        Seq(col(key), col(rightTime).cast("timestamp").as("_t"), lit(0).as("_side")) ++
          lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rCols.map(col): _*))

    // ONE struct of all right columns rides the window, so every output
    // column comes from the SAME matched right row — per-column
    // last(ignoreNulls) would fill a NULL in the matched row from an
    // older right row, stitching values across rows (diverging from
    // DuckDB ASOF, which returns the matched row's NULL as-is). The
    // struct is non-null exactly on right rows, so ignoreNulls skips
    // left rows, never a null FIELD.
    val rStruct = when(col("_side") === 0,
      struct(rCols.map(col) :+ col("_t").as("_mt"): _*)).as("_r")
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged.select(col("*"), rStruct)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
    carried.where(col("_side") === 1)
      .where(col("_asof").isNotNull) // inner: no prior right row → drop
      .select(Seq(col(key)) ++ lCols.map(col) ++
        rCols.map(c => col("_asof").getField(c).as(c)) :+
        col("_asof").getField("_mt").as("_matched_t"): _*)
  }
}
