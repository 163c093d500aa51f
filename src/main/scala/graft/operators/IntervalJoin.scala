package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Batch interval (range-containment) join via bucket decomposition.
  *
  * The missing relational sibling of the as-of join (AsOfJoin.scala):
  * "for every anchor interval, aggregate all points whose timestamp
  * falls inside it" with NO equality key. Spark's naive spelling of a
  * pure range predicate is a BroadcastNestedLoopJoin (or a cartesian
  * product when neither side fits in a broadcast) — at 100 TB that is
  * |points|×|anchors| work, the canonical scale-killer.
  *
  * The decomposition: quantize time into fixed-width buckets with the
  * bucket width equal to the window width. Each point lands in exactly
  * ONE bucket; each anchor window overlaps AT MOST TWO consecutive
  * buckets (width == window ⇒ the window's ends land in adjacent
  * buckets), so the anchor side expands ≤2×, the join becomes a plain
  * equi-join on the bucket id, and the exact containment predicate
  * filters the candidates. Because bucket width ≈ window width, every
  * surviving candidate pair is within one bucket of matching — the
  * candidate set is O(true matches), i.e. the join does work
  * proportional to its OUTPUT, which is the best any range join can
  * do. A point joins each anchor exactly once (the point's single
  * bucket), so no post-join dedup is needed.
  *
  * Scale shape: one shuffle per side on the bucket id (sort-merge or
  * shuffled-hash; AQE handles a hot bucket), partial+final aggregate
  * on the anchor id. All arithmetic is integer microseconds — exact
  * in both engines; the oracle states the same join as a plain
  * non-equi range predicate (DuckDB executes it as an IEJoin).
  * Plan pin (PlanShapeSpec): no CartesianProduct, no
  * BroadcastNestedLoopJoin; equivalence to the brute-force cross-join
  * spelling is property-tested in IntervalJoinProperties.
  */
object IntervalJoin {

  /** Points-in-window aggregate: for every `anchors` row, count the
    * `points` rows with |point.us − anchor.us| ≤ halfWidthUs
    * (inclusive both ends) and the distinct users among them.
    *
    * @param points  (event_id, user_id, us) — epoch microseconds
    * @param anchors (anchor_id, us)
    */
  def pointsInWindows(points: DataFrame, anchors: DataFrame,
                      halfWidthUs: Long): DataFrame = {
    require(halfWidthUs > 0)
    val bucketUs = 2 * halfWidthUs // bucket width == window width
    // anchor side: ≤2 covered buckets (array_distinct collapses the
    // boundary case where both ends share a bucket)
    val a = anchors
      .withColumn("_b", explode(array_distinct(array(
        expr(s"(us - ${halfWidthUs}L) div ${bucketUs}L"),
        expr(s"(us + ${halfWidthUs}L) div ${bucketUs}L")))))
      .select(col("anchor_id"), col("us").as("_aus"), col("_b"))
    val p = points
      .withColumn("_b", expr(s"us div ${bucketUs}L"))
      .select(col("event_id"), col("user_id"), col("us").as("_pus"),
        col("_b"))
    p.join(a, "_b")
      .where(col("_pus") >= col("_aus") - halfWidthUs &&
        col("_pus") <= col("_aus") + halfWidthUs)
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Burst-window attribution over an events frame. Anchors are
    * high-value error events (value > `threshold`); each claims a
    * ±`halfWidthMinutes` window; the result counts the events and
    * distinct users inside every window (the anchor itself included —
    * it lies in its own window). */
  def burstWindowsOver(events: DataFrame, threshold: Double = 250.0,
                       halfWidthMinutes: Int = 5): DataFrame = {
    require(halfWidthMinutes > 0)
    val ev = events.select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
    val anchors = ev
      .where(col("event_type") === "error" && col("value") > threshold)
      .select(col("event_id").as("anchor_id"), col("us"))
    val points = ev.select(col("event_id"), col("user_id"), col("us"))
    pointsInWindows(points, anchors, halfWidthMinutes * 60L * 1000000L)
      .orderBy("anchor_id")
  }

  /** Gate entry (q165). */
  def burstWindows(spark: SparkSession, sfDir: String,
                   threshold: Double = 250.0,
                   halfWidthMinutes: Int = 5): DataFrame =
    burstWindowsOver(Corpus.table(spark, sfDir, "events"), threshold,
      halfWidthMinutes)
}
