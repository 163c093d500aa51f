package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the classic salting pattern, provided as a first-class operator so
  * pipelines don't hand-roll it:
  *
  *  - the SKEWED (large, hot-keyed) side gets a random-but-deterministic
  *    salt in [0, factor) derived from a uniqueness column;
  *  - the other side is EXPLODED once per salt value;
  *  - the join key becomes (key, salt), spreading each hot key over
  *    `factor` shuffle partitions.
  *
  * Results are exactly those of the unsalted equi-join (pinned by
  * SkewOpsSpec). AQE's skew-join handles moderate skew automatically;
  * salting is for the pathological keys AQE can't split (e.g. a single
  * key holding >1 partition of rows on the BUILD side).
  */
object SkewOps {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltOn: Column, factor: Int): DataFrame = {
    val salted = skewed.withColumn("_salt", pmod(hash(saltOn), lit(factor)))
    val exploded = other.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** [[saltedJoin]] with the factor DERIVED from the observed key
    * distribution instead of pinned by the caller — the
    * corpus-sized-width discipline: one partial+final count pass over
    * the skewed side finds the hottest key, and the salt factor is
    * how many average shuffle partitions that key's rows amount to
    * (capped at the partition count). An unskewed corpus derives
    * factor 1 and takes the PLAIN equi-join — no explode fan-out, no
    * salted shuffle keys, just the one sizing pass — so salting costs
    * ~1× where there is nothing to mitigate, while a pathological key
    * still spreads over exactly as many partitions as it fills.
    * Results equal the plain join at every factor (SkewAndBucketSpec
    * pins both the parity and the derivation). */
  def adaptiveSaltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                         saltOn: Column): DataFrame = {
    val factor = derivedSaltFactor(skewed, key)
    if (factor <= 1) skewed.join(other, Seq(key))
    else saltedJoin(skewed, other, key, saltOn, factor)
  }

  /** ceil(hottest key's rows / average-partition rows), capped at the
    * session's shuffle-partition count; 1 on an empty frame. */
  private[graft] def derivedSaltFactor(skewed: DataFrame,
                                       key: String): Int = {
    val parts = skewed.sparkSession.sessionState.conf.numShufflePartitions
      .toLong
    val stats = skewed.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("max_cnt"), sum(col("cnt")).as("total"))
      .head()
    if (stats.isNullAt(0)) 1
    else {
      val maxCnt = stats.getLong(0)
      val avg = math.max(1L, stats.getLong(1) / parts)
      math.min(parts, (maxCnt + avg - 1) / avg).toInt
    }
  }
}
