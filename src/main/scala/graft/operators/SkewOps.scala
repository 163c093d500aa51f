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
}
