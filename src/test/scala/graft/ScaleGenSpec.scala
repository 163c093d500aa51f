package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ScaleGen's embedding replication must be an EXACT orthogonal
  * transform per replica: within-replica cosine structure bit-preserved
  * (the scale checkpoints grade the ANN tiers on it), cross-replica
  * transforms pairwise distinct so no replication artifact can manufacture
  * near-dup cliques. These pins cover the sign-round extension that
  * lifts the old factor ≤ dim limit. */
class ScaleGenSpec extends AnyFunSuite {

  test("sign patterns: round 0 is identity; later rounds balanced and distant") {
    val p10 = ScaleGen.signPatternsFor(64, 10)
    assert(p10.length == 1 && p10(0).forall(_ == 1f))

    val p200 = ScaleGen.signPatternsFor(64, 200)
    assert(p200.length == 4)
    assert(p200(0).forall(_ == 1f))
    p200.drop(1).foreach { p =>
      val flips = p.count(_ < 0)
      assert(flips >= 16 && flips <= 48, s"unbalanced round: $flips flips")
    }
    for (a <- p200.indices; b <- (a + 1) until p200.length) {
      val diff = (0 until 64).count(k => p200(a)(k) != p200(b)(k))
      assert(diff >= 16, s"rounds $a/$b differ in only $diff positions")
    }
    // deterministic across invocations (replica corpora reproducible)
    assert(ScaleGen.signPatternsFor(64, 200)(2).toSeq == p200(2).toSeq)
  }

  test("replica transform: dot products bit-preserved, schema stays float, rounds differ") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(6)(id =>
      (id.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val patterns = ScaleGen.signPatternsFor(dim, 3 * dim)

    def collectVecs(i: Int): Map[Long, Array[Float]] =
      df.select(col("vec_id"),
          ScaleGen.replicaTransform(col("embedding"), dim, patterns, i).as("e"))
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Float](1).toArray).toMap

    // element type must survive the transform (schema drift would break
    // every downstream Array[Float] reader)
    val outType = df.select(ScaleGen.replicaTransform(
      col("embedding"), dim, patterns, dim + 1).as("e")).schema("e").dataType
    assert(outType == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = false) ||
      outType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true))

    val base = collectVecs(0)
    // the EXACT invariant: per-coordinate products are individually
    // bit-preserved (rotation permutes them; ±1 flips cancel in pairs),
    // so the sorted product multiset per vector pair is identical.
    // (A fixed-order float SUM may wiggle in the last ulp under
    // rotation — true of the original rotation-only generator too.)
    def prodSets(m: Map[Long, Array[Float]]): Map[(Long, Long), Seq[Float]] =
      (for (a <- vecs.map(_._1); b <- vecs.map(_._1) if a < b) yield {
        (a, b) -> m(a).zip(m(b)).map { case (x, y) => x * y }.toSeq.sorted
      }).toMap
    val baseProds = prodSets(base)

    // replicas across rotations AND sign rounds: products exact
    Seq(1, dim - 1, dim, dim + 3, 2 * dim + 5).foreach { i =>
      val d = prodSets(collectVecs(i))
      assert(d == baseProds, s"replica $i drifted the product structure")
    }

    // replicas 0..dim-1 are pure rotations — byte-identical to the
    // historical generator output (sf1/sf3 artifacts stay reproducible)
    val rotOnly = collectVecs(3)
    vecs.foreach { case (id, v) =>
      assert(rotOnly(id).toSeq == (v.drop(3) ++ v.take(3)).toSeq)
    }

    // same rotation, different sign round: vectors must actually differ
    // (this is the pair the old factor ≤ dim require protected against)
    val r0 = collectVecs(5)
    val r1 = collectVecs(dim + 5)
    vecs.foreach { case (id, _) =>
      val diff = r0(id).zip(r1(id)).count { case (x, y) => x != y }
      assert(diff >= dim / 4, s"vec $id: sign round barely changed it")
    }
  }
}
