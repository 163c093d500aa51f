package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Property suites for the two round-13 skew operators: on ARBITRARY
  * key distributions — uniform, one-hot, all-hot, singleton — the
  * salted/propagated dataflows must return exactly what their plain
  * spellings return, and the derived widths must respect their
  * bounds. (The real-corpus and planted-skew pins live in
  * SkewAndBucketSpec / PipelineSpec; these cover the distribution
  * shapes the fixtures don't.) */
object SkewProperties extends Properties("skew") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private def spark = SparkTestSession.spark

  // up to 120 fact rows over up to 6 distinct keys, weights skewed by
  // construction (key drawn from a squared distribution)
  private val genRows: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 120).flatMap { n =>
      Gen.listOfN(n, for {
        r <- Gen.chooseNum(0, 35)
        id <- Gen.chooseNum(0L, 1000000L)
      } yield ((r * r / 216).toLong, id)) // 0..5, quadratically skewed
    }

  property("adaptiveSaltedJoin == plain join on arbitrary skew shapes") =
    forAll(genRows) { rows =>
      val s = spark
      import s.implicits._
      val facts = rows.toDF("k", "row_id")
      val dim = rows.map(_._1).distinct.map(k => (k, s"d$k")).toDF("k", "label")
      val plain = facts.join(dim, Seq("k")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val adaptive = SkewOps
        .adaptiveSaltedJoin(facts, dim, "k", struct(col("k"), col("row_id")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      adaptive == plain
    }

  property("derivedSaltFactor within [1, shuffle partitions]") =
    forAll(genRows) { rows =>
      val s = spark
      import s.implicits._
      val parts = s.sessionState.conf.numShufflePartitions
      val f = SkewOps.derivedSaltFactor(rows.toDF("k", "row_id"), "k")
      f >= 1 && f <= parts
    }

  // paragraph-shaped rows: (doc_id, source, para_idx, para) with a
  // SMALL paragraph alphabet so duplicate content keys are common
  private val genParas: Gen[List[(Long, String, Int, String)]] =
    Gen.chooseNum(1, 80).flatMap { n =>
      Gen.listOfN(n, for {
        d <- Gen.chooseNum(0L, 9L)
        i <- Gen.chooseNum(0, 6)
        p <- Gen.oneOf("alpha", "beta", "gamma", "hot hot hot", "x")
      } yield (d, "s", i, p))
    }.map(_.groupBy(t => (t._1, t._3)).values.map(_.head).toList
      .sortBy(t => (t._1, t._3))) // one occurrence per (doc_id, para_idx)

  property("saltedKeeperFlags == plain min-struct keeper join") =
    forAll(genParas) { rows =>
      val s = spark
      import s.implicits._
      val paras = rows.toDF("doc_id", "source", "para_idx", "para")
        .withColumn("h", sha2(col("para"), 256))
      val flagged = graft.pipeline.Dedup
        .saltedKeeperFlags(paras, rows.length.toLong)
        .select(col("doc_id"), col("para_idx"), col("kept")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sorted.toSeq
      val keepers = paras.groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("para_idx"))).as("keeper"))
      val ref = paras.join(keepers, "h")
        .select(col("doc_id"), col("para_idx"),
          (col("keeper.doc_id") === col("doc_id") &&
           col("keeper.para_idx") === col("para_idx")).as("kept")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sorted.toSeq
      flagged == ref
    }

  property("saltedKeeperFlags: exactly one keeper per content key") =
    forAll(genParas) { rows =>
      val s = spark
      import s.implicits._
      val paras = rows.toDF("doc_id", "source", "para_idx", "para")
        .withColumn("h", sha2(col("para"), 256))
      // a deliberately WRONG total (0 → floor cut; the contract says
      // an inexact n only nudges routing, never correctness)
      val perKey = graft.pipeline.Dedup.saltedKeeperFlags(paras, 0L)
        .groupBy(col("para"))
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .collect()
      perKey.forall(_.getLong(1) == 1L)
    }
}
