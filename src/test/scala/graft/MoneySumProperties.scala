package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{MoneyKernel, MoneySum}
import graft.operators.RelationalOps

/** Bit-parity of the 128-bit unscaled-long money fold (MoneySum)
  * against the decimal fold it replaces (sum over Cast(c,
  * Decimal(18, scale))) — the exactness contract the sf1 oracle pass
  * forced must survive the performance escape hatch verbatim.
  *
  * Three layers:
  *  1. kernel-level: MoneyKernel.unscaled == the decimal cast's
  *     unscaled long on ADVERSARIAL doubles — exact scale midpoints
  *     (dyadic values like 0.0078125), values a hair either side of
  *     .5 boundaries (where the fast path must hand off to the exact
  *     path), and random magnitudes across the money range;
  *  2. fold-level: both aggregates produce the same Decimal on random
  *     money-class data over multiple partitions (associativity +
  *     per-term parity end-to-end, through real partial/merge phases);
  *  3. beyond-decimal(18): sums that overflow the old Decimal(18)
  *     input cast still fold exactly in the 128-bit limbs, equal to a
  *     driver-side BigDecimal reference (the 100 TB headroom claim,
  *     executed).
  */
object MoneySumProperties extends Properties("moneysum") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def castUnscaled(x: Double, scale: Int): BigInt =
    BigInt(java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).unscaledValue())

  // doubles that live exactly ON scale midpoints (dyadic): k/2^m whose
  // decimal expansion terminates at scale+1 digits ending in 5
  private val midpointish: Gen[Double] = for {
    base <- Gen.oneOf(0.0078125, 0.03125, 0.5, 1.5, 2.5, 1234.5,
      0.15, 0.25, 0.35, 0.45, 0.55, 2.675)
    scaleUp <- Gen.oneOf(1.0, 10.0, 100.0)
    sign <- Gen.oneOf(1.0, -1.0)
  } yield base * scaleUp * sign

  // values jittered a few ulps around half boundaries at the target
  // scale — the band where the fast path MUST defer to the exact path
  private def nearHalf(scale: Int): Gen[Double] = for {
    n <- Gen.choose(-2000000L, 2000000L)
    ulps <- Gen.choose(-6, 6)
  } yield {
    val pow = math.pow(10d, scale)
    val v = (n + 0.5) / pow
    var r = v
    var i = 0
    while (i < math.abs(ulps)) {
      r = if (ulps > 0) Math.nextUp(r) else Math.nextDown(r)
      i += 1
    }
    r
  }

  private val moneyRange: Gen[Double] = for {
    cents <- Gen.choose(-99999999L, 99999999L)
  } yield cents / 100.0

  property("kernel quantize == decimal cast on adversarial doubles") = {
    val gens = Gen.oneOf(midpointish, nearHalf(2), nearHalf(4), nearHalf(6),
      moneyRange, Gen.choose(-1e12, 1e12))
    forAll(Gen.listOfN(500, gens)) { xs =>
      Seq(2, 4, 6).forall { scale =>
        val pow = math.pow(10d, scale)
        xs.forall { x =>
          MoneyKernel.unscaled(x, pow, scale) == castUnscaled(x, scale)
        }
      }
    }
  }

  property("moneySum == decimal fold bit-for-bit over partitioned data") =
    forAll(Gen.listOfN(400, moneyRange), Gen.oneOf(2, 4, 6)) { (xs, scale) =>
      val s = SparkTestSession.spark
      import s.implicits._
      val df = xs.toDF("v").repartition(7)
      val col6 = col("v")
      val row = df.agg(
        MoneySum.moneySum(col6, scale).as("fast"),
        sum(col6.cast(DecimalType(18, scale))).as("ref")).head()
      val fast = row.getDecimal(0)
      val ref = row.getDecimal(1)
      // same unscaled value and scale — the doubles they cast to are
      // then bit-identical by construction
      fast.compareTo(ref) == 0
    }

  property("null/empty semantics mirror sum") = forAll(Gen.choose(1, 5)) { n =>
    val s = SparkTestSession.spark
    import s.implicits._
    val allNull = Seq.fill(n)(Option.empty[Double]).toDF("v")
    val r1 = allNull.agg(MoneySum.moneySum(col("v"), 4)).head()
    val mixed = (Seq.fill(n)(Option.empty[Double]) :+ Some(1.25)).toDF("v")
    val r2 = mixed.agg(MoneySum.moneySum(col("v"), 4).cast("double")).head()
    r1.isNullAt(0) && r2.getDouble(0) == 1.25
  }

  property("128-bit limbs fold sums past Decimal(18) exactly") =
    forAll(Gen.listOfN(40, Gen.choose(1L, 9000000000000L))) { ns =>
      // each term ~9e12 at scale 6 → unscaled ~9e18, right at the long
      // edge; 40 of them cross 2^63 decisively, exercising the carry
      val s = SparkTestSession.spark
      import s.implicits._
      val xs = ns.map(_.toDouble) // integers ≤ 9e12: exact doubles
      val expected = xs.map(x => castUnscaled(x, 6)).sum
      val got = xs.toDF("v").repartition(5)
        .agg(MoneySum.moneySum(col("v"), 6).as("m")).head().getDecimal(0)
      BigInt(got.unscaledValue()) == expected
    }

  property("operator-level: q12 spelling equals its decimal-fold twin") =
    forAll(Gen.const(())) { _ =>
      // the real gate column: extendedprice*(1-discount) products of
      // 2-decimal money values, folded both ways over the sf0.001 corpus
      val s = SparkTestSession.spark
      val l = graft.sources.Corpus.table(s, "/root/testdata/sf0.001", "lineitem")
      val expr6 = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val row = l.agg(
        MoneySum.moneySum(expr6, 4).as("fast"),
        sum(RelationalOps.money(expr6, 4)).as("ref")).head()
      row.getDecimal(0).compareTo(row.getDecimal(1)) == 0
    }
}
