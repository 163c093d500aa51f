package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.pipeline.TextFunctions

/** Property parity for the native kernels over ARBITRARY text — the
  * corpus gates cover single-space ASCII; these generators stress the
  * split/shingle/hash semantics with repeated spaces (empty tokens),
  * leading/trailing spaces, unicode, and degenerate lengths, asserting
  * bit-equality with the portable HOF spellings on every sample. Each
  * sample batch is one Spark job, so the run count is bounded. */
object TokenKernelProperties extends Properties("tokenkernel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val weirdText: Gen[String] = {
    val token = Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaNumChar),
      Gen.oneOf("", "é", "日本語", "a-b", "x!", "©", "ß"),
      Gen.stringOfN(1, Gen.alphaChar))
    for {
      n <- Gen.choose(0, 8)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n, Gen.oneOf(" ", "  "))
      lead <- Gen.oneOf("", " ")
      trail <- Gen.oneOf("", " ")
    } yield {
      val body = toks.zip(seps).map { case (tk, sep) => tk + sep }
        .mkString.stripSuffix(" ")
      lead + body + trail
    }
  }

  property("token/shingle/simhash kernels == HOF spellings on arbitrary text") =
    forAll(Gen.listOfN(24, weirdText)) { texts =>
      val s = SparkTestSession.spark
      import s.implicits._
      val df = texts.toDF("text")
      val t = col("text")
      val bad = df.select(
          TextFunctions.tokenHashes(t, "sim").as("n_th"),
          TextFunctions.baseHashes(TextFunctions.tokens(t), "sim").as("h_th"),
          TextFunctions.shinglesOf(t, 3).as("n_sh"),
          TextFunctions.shingles(TextFunctions.tokens(t), 3).as("h_sh"),
          TextFunctions.simhashFromHashes(
            TextFunctions.tokenHashes(t, "sim")).as("n_si"),
          TextFunctions.simhashFromHashesSql(
            TextFunctions.baseHashes(TextFunctions.tokens(t), "sim")).as("h_si"))
        .where(col("n_th") =!= col("h_th") || col("n_sh") =!= col("h_sh") ||
          col("n_si") =!= col("h_si"))
        .count()
      bad == 0L
    }

  // decomposed sequences the NFC kernel must compose, mixed with text
  // that is already normalized (exercising the fast path)
  private val accentedText: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.const("e\u0301"), // decomposes → é
      Gen.const("a\u0300"), // → à
      Gen.const("o\u0302"), // → ô
      Gen.const("n\u0303"), // → ñ
      Gen.const("\u00e9"), // already composed
      Gen.stringOfN(3, Gen.alphaNumChar),
      Gen.const("日本語"), Gen.const(" "), Gen.const(""))
    Gen.listOfN(6, piece).map(_.mkString)
  }

  property("nfc kernel: idempotent and equal to java.text.Normalizer on arbitrary text") =
    forAll(Gen.listOfN(32, accentedText)) { texts =>
      import org.apache.spark.unsafe.types.UTF8String
      texts.forall { t =>
        val once = graft.functions.TokenKernel
          .nfcNormalize(UTF8String.fromString(t))
        val ref = java.text.Normalizer.normalize(
          t, java.text.Normalizer.Form.NFC)
        once.toString == ref &&
          graft.functions.TokenKernel.nfcNormalize(once) == once
      }
    }
}
