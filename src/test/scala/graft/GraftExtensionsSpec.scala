package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.functions.GraftHash
import org.apache.spark.unsafe.types.UTF8String

/** Functions arrive via SparkSessionExtensions (the deploy-config
  * path), not just runtime registration. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves has() and sha256_prefix60()") {
    SparkTestSession.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s.sql(
        "SELECT has(array('a','b'), 'b') AS h, sha256_prefix60('table value', '#mh') AS p")
        .head()
      assert(row.getBoolean(0))
      assert(row.getLong(1) ==
        GraftHash.sha256Prefix60(UTF8String.fromString("table value"), "#mh".getBytes("UTF-8")))
      // the pipeline kernels are reachable from pure SQL too
      val k = s.sql(
        """SELECT length(simhash64(hash_tokens('a b c', 0, '#sim'))) AS sl,
          |  size(hash_tokens('a b c d', 3, '#mh')) AS ns,
          |  array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  hamming_bits('1010', '1001') AS hb""".stripMargin).head()
      assert(k.getInt(0) == 64)
      assert(k.getInt(1) == 2) // two distinct 3-shingles of 4 tokens
      assert(k.getDouble(2) == 11.0)
      assert(k.getInt(3) == 2)
    } finally {
      SparkSession.setDefaultSession(SparkTestSession.spark)
      SparkSession.setActiveSession(SparkTestSession.spark)
    }
  }

  test("optimizer rule rewrites the portable hash spelling to the native kernel") {
    SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // non-foldable input over a real scan: literals constant-fold and
      // VALUES collapses to an eagerly-evaluated LocalRelation
      s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .createOrReplaceTempView("ext_docs")
      val portable = s.sql(
        "SELECT cast(conv(substring(sha2(concat(text, '#mh'), 256), 1, 15), 16, 10) AS BIGINT) AS h " +
          "FROM ext_docs WHERE doc_id = 0")
      // the optimized plan carries the kernel, not the 5-expression chain
      val opt = portable.queryExecution.optimizedPlan.toString
      assert(opt.contains("sha256_prefix60"), s"no rewrite in:\n$opt")
      assert(!opt.contains("sha2("), s"portable chain survived in:\n$opt")
      // and the value is the portable value, bit-for-bit
      val doc0 = s.sql("SELECT text FROM ext_docs WHERE doc_id = 0")
        .head().getString(0)
      assert(portable.head().getLong(0) ==
        GraftHash.sha256Prefix60(
          UTF8String.fromString(doc0), "#mh".getBytes("UTF-8")))
      // no-seed form rewrites too
      val noSeed = s.sql(
        "SELECT cast(conv(substring(sha2(text, 256), 1, 15), 16, 10) AS BIGINT) AS h " +
          "FROM ext_docs WHERE doc_id = 0")
      assert(noSeed.queryExecution.optimizedPlan.toString
        .contains("sha256_prefix60"))
      assert(noSeed.head().getLong(0) ==
        GraftHash.sha256Prefix60(UTF8String.fromString(doc0), Array.emptyByteArray))
      // a NON-matching shape (different substring window) is untouched
      val other = s.sql(
        "SELECT cast(conv(substring(sha2(text, 256), 1, 14), 16, 10) AS BIGINT) AS h " +
          "FROM ext_docs WHERE doc_id = 0")
      assert(!other.queryExecution.optimizedPlan.toString
        .contains("sha256_prefix60"))
    } finally {
      SparkSession.setDefaultSession(SparkTestSession.spark)
      SparkSession.setActiveSession(SparkTestSession.spark)
    }
  }
}
