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
}
