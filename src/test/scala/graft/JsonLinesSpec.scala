package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.{Corpus, CsvLines, JsonLines}

/** JSONL round-trip and dirty-input contract: explicit schema, corrupt
  * lines counted (never silently dropped, never fatal). */
class JsonLinesSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)
    .add("lang", StringType).add("source", StringType)
    .add("n_chars", LongType)

  test("documents round-trip through JSONL with identical content") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl").toString + "/docs"
    val docs = Corpus.table(spark, "/root/testdata/sf0.001", "documents")
    JsonLines.write(docs, dir)
    val back = JsonLines.read(spark, dir, docSchema)
    val (ok, corrupt) = JsonLines.healthSummary(back)
    assert(corrupt == 0L)
    assert(ok == docs.count())
    // content-identical: same doc_id sum and same text hashes
    val h = (df: org.apache.spark.sql.DataFrame) => df
      .agg(sum(col("doc_id")), sum(conv(substring(
        sha2(col("text"), 256), 1, 8), 16, 10).cast("long"))).head()
    assert(h(back.drop(JsonLines.CorruptCol)).toSeq == h(docs).toSeq)
  }

  test("malformed lines are counted as corrupt, not dropped or fatal") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl2").toString
    val f = new java.io.PrintWriter(s"$dir/part.jsonl")
    f.println("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""")
    f.println("""{"doc_id": BROKEN not json""")
    f.println("""{"doc_id": 2, "text": "fine", "lang": "en", "source": "s", "n_chars": 4}""")
    f.close()
    val back = JsonLines.read(spark, dir, docSchema)
    val (ok, corrupt) = JsonLines.healthSummary(back)
    assert(ok == 2L)
    assert(corrupt == 1L)
    // the corrupt line's raw text is preserved for quarantine (select a
    // data column too — corrupt-column-only scans are disallowed)
    val raw = back.where(col(JsonLines.CorruptCol).isNotNull)
      .select(col("doc_id"), col(JsonLines.CorruptCol)).head().getString(1)
    assert(raw.contains("BROKEN"))
    // DataFrame shape agrees with the tuple shape
    val row = JsonLines.healthSummaryDf(back).head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 1L)
  }

  test("healthReport: planted corruption is counted exactly (q77 contract)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl3").toString + "/fixture"
    val docs = Corpus.table(spark, "/root/testdata/sf0.001", "documents")
    val row = JsonLines.healthReport(docs, dir, 100L, 7L).head()
    val expectedCorrupt = docs.where(col("doc_id") < 100 &&
      col("doc_id") % 7 === 0).count()
    val expectedClean = docs.where(col("doc_id") < 100).count() - expectedCorrupt
    assert(row.getLong(0) == expectedClean)
    assert(row.getLong(1) == expectedCorrupt)
  }

  test("CSV healthReport: planted type-mismatch rows are counted (q101 contract)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_csv1").toString + "/fixture"
    val docs = Corpus.table(spark, "/root/testdata/sf0.001", "documents")
    val row = CsvLines.healthReport(docs, dir, 100L, 5L).head()
    val expectedCorrupt = docs.where(col("doc_id") < 100 &&
      col("doc_id") % 5 === 0).count()
    val expectedClean = docs.where(col("doc_id") < 100).count() - expectedCorrupt
    assert(row.getLong(0) == expectedClean)
    assert(row.getLong(1) == expectedCorrupt)
    // clean rows parse into real columns; corrupt keep their raw line
    val back = CsvLines.read(spark,
      dir, new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("source", "string"))
    val raw = back.where(col(CsvLines.CorruptCol).isNotNull)
      .select(col("doc_id"), col(CsvLines.CorruptCol)).head()
    assert(raw.isNullAt(0) && raw.getString(1).startsWith("notanumber"))
  }

  test("ORC round trip: rows, schema, and text content survive exactly (q103 contract)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_orc1").toString + "/fixture"
    val docs = Corpus.table(spark, "/root/testdata/sf0.001", "documents")
    docs.where(col("doc_id") < 100).write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.where(col("doc_id") < 100).count())
    val orig = docs.where(col("doc_id") < 100)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    back.select("doc_id", "text").collect().foreach { r =>
      assert(orig(r.getLong(0)) == r.getString(1))
    }
  }

  test("compressed ingest: gzip and bzip2 JSONL round-trip losslessly " +
      "and the codecs genuinely apply (q125 contract)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl_codec").toString
    val docs = Corpus.table(spark, "/root/testdata/sf0.001", "documents")
    val report = JsonLines.compressedRoundTripReport(docs, dir, 100L)
      .collect()
    assert(report.map(_.getString(0)).toSeq == Seq("bzip2", "gzip"))
    // both codecs must agree with each other AND with the source
    val expectedDocs = docs.where(col("doc_id") < 100).count()
    report.foreach { r =>
      assert(r.getLong(1) == expectedDocs, r.toString)
    }
    assert(report.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .distinct.length == 1)
    // the files on disk must actually be compressed members — a codec
    // option silently ignored would still round-trip
    def parts(sub: String) = new java.io.File(s"$dir/$sub").listFiles()
      .map(_.getName).filter(_.startsWith("part-")).toSeq
    assert(parts("gzip").nonEmpty && parts("gzip").forall(_.endsWith(".gz")))
    assert(parts("bzip2").nonEmpty &&
      parts("bzip2").forall(_.endsWith(".bz2")))
  }
}
