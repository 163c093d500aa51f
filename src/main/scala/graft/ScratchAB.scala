package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.TextFunctions._

/** TEMPORARY same-JVM A/B harness for the r19 optimization round —
  * times the OLD spelling (inlined here) against the NEW spelling
  * (the library code) with alternating reps in one warm session, so
  * box drift between JVMs cannot masquerade as a win. Deleted before
  * the round's final commit. Usage:
  *   tools/run.sh graft.ScratchAB <which> <sfDir> [reps]
  * which ∈ {bigram, bigramcross, quality}
  */
object ScratchAB {

  // ---- OLD bigramLmScores (pre-r19), verbatim ----
  def bigramLmScoresOld(docs: DataFrame, lambda: Double = 0.875): DataFrame = {
    val base = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        filter(tokens(col("text")), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) >= 1)
    val bgd = base
      .select(col("doc_id"), col("source"),
        explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => struct(element_at(col("tk"), i).as("w1"),
              element_at(col("tk"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("bg"))
      .groupBy(col("doc_id"), col("source"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val cb = bgd.groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("cb"))
    val cctx = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cctx"))
    val cu = base
      .select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val n = cu.agg(sum(col("cu")).as("n_corpus"))
    val lpBg = cb
      .join(cctx, "w1")
      .join(cu.withColumnRenamed("w", "w2").withColumnRenamed("cu", "cu2"),
        "w2")
      .join(broadcast(n))
      .select(col("w1"), col("w2"),
        round(log(
          lit(lambda) * (col("cb").cast("double") / col("cctx").cast("double"))
            + lit(1.0 - lambda) *
              (col("cu2").cast("double") / col("n_corpus").cast("double")))
          * 1e9, 0).cast("long").as("lp_nano"))
    val docBg = bgd.join(lpBg, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("lp_nano")).as("bg_nano"))
    val docs0 = base.select(col("doc_id"), col("source"),
      size(col("tk")).cast("long").as("n_toks"),
      element_at(col("tk"), 1).as("w0"))
    val perDoc = docs0
      .join(cu.withColumnRenamed("w", "w0").withColumnRenamed("cu", "cu0"),
        "w0")
      .join(broadcast(n))
      .join(docBg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_toks"),
        (round(log(col("cu0").cast("double") / col("n_corpus").cast("double"))
          * 1e9, 0).cast("long")
          + coalesce(col("bg_nano"), lit(0L))).as("doc_nano"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("doc_nano")).cast("double")
          / sum(col("n_toks")).cast("double") / 1e9, 6).as("avg_lp"),
        round(percentile(
          col("doc_nano").cast("double") / col("n_toks").cast("double") / 1e9,
          lit(0.5)), 6).as("p50_doc_lp"))
      .orderBy("source")
  }

  // ---- OLD qualityPercentileAdmission (window form), verbatim ----
  def qualityOld(docs: DataFrame, q: Double = 0.75,
                 rareDen: Long = 500L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val dt = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        (hash64(col("text"), "qp") % 1000000000L).as("th"),
        explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("source"), col("th"), col("term"))
      .agg(count(lit(1)).as("c"))
    val total = dt.agg(sum(col("c")).as("n_total"))
    val perDoc = dt
      .withColumn("cnt", sum(col("c")).over(W.partitionBy(col("term"))))
      .join(broadcast(total))
      .groupBy(col("doc_id"), col("source"), col("th"))
      .agg((sum(when(col("cnt") * rareDen < col("n_total"), col("c"))
        .otherwise(0L))
        .cast("double") / sum(col("c")).cast("double")).as("rate"))
    val thresholds = perDoc.groupBy(col("source"))
      .agg(percentile(col("rate"), lit(q)).as("cut"))
    val kept = perDoc.join(broadcast(thresholds), Seq("source"))
      .where(col("rate") <= col("cut"))
    perDoc.groupBy(col("source")).agg(count(lit(1)).as("n_in"))
      .join(kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("th")).as("kept_hash_sum")),
        Seq("source"), "left")
      .na.fill(0L, Seq("n_kept", "kept_hash_sum"))
      .select(col("source"), col("n_in"),
        (col("n_in") - col("n_kept")).as("n_dropped"),
        col("n_kept"), col("kept_hash_sum"))
      .orderBy("source")
  }

  def main(args: Array[String]): Unit = {
    val which = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Corpus.table(spark, sfDir, "documents")
    val (oldFn, newFn): (() => DataFrame, () => DataFrame) = which match {
      case "bigram" =>
        (() => bigramLmScoresOld(docs),
         () => graft.pipeline.TextStats.bigramLmScores(docs))
      case "quality" =>
        (() => qualityOld(docs),
         () => graft.pipeline.Curation.qualityPercentileAdmission(docs))
      case other => sys.error(s"unknown: $other")
    }
    def time(tag: String, fn: () => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $tag $dt%.2f s")
      dt
    }
    // untimed warmup of both
    time("warm-old", oldFn); time("warm-new", newFn)
    val olds = collection.mutable.ListBuffer[Double]()
    val news = collection.mutable.ListBuffer[Double]()
    (1 to reps).foreach { _ =>
      olds += time("old", oldFn)
      news += time("new", newFn)
    }
    println(f"[ab] $which OLD min=${olds.min}%.2f med=${olds.sorted.apply(olds.size / 2)}%.2f  NEW min=${news.min}%.2f med=${news.sorted.apply(news.size / 2)}%.2f")
    spark.stop()
  }
}
