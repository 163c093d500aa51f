package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity, Winnow}
import graft.sources.Corpus

/** Pins the pure-SQL pipeline surface (QueryRunner + GraftFunctions)
  * to its Scala twins, row-for-row: the SQL path must be the SAME
  * computation reached through the session catalog, not a lookalike.
  * (The oracle gate re-checks q106/q107 against DuckDB; this spec
  * additionally pins the Spark-internal equivalence, including the
  * un-gated graft_lsh_near_dups entry point.) */
class SqlSurfaceSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("graft_exact_dedup view == Dedup.exactDedupSummary") {
    val sql = QueryRunner.sql(spark, sf,
      "SELECT source, n_docs, n_unique FROM graft_exact_dedup")
    val scala = Dedup.exactDedupSummary(Corpus.table(spark, sf, "documents"))
    assert(rows(sql) == rows(scala))
  }

  test("graft_lsh_near_dups view == Dedup.lshNearDupPairs") {
    val sql = QueryRunner.sql(spark, sf, "SELECT * FROM graft_lsh_near_dups")
    val scala = Dedup.lshNearDupPairs(Corpus.table(spark, sf, "documents"), 0.8)
    assert(rows(sql) == rows(scala))
  }

  test("graft_cosine_topk view == Similarity.cosineTopK") {
    val sql = QueryRunner.sql(spark, sf, "SELECT * FROM graft_cosine_topk")
    val scala = Similarity.cosineTopK(Corpus.table(spark, sf, "embeddings"), 0L, 10)
    assert(rows(sql) == rows(scala))
  }

  test("graft_dedup_clusters view == Dedup.nearDupClusters") {
    val sql = QueryRunner.sql(spark, sf,
      "SELECT doc_id, cluster FROM graft_dedup_clusters")
    val scala = Dedup.nearDupClusters(Corpus.table(spark, sf, "documents"), 0.8)
    assert(rows(sql) == rows(scala))
    // non-vacuous: sf0.001 plants near-dup pairs, so clusters exist
    assert(sql.count() > 0)
  }

  test("graft_cluster_keep_best view == Dedup.dedupByClustersKeepBest") {
    val sql = QueryRunner.sql(spark, sf,
      "SELECT source, n_kept FROM graft_cluster_keep_best")
    val scala = Dedup.dedupByClustersKeepBest(
      Corpus.table(spark, sf, "documents"), 0.8)
    assert(rows(sql) == rows(scala))
  }

  test("q118 ad-hoc SQL money_sum == RelationalOps.lineitemAgg bit-for-bit") {
    val sql = SparkEntry.queries("q118_sql_money_sum")(spark, sf)
    val scala = graft.operators.RelationalOps.lineitemAgg(spark, sf)
    assert(rows(sql) == rows(scala))
  }

  test("q107 ad-hoc SQL over array_dot == Similarity.cosineTopK bit-for-bit") {
    val sql = SparkEntry.queries("q107_sql_cosine_topk")(spark, sf)
    val scala = Similarity.cosineTopK(Corpus.table(spark, sf, "embeddings"), 0L, 10)
    assert(rows(sql) == rows(scala))
  }

  test("q109 ad-hoc SQL banded LSH == Dedup.lshNearDupPairs bit-for-bit") {
    val sql = SparkEntry.queries("q109_sql_lsh_near_dups")(spark, sf)
    val scala = Dedup.lshNearDupPairs(Corpus.table(spark, sf, "documents"), 0.8)
    assert(rows(sql) == rows(scala))
    // the SQL spelling must FIND something at this SF or the parity
    // assertion is vacuous (sf0.001 plants near-dup pairs)
    assert(sql.count() > 0)
  }

  test("q110 ad-hoc SQL simhash == Dedup.simhashAll bit-for-bit") {
    val sql = SparkEntry.queries("q110_sql_simhash")(spark, sf)
    val scala = Dedup.simhashAll(Corpus.table(spark, sf, "documents"))
    assert(rows(sql) == rows(scala))
  }

  test("q124 ad-hoc SQL paragraph dedup == Dedup.paragraphDedupSummary bit-for-bit") {
    val sql = SparkEntry.queries("q124_sql_paragraph_dedup")(spark, sf)
    val scala = Dedup.paragraphDedupSummary(Corpus.table(spark, sf, "documents"))
    assert(rows(sql) == rows(scala))
    // non-vacuous: the planted banner/footer guarantee removals
    assert(scala.collect().exists(r => r.getLong(4) > 0L))
  }

  test("q130 ad-hoc SQL hot-planted paragraph dedup == Dedup.paragraphDedupHotSummary bit-for-bit") {
    // the SQL spelling keeps the plain keeper join; the Scala path
    // runs the derived-salt propagate — results must be identical
    val sql = SparkEntry.queries("q130_sql_paragraph_dedup_hot")(spark, sf)
    val scala = Dedup.paragraphDedupHotSummary(
      Corpus.table(spark, sf, "documents"))
    assert(rows(sql) == rows(scala))
    // non-vacuous: the 50% hot plant guarantees removals everywhere
    assert(scala.collect().forall(r => r.getLong(4) > 0L))
  }

  test("q113 ad-hoc SQL as-of join == RelationalOps.purchaseAsofClick bit-for-bit") {
    val sql = SparkEntry.queries("q113_sql_asof_join")(spark, sf)
    val scala = graft.operators.RelationalOps.purchaseAsofClick(spark, sf)
    assert(rows(sql) == rows(scala))
    assert(sql.count() > 0) // non-vacuous: sf0.001 has matched purchases
  }

  test("PROPERTY: q113 SQL == AsOfJoin on random events — ties, no-match, dup-ts all agree") {
    // The corpus pin can't exercise every tie topology; seeded random
    // tables can. Deliberately DENSE collisions: few users, a tiny
    // timestamp range (purchase==click ts ties are common), duplicate
    // click timestamps per user (exercising the rank-1 pre-dedup), and
    // users with purchases but no prior click (inner-drop path).
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 3) {
      val n = 200 + round * 100
      val rows0 = (0 until n).map { i =>
        val et = rnd.nextInt(3) match {
          case 0 => "purchase"; case 1 => "click"; case _ => "view"
        }
        (i.toLong, new java.sql.Timestamp(1700000000000L + rnd.nextInt(40) * 1000L),
          rnd.nextInt(6).toLong, et, rnd.nextDouble() * 100)
      }
      val df = rows0.toDF("event_id", "ts", "user_id", "event_type", "value")
      df.createOrReplaceTempView("events")
      try {
        val viaSql = s.sql(SparkEntry.sqlAsOfJoin)
        // the Scala reference: the exact q40 composition over the same frame
        val purchases = df.where($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts", $"value".as("purchase_value"))
        val rank = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"ts").orderBy($"event_id".desc)
        val clicks = df.where($"event_type" === "click")
          .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(rank))
          .where($"_rn" === 1)
          .select($"user_id", $"ts".as("click_ts"),
            $"event_id".as("click_id"), $"value".as("click_value"))
        val viaScala = graft.operators.AsOfJoin
          .asofJoin(purchases, clicks, "user_id", "ts", "click_ts")
        assert(rows(viaSql) == rows(viaScala), s"round $round")
        assert(viaSql.count() > 0, s"round $round vacuous")
      } finally {
        // restore the corpus view the shared session's other tests expect
        Corpus.table(s, sf, "events").createOrReplaceTempView("events")
      }
    }
  }

  // ----- r16: the 13-gram decontamination + winnowing tiers on the
  // SQL surface (r15 VERDICT task 1 — the q109/q124 lockstep
  // discipline). Each view's plan must BE the Scala operator at the
  // gate-standard (planted) parameters, row-for-row.

  private def docsDf = Corpus.table(spark, sf, "documents")

  test("graft_decontamination_13 view == Dedup.decontaminationReport(planted)") {
    val sql = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_decontamination_13")
    val scala = Dedup.decontaminationReport(docsDf, plantBanner = true)
    assert(rows(sql) == rows(scala))
    // non-vacuous by construction: the planted banner contaminates
    // every source at every SF
    assert(sql.where("n_contaminated > 0").count() > 0)
  }

  test("graft_contaminated_evals_13 view == Dedup.contaminatedEvalDocs13(planted)") {
    val sql = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_contaminated_evals_13")
    val scala = Dedup.contaminatedEvalDocs13(docsDf, plantBanner = true)
    assert(rows(sql) == rows(scala))
    assert(sql.count() > 0)
  }

  test("q143 / graft_decontaminate_13 view == Dedup.decontaminateCorpus13(planted)") {
    val sql = SparkEntry.queries("q143_sql_decontaminate")(spark, sf)
    val scala = Dedup.decontaminateCorpus13(docsDf, plantBanner = true)
      .select("source", "n_train_docs", "n_dropped", "n_kept", "kept_hash_sum")
    assert(rows(sql) == rows(scala))
    // the drop path fired: planted contamination exists on every source
    assert(sql.where("n_dropped > 0").count() > 0)
  }

  test("graft_winnow_fingerprints view == Winnow.winnowFingerprintStats") {
    val sql = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_winnow_fingerprints")
    val scala = Winnow.winnowFingerprintStats(docsDf)
    assert(rows(sql) == rows(scala))
    assert(sql.count() > 0)
  }

  test("q144 / graft_winnow_pairs view == Winnow.winnowOverlapPairs") {
    val sql = SparkEntry.queries("q144_sql_winnow_pairs")(spark, sf)
    val scala = Winnow.winnowOverlapPairs(docsDf)
    assert(rows(sql) == rows(scala))
  }

  test("graft_winnow_neighbors view == Winnow.winnowTopNeighbors") {
    val sql = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_winnow_neighbors")
    val scala = Winnow.winnowTopNeighbors(docsDf)
    assert(rows(sql) == rows(scala))
  }

  test("q148 / graft_winnow_apply view == Winnow.winnowDedupCorpus") {
    val sql = SparkEntry.queries("q148_sql_winnow_apply")(spark, sf)
    val scala = Winnow.winnowDedupCorpus(docsDf)
    assert(rows(sql) == rows(scala))
    // the apply path fired at this SF (sf0.001 plants copy pairs)
    assert(sql.where("n_dropped > 0").count() > 0)
  }

  // ----- r17: span attribution + the persisted-store tiers on SQL -----

  test("q151 / graft_winnow_spans view == Winnow.winnowCopySpans") {
    val sql = SparkEntry.queries("q151_sql_winnow_spans")(spark, sf)
    val scala = Winnow.winnowCopySpans(docsDf)
    assert(rows(sql) == rows(scala))
    assert(sql.count() > 0) // the planted copies yield spans at this SF
  }

  test("q152 / graft_winnow_store_pairs mat-view == Winnow.winnowStoreOverlap (one store per process)") {
    val sql = SparkEntry.queries("q152_sql_winnow_store")(spark, sf)
    // the Scala side reuses the SAME (table, path) the view built —
    // exercising the store-signature memo's hit path
    val (t, p) = SparkEntry.winnowStoreLoc(sf)
    val scala = Winnow.winnowStoreOverlap(docsDf, Winnow.WinnowDeltaMod, t, p)
    assert(rows(sql) == rows(scala))
  }

  test("q155 / graft_winnow_store_spans mat-view == Winnow.winnowStoreSpanReport") {
    val sql = SparkEntry.queries("q155_sql_winnow_store_spans")(spark, sf)
    val (t, p) = SparkEntry.winnowStoreLoc(sf)
    val scala = Winnow.winnowStoreSpanReport(docsDf,
      Winnow.WinnowDeltaMod, t, p)
    assert(rows(sql) == rows(scala))
  }

  test("q153 / graft_band_store_dedup mat-view == Dedup.incrementalDedupViaBandStore") {
    val sql = SparkEntry.queries("q153_sql_band_store")(spark, sf)
    val (t, p) = SparkEntry.bandStoreLoc(sf)
    val scala = Dedup.incrementalDedupViaBandStore(docsDf, 10L, 0.8, t, p)
    assert(rows(sql) == rows(scala))
  }

  // ----- r18: parameterized winnow TVFs (VERDICT r17 task 5) -----

  test("q159 / graft_winnow_pairs(k,w,maxDf,minShared) TVF at gate-standard args == view == Scala") {
    val tvf = SparkEntry.queries("q159_sql_winnow_pairs_tvf")(spark, sf)
    val view = SparkEntry.queries("q144_sql_winnow_pairs")(spark, sf)
    val scala = Winnow.winnowOverlapPairs(docsDf)
    assert(rows(tvf) == rows(view))
    assert(rows(tvf) == rows(scala))
    assert(tvf.count() > 0)
  }

  test("graft_winnow_pairs TVF: trailing args default to gate-standard; non-standard args change the plan") {
    val noArgs = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_winnow_pairs()")
    assert(rows(noArgs) == rows(Winnow.winnowOverlapPairs(docsDf)))
    // minShared=1 admits single-fingerprint evidence: strictly more
    // pairs than the gate-standard floor of 5 (non-vacuous knob)
    val loose = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_winnow_pairs(5, 4, 8, 1)")
    val looseScala = Winnow.winnowOverlapPairs(docsDf, minShared = 1L)
    assert(rows(loose) == rows(looseScala))
    assert(loose.count() > noArgs.count())
  }

  test("graft_winnow_neighbors / graft_winnow_spans TVFs == their Scala operators at non-default args") {
    val nb = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_winnow_neighbors(5, 4, 8, 1)")
    assert(rows(nb) == rows(Winnow.winnowTopNeighbors(docsDf, topK = 1)))
    assert(nb.count() > 0)
    val sp = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_winnow_spans(5, 4, 8, 5)")
    assert(rows(sp) == rows(Winnow.winnowCopySpans(docsDf)))
    assert(sp.count() > 0)
  }

  test("graft_winnow_pairs TVF rejects non-literal args and excess arity at analysis time") {
    val e1 = intercept[Exception] {
      QueryRunner.sql(spark, sf,
        "SELECT * FROM graft_winnow_pairs(n_chars, 4, 8, 5)").collect()
    }
    assert(e1.getMessage != null)
    val e2 = intercept[Exception] {
      QueryRunner.sql(spark, sf,
        "SELECT * FROM graft_winnow_pairs(5, 4, 8, 5, 99)").collect()
    }
    assert(e2.getMessage.contains("at most") ||
      e2.getMessage.contains("arguments"))
    // invalid VALUES surface the operator's own require() message
    val e3 = intercept[Exception] {
      QueryRunner.sql(spark, sf,
        "SELECT * FROM graft_winnow_pairs(5, 4, 1, 5)").collect()
    }
    assert(e3.getMessage.contains("maxDf") ||
      e3.getMessage.contains("1"))
  }

  test("q160/q161 TVFs at non-default args == their Scala operators (LSH threshold, cosine query/k)") {
    val loose = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_lsh_near_dups(0.7) ORDER BY doc_a, doc_b")
    assert(rows(loose) == rows(Dedup.lshNearDupPairs(docsDf, 0.7)))
    val std = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_lsh_near_dups(0.8)")
    assert(loose.count() >= std.count() && std.count() > 0)
    val emb = Corpus.table(spark, sf, "embeddings")
    val topk = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_cosine_topk(3, 5)")
    assert(rows(topk) == rows(Similarity.cosineTopK(emb, 3L, 5)))
    assert(topk.count() == 5)
  }

  test("q163 / graft_winnow_scrubbed_docs mat-view == Winnow.winnowScrubbedDocReport") {
    val sql = SparkEntry.queries("q163_sql_winnow_scrubbed_docs")(spark, sf)
    val scala = Winnow.winnowScrubbedDocReport(docsDf)
    assert(rows(sql) == rows(scala))
    assert(sql.count() > 0) // the planted copies flag losers at this SF
  }

  test("q162 per-doc scrub rows roll up to q156's digest: counts and token accounting agree per source") {
    val perDoc = Winnow.winnowScrubbedDocReport(docsDf)
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_scrubbed"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("n_toks") -
            org.apache.spark.sql.functions.col("n_kept"))
          .as("n_tokens_removed"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val digest = Winnow.winnowScrubSpans(docsDf)
      .where("n_scrubbed > 0")
      .select("source", "n_scrubbed", "n_tokens_removed")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(perDoc == digest && digest.nonEmpty)
  }

  test("bare graft_winnow_pairs still resolves to the VIEW: the TVF registration does not shadow q144") {
    val view = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_winnow_pairs")
    assert(rows(view) == rows(Winnow.winnowOverlapPairs(docsDf)))
  }

  test("mat-view dispatch matches identifiers, not substrings: a string literal naming a view does not build it") {
    // parses to a plain scan of `documents` — graft_winnow_apply (and a
    // commented graft_dedup_clusters) appear only as TEXT, so no
    // mat-view build may fire (ADVICE r16: the old contains() paid the
    // eager CC solve for a mere mention)
    val before = QueryRunner.matViewBuilds.get()
    val out = QueryRunner.sql(spark, sf,
      """SELECT count(*) AS n, 'graft_winnow_apply' AS note
        |FROM documents -- graft_dedup_clusters""".stripMargin)
    assert(out.head.getLong(0) > 0)
    assert(QueryRunner.matViewBuilds.get() == before,
      "a literal/comment mention triggered a mat-view build")
  }

  // ----- r18 session 2: bigram LM / interval join / weighted sample -----

  test("q167/q168/q169 TVFs at non-default args == their Scala operators") {
    val docs = Corpus.table(spark, sf, "documents")
    val ev = Corpus.table(spark, sf, "events")
    // a different dyadic λ — Spark-internal parity is λ-agnostic
    val lm = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_bigram_lm(0.75) ORDER BY source")
    assert(rows(lm) == rows(
      graft.pipeline.TextStats.bigramLmScores(docs, 0.75)))
    assert(lm.count() > 0)
    val bw = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_burst_windows(150.0, 3) ORDER BY anchor_id")
    assert(rows(bw) == rows(
      graft.operators.IntervalJoin.burstWindowsOver(ev, 150.0, 3)))
    assert(bw.count() > 0)
    val ws = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_weighted_sample(7) ORDER BY source, rn")
    assert(rows(ws) == rows(
      graft.pipeline.Curation.weightedSample(docs, 7)))
    assert(ws.count() > 0)
  }

  test("graft_bm25 TVF: string query arg, non-standard args == Scala, " +
    "bare name resolves to the gate-standard view, literal validation") {
    val docs = Corpus.table(spark, sf, "documents")
    // non-standard query + k from pure SQL == the Scala operator
    val t = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_bm25('dup scan', 5) ORDER BY rank")
    assert(rows(t) == rows(
      graft.pipeline.Retrieval.bm25TopK(docs, "dup scan", 5)))
    assert(t.count() > 0)
    // trailing args default (k1, b omitted)
    assert(rows(QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_bm25('dup merge window', 20)")) ==
      rows(graft.pipeline.Retrieval.bm25TopK(docs)))
    // bare name = the gate-standard view
    assert(rows(QueryRunner.sql(spark, sf, "SELECT * FROM graft_bm25")) ==
      rows(graft.pipeline.Retrieval.bm25TopK(docs)))
    // the query argument must be a string LITERAL
    val e = intercept[Exception] {
      QueryRunner.sql(spark, sf, "SELECT * FROM graft_bm25(42)").collect()
    }
    assert(e.getMessage.contains("string literal"))
    val e2 = intercept[Exception] {
      QueryRunner.sql(spark, sf,
        "SELECT * FROM graft_bm25('dup', 5, 1.2, 0.75, 9)").collect()
    }
    assert(e2.getMessage.contains("at most 4 arguments"))
  }

  test("graft_edit_pairs / graft_bigram_lm_cross TVFs at non-standard " +
    "args == their Scala operators; bare names resolve to gate-standard") {
    import org.apache.spark.sql.functions.col
    val docs = Corpus.table(spark, sf, "documents")
    val ep = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_edit_pairs(2, 24) ORDER BY doc_a, doc_b")
    assert(rows(ep) == rows(
      graft.pipeline.EditJoin.editDistancePairs(docs, 2, 24)))
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 =!= 0)
    val cx = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_bigram_lm_cross(0.75) ORDER BY source")
    assert(rows(cx) == rows(
      graft.pipeline.TextStats.bigramLmCrossScores(even, odd, 0.75)))
    assert(cx.count() > 0)
    assert(rows(QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_bigram_lm_cross")) ==
      rows(graft.pipeline.TextStats.bigramLmCrossScores(even, odd)))
    val qa = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_quality_admission(0.5, 100) ORDER BY source")
    assert(rows(qa) == rows(
      graft.pipeline.Curation.qualityPercentileAdmission(docs, 0.5, 100L)))
    assert(qa.count() > 0)
    // r18 s4 TVFs at NON-standard parameters == the Scala operators
    val ra = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_repetition_admission(500, 120, 140, 160, 100, 80) " +
        "ORDER BY source")
    assert(rows(ra) == rows(graft.pipeline.TextStats.repetitionAdmission(
      docs, 500L, Seq(2 -> 120L, 3 -> 140L, 4 -> 160L),
      Seq(5 -> 100L, 10 -> 80L))))
    assert(ra.count() > 0)
    val ds = QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_dsir_sample(3, 1024) ORDER BY source, rn")
    assert(rows(ds) == rows(
      graft.pipeline.Curation.dsirResample(docs, 3, 1024L)))
    assert(ds.count() > 0)
  }

  test("bare graft_weighted_sample / graft_burst_windows / graft_bigram_lm resolve to the gate-standard views") {
    val docs = Corpus.table(spark, sf, "documents")
    assert(rows(QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_weighted_sample")) ==
      rows(graft.pipeline.Curation.weightedSample(docs, 50)))
    assert(rows(QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_bigram_lm")) ==
      rows(graft.pipeline.TextStats.bigramLmScores(docs)))
    assert(rows(QueryRunner.sql(spark, sf,
      "SELECT * FROM graft_burst_windows")) ==
      rows(graft.operators.IntervalJoin.burstWindowsOver(
        Corpus.table(spark, sf, "events"))))
  }
}
