package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Text-analysis operators for pipeline curation: language ID, quality
  * scoring, token counting, and content fingerprinting — all pure
  * column expressions (scan-local, no shuffle except the final
  * summaries' small aggregations). */
object TextStats {

  /** Tiny per-language stopword lists (public common function words) —
    * deliberately minimal: the operator IS the n-gram/stopword-overlap
    * heuristic, not a trained model. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "不", "人", "这"))

  val EnStopwords: Seq[String] = StopwordLists.head._2

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Language ID by stopword-overlap argmax; ties and zero-hit docs fall
    * back to 'und' (undetermined), matching what an honest heuristic
    * should say about word-salad text. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = StopwordLists.foldLeft(graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("lang"), toks.as("toks"))) {
      case (df, (l, words)) => df.withColumn(s"hits_$l", hits(col("toks"), words))
    }
    val best = StopwordLists.map { case (l, _) => col(s"hits_$l") }
      .reduce((a, b) => greatest(a, b))
    val detected = StopwordLists.reverse.foldLeft(lit("und")) {
      case (acc, (l, _)) =>
        when(col(s"hits_$l") === best && best > 0, l).otherwise(acc)
    }
    scored.select(col("doc_id"), col("lang"), detected.as("detected"))
  }

  /** Summary: detected-language counts (tiny final aggregate). */
  def langIdSummary(docs: DataFrame): DataFrame =
    langId(docs).groupBy("detected").agg(count(lit(1)).as("n"))
      .orderBy("detected")

  /** Per-document quality signals: token count, mean token length,
    * punctuation ratio, stopword ratio, and a blended score — the
    * standard cheap filters before expensive model-based scoring. */
  def qualityScores(docs: DataFrame, maxId: Long): DataFrame = {
    val toks = tokens(col("text"))
    docs.where(col("doc_id") < maxId)
      .select(col("doc_id"), col("text"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        round(length(col("text")).cast("double") / size(col("toks")), 6)
          .as("mean_tok_len"),
        round(size(expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)"))
          .cast("double") / length(col("text")), 6).as("punct_ratio"),
        round(hits(col("toks"), EnStopwords).cast("double") / size(col("toks")), 6)
          .as("stopword_ratio"))
      // blended score: length saturation × cleanliness — the classic
      // cheap pre-filter shape (portable: least/round exist in DuckDB)
      .withColumn("quality", round(
        least(col("n_tokens").cast("double") / 50.0, lit(1.0)) *
          (lit(1.0) - col("punct_ratio")), 6))
      .orderBy("doc_id")
  }

  /** Token counts by source: whitespace tokens and BPE-ish regex tokens
    * (letter runs / digit runs / single punctuation — the shape a byte
    * pair encoder sees before merges). */
  def tokenCountsBySource(docs: DataFrame): DataFrame =
    graft.sources.Corpus.fanOutSmallScan(docs).select(col("source"),
        size(tokens(col("text"))).as("ws"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
          .as("bpe"))
      .groupBy("source")
      .agg(sum(col("ws")).as("ws_tokens"), sum(col("bpe")).as("bpe_tokens"))
      .orderBy("source")

  /** Exact document-length quantiles per language: the corpus-profiling
    * stats a curation pipeline reads before setting length filters.
    * percentile() is the EXACT (sort-based, linearly interpolated)
    * aggregate, matching DuckDB quantile_cont; at 100 TB swap in
    * percentile_approx (t-digest sketch — constant-size partials,
    * same plan shape) once the ±ε is acceptable. Grouping by lang
    * keeps each group's sort partition-local after one hash shuffle. */
  def docLengthQuantiles(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(percentile(col("n_chars"), lit(0.25)), 6).as("p25"),
        round(percentile(col("n_chars"), lit(0.5)), 6).as("p50"),
        round(percentile(col("n_chars"), lit(0.75)), 6).as("p75"),
        round(avg(col("n_chars")), 6).as("mean_chars"))
      .orderBy("lang")

  /** Top-k corpus terms by total occurrences (with document frequency) —
    * the vocabulary head a tokenizer-training or stopword-mining pass
    * reads first. explode → hash agg: the skewed keys ARE the head
    * terms, and map-side partial aggregation collapses them before the
    * shuffle (each mapper emits one partial per distinct term, so the
    * hot term costs ONE row per task, not one per occurrence); top-k is
    * TakeOrderedAndProject, never a global sort. countDistinct(doc_id)
    * adds the standard distinct-expand: fine at this cardinality; the
    * 100 TB spelling is approx_count_distinct for a one-pass plan. */
  def topTerms(docs: DataFrame, k: Int): DataFrame =
    graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)

  /** Per-source TF-IDF head: the k most source-characteristic terms —
    * the distinctive-vocabulary report a corpus-mixing decision reads
    * (q43's global head answers "what is common"; this answers "what is
    * DIFFERENT about src7"). tfidf = tf × ln(N/df) with tf counted per
    * (source, term) and df per term over the whole corpus.
    *
    * ONE tokenization pass feeds both statistics, with no self-join:
    * because every document belongs to exactly one source, the
    * (doc, term) pairs partition by source, so global df(term) is the
    * SUM of per-(source, term) distinct-doc counts — computed as a
    * window sum over the term partition of the one aggregate both
    * numbers grow from (a join-free decomposition; the naive
    * tf ⋈ df formulation optimizes its two branches apart and scans
    * the corpus twice). df is never a countDistinct expand: the
    * doc-level aggregate's rows ARE the distinct (doc, term) pairs.
    * Ranking happens on the ROUNDED score in BOTH engines with the
    * term as total tie-break, so the rank is insensitive to sub-ulp
    * libm differences in ln(). Residual parity risk (ADVICE r6): the
    * rounded VALUE itself flips if tf·ln(N/df) lands within 1 ulp of a
    * 1e-6 midpoint AND Spark's Math.log and the oracle's libm ln
    * disagree on that input — none of the corpus's (tf, N, df) triples
    * do, and the fixtures are frozen; if they ever unfreeze, rank and
    * hash on an integer surrogate (e.g. round(tf·ln·1e6) as BIGINT
    * with a coarser guard digit) instead. At 100 TB: the corpus
    * shuffles once as
    * (doc, term) partials collapsed map-side; everything after is
    * vocabulary-sized (the df window and the per-source top-k shuffle
    * scored terms, not documents). */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val st = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"), col("term"))
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("sdf"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    val scored = st
      .withColumn("df", sum(col("sdf")).over(W.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_total").cast("double") / col("df")), 6))
    val w = W.partitionBy(col("source")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("source"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rn"))
      .orderBy("source", "rn")
  }

  /** Unigram-model quality profile per source — the exact-arithmetic
    * form of the classic LM-based quality filter (CCNet-style): score
    * each document against the corpus's own unigram statistics and
    * aggregate per source. Two signals: the RARE-TOKEN RATE (fraction
    * of token instances whose corpus frequency is below
    * `rareThreshold` — the OOV/garble detector) and the median of
    * per-doc median term frequencies (low = exotic vocabulary). Both
    * are gate-exact by construction: integer counts, integer
    * comparisons, sort-based medians, ONE final divide — no log/exp,
    * whose cross-engine ulp drift the float-parity policy forbids in
    * aggregates (a true log-prob scorer is this plan plus ln() on the
    * already-joined count column; the PLAN is what matters at scale).
    *
    * One corpus pass, join-free: per-(doc, term) counts aggregate
    * once, the global term frequency is a window SUM over the term
    * partition (the q55 decomposition — model "training" and scoring
    * share one lineage instead of a corpus×vocab join), per-doc
    * medians run over each doc's DISTINCT terms. At 100 TB every
    * shuffle after the first carries (doc, term) partials or
    * doc-level rows, never raw tokens. */
  def unigramQuality(docs: DataFrame, rareThreshold: Long = 5L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val dt = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val perDoc = dt
      .withColumn("cnt", sum(col("c")).over(W.partitionBy(col("term"))))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c")).as("n_toks"),
        sum(when(col("cnt") < rareThreshold, col("c")).otherwise(0L))
          .as("n_rare"),
        percentile(col("cnt"), lit(0.5)).as("med_freq"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_rare")).cast("double") / sum(col("n_toks")), 6)
          .as("rare_token_rate"),
        round(percentile(col("med_freq"), lit(0.5)), 6).as("p50_med_freq"))
      .orderBy("source")
  }

  /** Lang × source crosstab via relational PIVOT — the corpus
    * composition matrix read before choosing mixture weights. Pivot
    * values are EXPLICIT (the fixed source list): Spark requires them
    * for a deterministic schema without an extra distinct pass, and at
    * 100 TB "discover the columns" is a full scan a curation config
    * should not pay — sources are a config-known enum. The plan is one
    * hash aggregate over (lang, source) partials expanded to columns;
    * absent combinations surface as 0, matching the oracle's
    * CASE-sum spelling. */
  def langSourceCrosstab(docs: DataFrame, sources: Seq[String]): DataFrame =
    docs.groupBy(col("lang"))
      .pivot("source", sources)
      .agg(count(lit(1)))
      .select(col("lang") +:
        sources.map(s => coalesce(col(s), lit(0L)).as(s)): _*)
      .orderBy("lang")

  /** Per-source repetition signals (the Gopher-style repetition
    * filters): duplicate-token fraction and top-bigram fraction,
    * aggregated as INTEGER numerator/denominator sums with a single
    * final divide — cross-row float summation is order-dependent
    * between engines, integer sums are exact, so parity holds at any
    * scale. Dataflow: per-doc token stats are scan-local; the bigram
    * mode needs one (doc, bigram) hash agg (map-side partials collapse
    * repeated bigrams — the repetitive docs this filter hunts are
    * exactly the ones that compress hardest) folded per doc, then per
    * source. Bigram total per doc is size-1, not a second aggregate.
    * Size guard: Spark's sequence(0, -1) runs BACKWARD (SCALE.md), so
    * sub-2-token docs get an explicit empty array; explode_outer keeps
    * them in the per-doc frame (zero repetition, not dropped). */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val base = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("source"), col("t"),
        size(col("t")).cast("long").as("n_toks"),
        (size(col("t")) - size(array_distinct(col("t")))).cast("long").as("n_dup"))
    val bigrams = when(size(col("t")) >= 2,
      expr("transform(sequence(0, size(t)-2), " +
        "i -> concat(element_at(t, i+1), ' ', element_at(t, i+2)))"))
      .otherwise(array().cast("array<string>"))
    val perDoc = base
      .select(col("doc_id"), col("source"), col("n_toks"), col("n_dup"),
        explode_outer(bigrams).as("bg"))
      .groupBy(col("source"), col("doc_id"), col("n_toks"), col("n_dup"), col("bg"))
      .agg(count(col("bg")).as("c"))
      .groupBy(col("source"), col("doc_id"), col("n_toks"), col("n_dup"))
      .agg(max(col("c")).as("max_bg"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_dup")).cast("double") / sum(col("n_toks")), 6)
          .as("dup_token_frac"),
        round(sum(col("max_bg")).cast("double") /
          sum(greatest(col("n_toks") - 1, lit(1L))), 6).as("top_bigram_frac"))
      .orderBy("source")
  }

  /** Approx-quantile tier + guard (q85): `percentile_approx` is THE
    * quantile path at 100 TB — a fixed-size mergeable one-pass sketch —
    * while exact percentile (q42) sorts per group and is its
    * correctness baseline. Sketch values are engine-specific, so (the
    * q39b HLL pattern applied to quantiles) the gate pins per-lang
    * counts and the EXACT median plus a boolean asserting the sketch's
    * rank-error contract: Greenwald–Khanna relative rank error
    * ε = 1/accuracy means the returned element's rank r obeys
    * |r − q·n| ≤ ε·n; verified against exact ranks from a second
    * aggregate (±1 discreteness slack). The oracle expects TRUE, so a
    * drifting sketch hash-mismatches. */
  def quantileGuard(docs: DataFrame, accuracy: Int = 100): DataFrame = {
    val eps = 1.0 / accuracy
    // materialized once: the agg subtree feeds BOTH the rank check and
    // the final join — left lazy, Spark would evaluate it as two
    // separate subplans, scanning the corpus and building both
    // percentile sketches twice. The frame is lang-count-sized.
    val agg = graft.sources.Corpus.fanOutSmallScan(docs)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        percentile(col("n_chars"), lit(0.5)).as("p50x"),
        percentile_approx(col("n_chars"), lit(0.5), lit(accuracy)).as("p50a"))
      .localCheckpoint(true)
    // exact ranks of the sketch's answer — the lang frame is tiny, so
    // Catalyst broadcasts it back over the corpus
    val ranks = docs.select(col("lang"), col("n_chars"))
      .join(broadcast(agg.select(col("lang"), col("p50a"))), "lang")
      .groupBy(col("lang"))
      .agg(sum(when(col("n_chars") < col("p50a"), 1L).otherwise(0L)).as("r_lt"),
        sum(when(col("n_chars") <= col("p50a"), 1L).otherwise(0L)).as("r_le"))
    agg.join(ranks, "lang")
      .select(col("lang"), col("n_docs"),
        round(col("p50x"), 6).as("p50_exact"),
        (col("r_lt") <= (lit(0.5) + eps) * col("n_docs") + 1 &&
         col("r_le") >= (lit(0.5) - eps) * col("n_docs") - 1)
          .as("within_bounds"))
      .orderBy("lang")
  }

  /** Per-document DEFLATE size — the model-free redundancy/quality
    * signal web-scale curation pipelines use (templated or word-salad
    * text compresses abnormally well or badly relative to prose).
    * One Deflater per PARTITION, reset between docs (the codec-seam
    * batch shape shared with Multimodal; JDK 17's Deflater releases
    * native state via Cleaner). Scan-local: no shuffle at any corpus
    * size; the signal column feeds whatever summary runs downstream. */
  /** One Deflater per partition, reset between inputs — shared by the
    * signal and the guard so the codec configuration cannot drift
    * between them. Returns the per-input deflated size function. */
  private def perPartitionDeflatedSize(): Array[Byte] => Long = {
    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](8192)
    bytes => {
      deflater.reset()
      deflater.setInput(bytes)
      deflater.finish()
      var n = 0L
      while (!deflater.finished()) n += deflater.deflate(buf)
      n
    }
  }

  def compressionSignal(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val deflatedSize = perPartitionDeflatedSize()
        it.map { case (id, src, text) =>
          val b = text.getBytes("UTF-8")
          (id, src, b.length.toLong, deflatedSize(b))
        }
      }.toDF("doc_id", "source", "n_bytes", "deflate_bytes")
  }

  /** Compression-signal guard (q98): deflate output is not
    * closed-form recomputable in another engine, so — the q85/q39b
    * audit-the-approximation pattern — the gate pins INVARIANTS the
    * real codec must satisfy, next to cross-checkable count columns:
    * (a) a doc concatenated with itself must deflate to LESS than two
    * separate copies (the LZ back-reference property: the second copy
    * is a match into the first — fails for any fake "compressor"
    * that's a linear function of input length), and (b) size bounds —
    * 0 < deflate_bytes ≤ n_bytes + 64 (deflate's stored-block
    * worst-case overhead on these doc sizes). Oracle expects TRUE
    * rows; Spark must run the real codec to produce them. */
  def compressionGuard(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perDoc = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
      .as[(Long, String, Long, String)]
      .mapPartitions { it =>
        val deflatedSize = perPartitionDeflatedSize()
        it.map { case (id, src, nChars, text) =>
          val b = text.getBytes("UTF-8")
          (id, src, nChars, b.length.toLong,
            deflatedSize(b), deflatedSize(b ++ b))
        }
      }
      .toDF("doc_id", "source", "n_chars", "n_bytes", "d1", "d2")
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        bool_and(col("d2") < lit(2L) * col("d1"))
          .as("double_copy_compresses"),
        // size-aware ceiling: deflate's stored-block fallback costs
        // ~5 bytes per 64 KiB block, so a flat n_bytes+64 bound would
        // flip FALSE on a large (~>800 KB) incompressible document
        // despite correct codec behavior (ADVICE r10); n_bytes/16384
        // over-provisions that per-block overhead safely
        bool_and(col("d1") > 0L &&
            col("d1") <= col("n_bytes") + 64L + col("n_bytes") / 16384L)
          .as("bounds_ok"))
      .orderBy("source")
  }

  /** Heavy-hitters sketch audit (q100): `stat.freqItems` is the
    * one-pass constant-memory frequent-items path at 100 TB (exact
    * q43-style top-k needs a vocabulary shuffle; the sketch needs
    * none and its driver-side result is ≤ 1/support items). Its
    * contract is a SUPERSET guarantee — every item more frequent than
    * support·N is returned, possibly with false positives — so the
    * audit (the q85/q39b pattern) pins exactly that: compute the TRUE
    * heavy hitters exactly, assert every one is in the sketch result,
    * and surface the exact counts for the cross-engine hash. Driver
    * work is bounded by construction: one count, one ≤1/support item
    * set, one missing-count. */
  def heavyHitterAudit(docs: DataFrame, support: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(explode(tokens(col("text"))).as("term"))
    // The SKETCH pass stays one-pass constant-memory over the raw
    // scan (the property being audited). The EXACT side aggregates to
    // vocabulary grain first and persists THAT — vocabulary-sized,
    // never token-sized — to serve the total, the heavy set, and the
    // membership check from one aggregation; released on the way out
    // (the returned frame is literal values, not a plan over it).
    val termCounts = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nTokens = termCounts.agg(sum(col("c"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      val sketch: Seq[String] = terms.stat.freqItems(Seq("term"), support)
        .head().getSeq[String](0)
      // integer-exact threshold: c > support·N spelled c·round(1/s) > N
      // (support is 1/k by convention here) — a float product would put
      // decimal-vs-double boundary behavior into the cross-engine gate
      val invSupport = math.round(1.0 / support)
      val trueHeavy = termCounts
        .where(col("c") * lit(invSupport) > lit(nTokens))
      val nHeavy = trueHeavy.count()
      val nMissing =
        if (sketch.isEmpty) nHeavy
        else trueHeavy.where(!col("term").isin(sketch: _*)).count()
      Seq((nTokens, nHeavy, nMissing == 0L))
        .toDF("n_tokens", "n_true_heavy", "all_heavy_in_sketch")
    } finally termCounts.unpersist(false)
  }

  /** Filter-funnel report (q83): the C4/Gopher-style quality-gate
    * summary a curation pipeline reads before dropping anything — per
    * source, how many documents survive each SUCCESSIVE filter. Rules
    * are integer-exact so the gate hash needs no float to cross
    * engines: length (n_toks ≥ minTokens) and repetition
    * (n_dup · 100 ≤ n_toks · maxDupPct — the fraction threshold
    * cross-multiplied into integers). The funnel is cumulative: a doc
    * counts toward pass_rep only if it also passed length, matching
    * how filters actually compose in a pipeline. Scan-local signals,
    * one partial+final aggregate — the same shuffle shape as q48. */
  def filterFunnel(docs: DataFrame, minTokens: Int,
                   maxDupPct: Int): DataFrame = {
    val t = split(col("text"), " ")
    val base = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("source"),
        size(t).cast("long").as("n_toks"),
        (size(t) - size(array_distinct(t))).cast("long").as("n_dup"))
    val passLen = col("n_toks") >= minTokens
    val passRep = passLen &&
      col("n_dup") * 100L <= col("n_toks") * maxDupPct
    base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(passLen, 1L).otherwise(0L)).as("n_pass_len"),
        sum(when(passRep, 1L).otherwise(0L)).as("n_pass_all"))
      .orderBy("source")
  }

  /** Collocation head: the k adjacent token pairs most over-represented
    * vs independence — lift(x,y) = c_xy·N / (c_x·c_y), the exp of PMI —
    * with a min-support floor. This is the statistic a tokenizer-merge
    * or phrase-mining pass ranks on (raw bigram frequency, q43-style,
    * just surfaces stopword pairs). Lift is used INSTEAD of log-PMI
    * deliberately: the ranking is identical (exp is monotone) and the
    * arithmetic stays exact — two int64 products and ONE double divide,
    * correctly rounded in both engines, where ln() would be at the
    * mercy of libm ulp drift (the float-parity policy).
    *
    * Scale shape: one (bigram) and one (unigram) hash aggregate over
    * the corpus — both collapse map-side, so each shuffle carries
    * vocabulary-sized partials, never token instances. The count join
    * is vocab×vocab-sized and the support floor prunes it before the
    * join; top-k is TakeOrderedAndProject (never a global sort). N
    * rides a one-row broadcast. c_xy·N overflows int64 only past ~10^9
    * occurrences × 10^9 tokens — at that corpus scale, pre-divide by
    * gcd or go DECIMAL(38). */
  def collocationHead(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    val toks = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(split(col("text"), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("c1"))
    val n = uni.agg(sum(col("c1")).as("n_total"))
    val bg = toks.where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> " +
          "struct(element_at(t, i+1) AS term_a, element_at(t, i+2) AS term_b))"))
        .as("b"))
      .select(col("b.term_a"), col("b.term_b"))
      .groupBy(col("term_a"), col("term_b")).agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    bg
      .join(uni.select(col("term").as("term_a"), col("c1").as("n_a")), "term_a")
      .join(uni.select(col("term").as("term_b"), col("c1").as("n_b")), "term_b")
      .crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("n_pair"),
        col("n_a"), col("n_b"),
        round((col("n_pair") * col("n_total")).cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  /** Sequence-length histogram: documents bucketed by token count
    * (width `bucketTokens`, open-ended top bucket at `maxBucket`) per
    * source — the distribution a context-budget decision reads before
    * setting chunking and packing parameters (q59/q46): if most docs
    * fit one context, packing dominates; a fat tail means chunking
    * dominates. Scan-local bucket assignment + one partial+final
    * aggregate; output is |sources × buckets| rows at any corpus size.
    * Integral div, integer counts — nothing to drift. */
  def seqLenHistogram(docs: DataFrame, bucketTokens: Int = 16,
                      maxBucket: Int = 8): DataFrame = {
    // guard like the sibling parameterized operators: x div 0 would
    // silently NULL-bucket every row under non-ANSI integral division
    require(bucketTokens > 0 && maxBucket >= 0,
      s"bucketTokens $bucketTokens must be > 0, maxBucket $maxBucket >= 0")
    docs
      .select(col("source"),
        // `div`, not `/`: Spark's Divide is always fractional
        expr(s"least(size(split(text, ' ')) div $bucketTokens, " +
          s"$maxBucket)").cast("long").as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "bucket")
  }

  /** Rolling-hash content fingerprints (polynomial mod 1e9+7). */
  def fingerprints(docs: DataFrame, maxId: Long): DataFrame =
    docs.where(col("doc_id") < maxId)
      .select(col("doc_id"), rollingFingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Interpolated bigram language-model score per source — the CCNet/
    * KenLM-style perplexity filter, self-scored against the corpus's
    * own counts (the production pattern trains on a clean reference
    * corpus; the dataflow is identical — swap the count tables).
    *
    * Model: the first token scores ln(cu(w0)/N); every following token
    * scores ln(λ·cb(w1,w2)/cctx(w1) + (1−λ)·cu(w2)/N), where cb is the
    * corpus bigram count, cctx(w1) the bigram-context total for w1,
    * cu the unigram count, N total tokens. Interpolation with the
    * unigram term means no zero probabilities (every scored bigram
    * exists in the model here; held-out scoring keeps the same guard).
    *
    * Cross-engine determinism (the part that makes this gateable):
    * ln() is the one libm call, taken ONCE per distinct bigram TYPE on
    * a bit-identical double (integer counts → IEEE divides/multiplies
    * in a fixed parenthesization), then immediately quantized to an
    * integer NANOLOG (round(ln·1e9) as BIGINT). All per-doc and
    * per-source accumulation is integer arithmetic — order-independent
    * and exact — with one final divide (the q57/q66 convention; a
    * float SUM across rows would be order-dependent between engines).
    *
    * Scale shape: token/bigram extraction is scan-local; counts are
    * map-side-combined hash aggregates at vocab / bigram-type
    * cardinality; the model is joined back to per-DOC bigram rows
    * (granularity doc×distinct-bigram, already collapsed) on the
    * bigram key, then everything folds to doc then source partials.
    * No shuffle ever carries raw text; hot bigram types are plain
    * aggregate keys (AQE-salted), never window partitions. */
  def bigramLmScores(docs: DataFrame, lambda: Double = 0.875): DataFrame = {
    // dyadic λ: 0.875 and 1−0.875 = 0.125 are exact in binary AND in
    // every literal-parse path (decimal or double) the oracle can take
    require(lambda > 0.0 && lambda < 1.0)
    val base = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        filter(tokens(col("text")), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) >= 1)
    // per-doc bigram rows, repeated bigrams collapsed (c)
    val bgd = base
      // size guard: sequence(1, 0) runs BACKWARD in Spark (SCALE.md) —
      // a single-token doc must yield an empty bigram list, not an
      // out-of-bounds element_at
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
    // model tables: bigram, context, unigram counts + the 1-row total
    val cb = bgd.groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("cb"))
    val cctx = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cctx"))
    val cu = base
      .select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val n = cu.agg(sum(col("cu")).as("n_corpus"))
    // one ln per distinct bigram type, quantized to integer nanolog
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
    // per-doc bigram contribution: integer Σ c · lp_nano
    val docBg = bgd.join(lpBg, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("lp_nano")).as("bg_nano"))
    // first-token unigram term
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

  /** Cross-corpus interpolated bigram LM scoring — the actual
    * CCNet/KenLM deployment shape: the model trains on a REFERENCE
    * partition (Wikipedia in CCNet; here the even doc_ids) and scores
    * a DIFFERENT target corpus, so out-of-vocabulary mass must exist.
    * q164's self-scored form never sees an unseen word; this form is
    * what a quality filter actually runs.
    *
    * Conventions (all integer-derived, the q164 NANOLOG discipline):
    *   - V = distinct model vocab; add-one unigram smoothing
    *     p_u(w) = (cu(w) + 1) / (N + V + 1)  — OOV words get cu = 0.
    *   - p(w2|w1) = λ·(cb/cctx, 0 when the context is unseen)
    *     + (1−λ)·p_u(w2); first token scores ln p_u(w0).
    *   - ONE ln per distinct TARGET bigram/word type → nanolog BIGINT;
    *     per-doc and per-source accumulation is exact integer sums.
    *
    * Output per target source: n_docs, avg_lp, p50_doc_lp, oov_rate
    * (fraction of target tokens outside the model vocab, 6 dp).
    *
    * Scale shape: model tables aggregate at vocab/bigram-type
    * cardinality and join the target's per-doc DISTINCT-bigram rows on
    * the bigram key (LEFT join — misses are the smoothed path, rows
    * never drop); the (N, V) scalars ride a 1-row broadcast. No
    * shuffle carries text. */
  def bigramLmCrossScores(model: DataFrame, target: DataFrame,
                          lambda: Double = 0.875): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0)
    def toks(df: DataFrame) = graft.sources.Corpus.fanOutSmallScan(df)
      .select(col("doc_id"), col("source"),
        filter(tokens(col("text")), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) >= 1)
    val mBase = toks(model)
    val tBase = toks(target)
    def bigrams(base: DataFrame) = base
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
    // model tables
    val cb = bigrams(mBase).groupBy(col("w1"), col("w2"))
      .agg(sum(col("c")).as("cb"))
    val cctx = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cctx"))
    val cu = mBase.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val nv = cu.agg(sum(col("cu")).as("n_model"),
      count(lit(1)).as("v_model"))
    // smoothed unigram nanolog per distinct TARGET word type (the ln
    // happens once per type, misses included via the LEFT join's 0)
    val pu = (cuc: org.apache.spark.sql.Column) =>
      (coalesce(cuc, lit(0L)).cast("double") + lit(1.0)) /
        (col("n_model").cast("double") + col("v_model").cast("double")
          + lit(1.0))
    // per-target-doc bigram contributions
    val tbg = bigrams(tBase)
    val lpBg = tbg.select(col("w1"), col("w2")).distinct()
      .join(cb, Seq("w1", "w2"), "left")
      .join(cctx, Seq("w1"), "left")
      .join(cu.withColumnRenamed("w", "w2").withColumnRenamed("cu", "cu2"),
        Seq("w2"), "left")
      .join(broadcast(nv))
      .select(col("w1"), col("w2"),
        round(log(
          lit(lambda) * when(col("cctx").isNotNull,
            coalesce(col("cb"), lit(0L)).cast("double")
              / col("cctx").cast("double")).otherwise(lit(0.0))
            + lit(1.0 - lambda) * pu(col("cu2")))
          * 1e9, 0).cast("long").as("lp_nano"))
    val docBg = tbg.join(lpBg, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("lp_nano")).as("bg_nano"))
    // first-token smoothed unigram + per-doc OOV token count
    val tTok = tBase.select(col("doc_id"), explode(col("tk")).as("w"))
      .join(cu, Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("cu").isNull, 1L).otherwise(0L)).as("n_oov"))
    val lpW0 = tBase.select(col("doc_id"), col("source"),
      element_at(col("tk"), 1).as("w0"))
      .join(cu.withColumnRenamed("w", "w0").withColumnRenamed("cu", "cu0"),
        Seq("w0"), "left")
      .join(broadcast(nv))
      .select(col("doc_id"), col("source"),
        round(log(pu(col("cu0"))) * 1e9, 0).cast("long")
          .as("w0_nano"))
    val perDoc = lpW0
      .join(docBg, Seq("doc_id"), "left")
      .join(tTok, Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_toks"), col("n_oov"),
        (col("w0_nano") + coalesce(col("bg_nano"), lit(0L))).as("doc_nano"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("doc_nano")).cast("double")
          / sum(col("n_toks")).cast("double") / 1e9, 6).as("avg_lp"),
        round(percentile(
          col("doc_nano").cast("double") / col("n_toks").cast("double") / 1e9,
          lit(0.5)), 6).as("p50_doc_lp"),
        round(sum(col("n_oov")).cast("double")
          / sum(col("n_toks")).cast("double"), 6).as("oov_rate"))
      .orderBy("source")
  }

  // ----- GOPHER-style per-document repetition admission (q187/q188) -----

  /** Gate-standard repetition thresholds, in PERMILLE so every
    * comparison is pure 64-bit integer arithmetic on both engines
    * (signal·1000 > threshold·denominator — no doubles anywhere in the
    * decision path). The SHAPE is the published MassiveText/Gopher
    * repetition-filter suite (duplicate-token fraction, top n-gram
    * character fraction for short n, duplicated n-gram character
    * fraction for long n); the VALUES are calibrated to this corpus's
    * signal distribution (measured at sf0.01: dup-token median 0.54 /
    * p95 0.69, top-2-gram p90 0.14 — Gopher's web-text 0.30/0.20 would
    * drop ~97% / keep ~99% respectively, i.e. not filter at all). */
  val RepDupTokPermille: Long = 650L
  val RepTopGramPermille: Seq[(Int, Long)] =
    Seq(2 -> 150L, 3 -> 180L, 4 -> 220L)
  val RepDupGramPermille: Seq[(Int, Long)] =
    Seq(5 -> 150L, 10 -> 100L)

  /** Docs with hash64(doc_id, "rep") % this == 0 get the stutter
    * plant (the [[Dedup.DeconBanner]] convention: the corpus has no
    * natural long-n-gram repetition, so the dup-5/dup-10 hit path
    * would otherwise never fire at any SF). */
  val RepPlantMod: Long = 5L

  /** Per-document repetition ADMISSION — the within-document member of
    * the quality tier (q47/q83 filter on composition, q184 on a
    * corpus-relative rarity percentile; this drops documents whose own
    * n-gram structure says "loop/boilerplate", the MassiveText
    * repetition suite):
    *
    *   - dup-token fraction:  (n_toks − n_distinct) / n_toks
    *   - top n-gram char fraction (n = 2,3,4): the maximum over
    *     grams of occurrences × char length, over length(text) — the
    *     gram maximizing the PRODUCT, i.e. the most chars attributable
    *     to any one gram (a long gram at count 2 can outscore a short
    *     one at count 3; Gopher's "most frequent n-gram" convention
    *     picks by count alone — same family, slightly different pick)
    *   - duplicated n-gram char fraction (n = 5,10): Σ over n-grams
    *     occurring ≥ 2 of count × char length / length(text)
    *
    * A document is dropped when ANY signal exceeds its permille
    * threshold; every comparison is integer (signal·1000 vs
    * permille·denominator), so the decision is bit-identical across
    * engines with no float rounding anywhere. With `plantRep`, docs
    * with hash64(doc_id,"rep") % [[RepPlantMod]] == 0 get their own
    * first 10 tokens appended 3× (mirrored verbatim in the oracle) so
    * the long-n-gram path fires at strength on every source.
    *
    * Output per source: n_in, independent per-signal flag counts
    * (n_flag_dup_tok / n_flag_top_gram / n_flag_dup_gram — a doc can
    * fire several), n_dropped, n_kept, and the '#gr' content-hash sum
    * certifying the kept corpus (the q141 convention).
    *
    * Scale shape: all signals are DOC-LOCAL — one tokenize pass, one
    * explode of the 5 gram families (~5× token volume, 8-byte-key
    * partial aggregation), two doc_id-keyed aggregations, and a
    * sources-cardinality rollup. No corpus×vocab join, no window over
    * the corpus, nothing all-pairs; the explode volume scales linearly
    * with the scan and every shuffle key starts with doc_id. */
  def repetitionAdmission(docs: DataFrame,
                          dupTokPermille: Long = RepDupTokPermille,
                          topGram: Seq[(Int, Long)] = RepTopGramPermille,
                          dupGram: Seq[(Int, Long)] = RepDupGramPermille,
                          plantRep: Boolean = true): DataFrame = {
    require(dupTokPermille >= 0L && topGram.nonEmpty && dupGram.nonEmpty)
    val stutter = concat_ws(" ",
      slice(filter(tokens(col("text")), t => length(t) > 0), 1, 10))
    val planted =
      if (!plantRep) docs.select(col("doc_id"), col("source"), col("text"))
      else docs.select(col("doc_id"), col("source"),
        when(hash64(col("doc_id").cast("string"), "rep") % RepPlantMod === 0,
          concat_ws(" ", col("text"), stutter, stutter, stutter))
          .otherwise(col("text")).as("text"))
    val base = graft.sources.Corpus.fanOutSmallScan(planted)
      .select(col("doc_id"), col("source"),
        (hash64(col("text"), "gr") % 1000000000L).as("th"),
        length(col("text")).cast("long").as("n_chars"),
        filter(tokens(col("text")), t => length(t) > 0).as("tk"))
      .select(col("doc_id"), col("source"), col("th"), col("n_chars"),
        col("tk"), size(col("tk")).cast("long").as("n_toks"),
        (size(col("tk")) - size(array_distinct(col("tk")))).cast("long")
          .as("n_dup"))
      .where(col("n_toks") >= 1)
    // one explode for all gram families: struct(n, gram), n ∈ {2,3,4,5,10}
    val ns = (topGram.map(_._1) ++ dupGram.map(_._1)).distinct.sorted
    val gramArr = concat(ns.map { n =>
      when(size(col("tk")) >= n,
        transform(sequence(lit(1), size(col("tk")) - (n - 1)),
          i => struct(lit(n).as("n"),
            concat_ws(" ", slice(col("tk"), i, lit(n))).as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
    }: _*)
    val gcnt = base
      .select(col("doc_id"), explode(gramArr).as("ng"))
      .groupBy(col("doc_id"), col("ng.n").as("n"), col("ng.g").as("g"))
      .agg(count(lit(1)).as("c"))
    val chars = col("c") * length(col("g")).cast("long")
    val sigAggs = topGram.map { case (n, _) =>
      max(when(col("n") === n, chars)).as(s"top$n")
    } ++ dupGram.map { case (n, _) =>
      sum(when(col("n") === n && col("c") >= 2, chars).otherwise(0L))
        .as(s"dup$n")
    }
    val sig = gcnt.groupBy(col("doc_id"))
      .agg(sigAggs.head, sigAggs.tail: _*)
    val sigCols = topGram.map(t => s"top${t._1}") ++
      dupGram.map(d => s"dup${d._1}")
    val perDoc = base.drop("tk")
      .join(sig, Seq("doc_id"), "left")
      .na.fill(0L, sigCols)
    val fDup = col("n_dup") * 1000L > col("n_toks") * dupTokPermille
    val fTop = topGram.map { case (n, p) =>
      col(s"top$n") * 1000L > col("n_chars") * p
    }.reduce(_ || _)
    val fDng = dupGram.map { case (n, p) =>
      col(s"dup$n") * 1000L > col("n_chars") * p
    }.reduce(_ || _)
    val flagged = perDoc.select(col("source"), col("th"),
      fDup.as("f_dup"), fTop.as("f_top"), fDng.as("f_dng"),
      (fDup || fTop || fDng).as("f_any"))
    flagged.groupBy(col("source")).agg(
      count(lit(1)).as("n_in"),
      sum(when(col("f_dup"), 1L).otherwise(0L)).as("n_flag_dup_tok"),
      sum(when(col("f_top"), 1L).otherwise(0L)).as("n_flag_top_gram"),
      sum(when(col("f_dng"), 1L).otherwise(0L)).as("n_flag_dup_gram"),
      sum(when(col("f_any"), 1L).otherwise(0L)).as("n_dropped"),
      sum(when(!col("f_any"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(!col("f_any"), col("th")).otherwise(0L)).as("kept_hash_sum"))
      .orderBy("source")
  }
}
