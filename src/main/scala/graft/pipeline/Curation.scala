package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and packing: benchmark decontamination and deterministic
  * stratified sampling.
  *
  * 100 TB design stance:
  *  - Decontamination is an equi-join on hashed shingles — a true
  *    benchmark eval side is small, AQE broadcasts it from its runtime
  *    size, and the 100 TB training side streams through without a
  *    shuffle; an eval side too big to broadcast degrades to a shuffle
  *    join with identical semantics. Strategy is left to the optimizer
  *    rather than hinted (see decontaminationSummary).
  *  - Sampling is scan-local: a deterministic content-independent hash
  *    on the stable key, compared against a per-stratum rate. No
  *    shuffle, no RNG state, reproducible across reruns/retries —
  *    which rand()-based sampling is NOT under task retry. */
object Curation {

  /** Corpus snapshot diff (q104): the audit an incremental pipeline
    * runs between corpus versions before re-training — per source,
    * how many documents were added, removed, modified, or unchanged.
    * One full-outer join on the stable key where each side carries
    * only (doc_id, source, sha256) — 64-byte hashes, never text — and
    * the classification is a scan-local CASE over null/hash patterns.
    * At 100 TB both snapshot projections shuffle once on doc_id; with
    * both snapshots bucketed by doc_id (the band-store stance, q99)
    * even that shuffle disappears. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), col("source").as("src_o"),
      sha2(col("text"), 256).as("h_o"))
    val n = newDocs.select(col("doc_id"), col("source").as("src_n"),
      sha2(col("text"), 256).as("h_n"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_n"), col("src_o")).as("source"),
        when(col("h_o").isNull, lit("added"))
          .when(col("h_n").isNull, lit("removed"))
          .when(col("h_o") =!= col("h_n"), lit("modified"))
          .otherwise(lit("unchanged")).as("change"))
      .groupBy(col("source"), col("change"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "change")
  }

  /** Benchmark decontamination: flag training documents that share any
    * k-token shingle with the eval split (here: doc_id % evalMod == 0
    * stands in for a benchmark table). Returns per-source counts of
    * training docs and contaminated docs.
    *
    * Dataflow: one shingle-hash pass over the corpus (the summary
    * branch prunes the hash column away, so hashing is NOT recomputed
    * there), distinct eval shingles semi-joined against train shingles,
    * hits folded back as a flag join. Shingles travel as 60-bit hashes
    * (hash64 seed "dc"), never strings — the oracle mirrors the same
    * hash, so parity is exact including any collision.
    *
    * Join strategy is deliberately LEFT TO THE OPTIMIZER: a true
    * benchmark eval set is tiny and Catalyst/AQE broadcasts it from its
    * runtime size — but this entry's modulo STAND-IN eval split is ~10%
    * of the corpus's distinct shingles, and a forced broadcast hint
    * would ship that set to every executor at any corpus scale (at the
    * 100 TB framing, far past any broadcast budget). AQE picks
    * broadcast when the eval side is genuinely small and a shuffle
    * join when it isn't — both with identical semantics. */
  def decontaminationSummary(docs: DataFrame, evalMod: Long,
                             k: Int = 3): DataFrame = {
    val withSh = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        shingleHashes(col("text"), k, "dc").as("hs"))
    val evalGrams = withSh.where(col("doc_id") % evalMod === 0)
      .select(explode(col("hs")).as("h")).distinct()
    val train = withSh.where(col("doc_id") % evalMod =!= 0)
    val contamIds = train
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .join(evalGrams, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    train
      .join(contamIds.withColumn("_hit", lit(1)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_contaminated"))
      .orderBy("source")
  }

  /** Contamination detail — the EVAL side of q44's summary: for each
    * contaminated benchmark document, how many training documents share
    * at least one k-shingle with it. This is the report an eval owner
    * reads to decide whether a benchmark item must be dropped (the
    * training-side summary says how dirty the corpus is; this says
    * which eval items are compromised and how badly). Same one-hash-
    * pass dataflow as decontaminationSummary; the distinct (eval doc,
    * train doc) pair set is O(true contamination), and only hashes
    * cross the join.
    *
    * Skew guard: a corpus-universal shingle (boilerplate present in
    * every doc) would join ~all eval rows against ~all train rows on
    * ONE hash key — the quadratic blowup the pair tiers cap with
    * boundedPairs. `maxShingleDf` drops shingles whose global document
    * frequency exceeds the cap BEFORE the join (a shingle in thousands
    * of documents is boilerplate, not contamination evidence — the
    * same reasoning as stopword removal). The default keeps the exact
    * semantics (no df pass, no filter) for the gate; at 100 TB set the
    * dial. */
  def contaminatedEvalDocs(docs: DataFrame, evalMod: Long,
                           k: Int = 3,
                           maxShingleDf: Long = Long.MaxValue): DataFrame = {
    val withSh = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), shingleHashes(col("text"), k, "dc").as("hs"))
    def prune(sh: DataFrame): DataFrame =
      if (maxShingleDf == Long.MaxValue) sh
      else {
        val all = withSh.select(explode(col("hs")).as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
          .where(col("df") <= maxShingleDf)
          .select(col("h"))
        sh.join(all, Seq("h"), "left_semi")
      }
    val evalSh = prune(withSh.where(col("doc_id") % evalMod === 0)
      .select(col("doc_id").as("eval_doc"), explode(col("hs")).as("h")))
    val trainSh = prune(withSh.where(col("doc_id") % evalMod =!= 0)
      .select(col("doc_id").as("train_doc"), explode(col("hs")).as("h")))
    evalSh.join(trainSh, Seq("h"))
      .select(col("eval_doc"), col("train_doc")).distinct()
      .groupBy(col("eval_doc"))
      .agg(count(lit(1)).as("n_train_hits"))
      .orderBy("eval_doc")
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences. The chunk-boundary formulation (cumulative token count
    * div budget, so a document may straddle two sequences — exactly
    * what production packers do, splitting at the boundary) keeps the
    * assignment a pure window expression: one running sum per stratum,
    * no stateful reset recursion. Ordering is (doc_id) within each
    * source stratum, so packing is deterministic and strata pack
    * independently — the window shuffles once on source, and at 100 TB
    * each stratum's running sum is per-partition after that shuffle;
    * for giant strata, sub-stratify the partition key (e.g.
    * (source, doc_id div 10^6)) to bound any single partition's sort.
    * Returns per-sequence stats: docs packed and token payload. */
  def packSequences(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    docs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .withColumn("_cum", sum(col("toks")).over(w))
      // the sequence a doc STARTS in: tokens before it, div budget —
      // INTEGRAL div (a double divide would lose exactness past 2^53
      // cumulative tokens, silent at exactly the scale that matters)
      .withColumn("seq", expr(s"(_cum - toks) div ${budgetTokens}L"))
      .groupBy(col("source"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy("source", "seq")
  }

  /** Source-pair content-overlap matrix: for every pair of sources, the
    * count of shared distinct 3-token shingles and the shingle Jaccard —
    * the corpus-level containment audit run before mixing sources into
    * a training blend (high overlap = one source largely contains the
    * other; its weight should be cut, or the pair deduped jointly).
    *
    * Dataflow: one shingle-hash pass, then ONE shuffle — group the
    * exploded (source, 8-byte hash) rows BY HASH and collect each
    * hash's distinct source set. Sources are a config-known enum, so
    * the per-hash set is O(|sources|) — tiny — and every (a<b) source
    * pair expands map-side from the sorted set; the old self-equi-join
    * spelling re-shuffled the deduped vocabulary TWICE more (both join
    * sides repartition by hash) for the same pair counts. Shared-pair
    * counts and per-source sizes both fold from the one grouped frame
    * (vocabulary-sized aggregates; the size table rides a broadcast).
    * Integer counts + one final divide = exact parity.
    * At 100 TB the vocabulary table dwarfs memory but not the shuffle;
    * for a cheaper audit, pre-filter `hash % m = 0` — uniform shingle
    * sampling that estimates the same Jaccard at 1/m the cost. */
  def sourceShingleOverlap(docs: DataFrame, k: Int = 3): DataFrame = {
    val byHash = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("source"),
        explode(shingleHashes(col("text"), k, "ov")).as("g"))
      .groupBy(col("g"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
    val sz = byHash.select(explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    // all (i<j) pairs of the sorted per-hash source set, expanded inline
    val pairs = byHash
      .where(size(col("ss")) > 1)
      .select(explode(expr(
        "flatten(transform(ss, (x, i) -> transform(" +
          "slice(ss, i + 2, size(ss)), " +
          "y -> struct(x AS source_a, y AS source_b))))")).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(sz.as("x")), col("source_a") === col("x.source"))
      .join(broadcast(sz.as("y")), col("source_b") === col("y.source"))
      .select(col("source_a"), col("source_b"), col("shared"),
        round(col("shared").cast("double") /
          (col("x.n") + col("y.n") - col("shared")), 6).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Document chunking: split each document into fixed-token windows
    * with overlap — the step between cleaning and tokenization in a
    * training-data pipeline (long documents must be cut to the model's
    * context budget; overlap preserves cross-boundary context). Chunk
    * starts are 0, stride, 2·stride, … while they land inside the
    * document (stride = chunkTokens − overlapTokens); the final chunk
    * may be shorter than chunkTokens. Entirely scan-local — tokenize,
    * generate starts, slice — so it parallelizes with the scan and
    * shuffles nothing; output is O(1/stride) rows per input token at
    * any corpus size. The trailing orderBy is gate determinism only —
    * a production chunker writes the exploded frame as-is. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int,
                     overlapTokens: Int): DataFrame = {
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap $overlapTokens must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("toks")) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(chunkTokens), size(col("toks")) - col("start"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Temperature-scaled source mixture weights: the blend table a
    * training run samples from. Each source's raw weight is
    * n_tokens^α with α = 0.5 (the multilingual-sampling temperature
    * trick: α < 1 up-weights small sources so the head doesn't drown
    * the tail); `epochs` is how many passes over the source the blend
    * implies (weight · total_tokens / n_tokens). α = 0.5 is spelled
    * sqrt() deliberately — IEEE sqrt is correctly rounded, so Spark
    * and the oracle agree bit-for-bit where pow(x, 0.5) might not.
    *
    * The √-sum DENOMINATOR is a cross-row double sum, which a window
    * `sum() OVER ()` would accumulate in engine-chosen order — the one
    * float-parity hazard in this operator. It is folded instead over
    * the per-source weights SORTED BY SOURCE (array_sort + sequential
    * aggregate, mirrored by the oracle's list_reduce over an ORDER BY
    * list), so both engines add the same ~|sources| doubles in the
    * same order: bit-exact, not merely close. Token totals stay
    * integer sums. One partial+final aggregate over the corpus; the
    * normalization fold runs over the POST-AGG frame (|sources| rows —
    * config-sized at any corpus scale, same stance as the q49 size
    * table) and rides back on a one-row broadcast. */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val grouped = docs
      .select(col("source"), size(tokens(col("text"))).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    val totals = grouped.agg(
      aggregate(
        array_sort(collect_list(struct(col("source"),
          sqrt(col("n_tokens").cast("double")).as("raw")))),
        lit(0.0), (acc, x) => acc + x.getField("raw")).as("denom"),
      sum(col("n_tokens")).as("tot_tokens"))
    val raw = sqrt(col("n_tokens").cast("double"))
    grouped.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(raw / col("denom"), 6).as("mix_weight"),
        round(raw / col("denom") * col("tot_tokens") / col("n_tokens"), 6)
          .as("epochs"))
      .orderBy("source")
  }

  /** Fixed-SIZE deterministic sample: exactly k documents per source —
    * the ones with the smallest hash64(doc_id) — vs the fixed-RATE
    * sampling of stratifiedSampleSummary. Hash-rank sampling is the
    * distributed spelling of "uniform k without replacement" that
    * stays reproducible under retries and incremental ingest (the k
    * smallest hashes of a grown corpus are a superset-stable choice,
    * unlike reservoir sampling whose state depends on arrival order).
    * The row_number-≤-k filter compiles to a WindowGroupLimit, so each
    * map partition forwards at most k rows per source into the window
    * shuffle — shuffle volume is O(k · sources · partitions), never
    * corpus-sized (same pushdown story as topTerms/tfidf). */
  def fixedKSample(docs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("hk"), col("doc_id"))
    docs
      .select(col("source"), col("doc_id"),
        hash64(col("doc_id").cast("string"), "fk").as("hk"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("source"), col("doc_id"), col("rn").cast("long").as("rn"))
      .orderBy("source", "rn")
  }

  /** Deterministic train/val/test split: every document is assigned by
    * hash64(doc_id) mod 100 — < trainPct train, < trainPct+valPct val,
    * else test — and the summary reports docs and tokens per
    * (source, split). The assignment is a pure function of the stable
    * key: task retries, re-runs, and incremental ingest land every doc
    * in the SAME split (rand()-based splitting does not survive any of
    * those), and no document can ever migrate between train and test as
    * the corpus grows — the leakage guarantee an eval pipeline actually
    * needs. Scan-local + one partial-agg shuffle of (source, split)
    * partials; no shuffle touches text. */
  def trainSplitSummary(docs: DataFrame, trainPct: Int = 80,
                        valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val h = hash64(col("doc_id").cast("string"), "split") % 100
    val split = when(h < trainPct, "train")
      .when(h < trainPct + valPct, "val").otherwise("test")
    docs
      .select(col("source"), split.as("split"),
        size(tokens(col("text"))).cast("long").as("toks"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy("source", "split")
  }

  /** Hash-shard balance audit: assign every document to one of nShards
    * output shards by hash64(doc_id) mod nShards — the deterministic
    * shard function a distributed writer uses (each shard is written
    * independently; no global sort, no coordination) — and report docs,
    * tokens, and the min/max document token count per shard. The point
    * of the audit is the balance numbers themselves: uniform hashing
    * bounds shard skew, and a shard whose token total drifts from the
    * mean flags either a hash problem or pathological doc-length skew.
    * Scan-local + one nShards-row aggregate, any corpus size. */
  def hashShardBalance(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0)
    docs
      .select((hash64(col("doc_id").cast("string"), "shard") % nShards)
          .as("shard"),
        size(tokens(col("text"))).cast("long").as("toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        min(col("toks")).as("min_doc_toks"), max(col("toks")).as("max_doc_toks"))
      .orderBy("shard")
  }

  /** Deterministic stratified sampling summary: keep a document iff
    * hash64(doc_id) mod 100 falls under its source's percentage (rates
    * override `defaultPct` per source). Reports kept/total per source.
    * The keep decision is a pure function of the stable key — re-runs,
    * task retries, and incremental ingest all sample the SAME rows,
    * unlike rand()-based sampling. */
  def stratifiedSampleSummary(docs: DataFrame, rates: Map[String, Int],
                              defaultPct: Int): DataFrame = {
    val pct = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (src, p)) => when(col("source") === src, lit(p)).otherwise(acc)
    }
    val keep = (hash64(col("doc_id").cast("string"), "samp") % 100 < pct)
      .cast("int")
    docs.select(col("source"), keep.as("_keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("_keep")).cast("long").as("n_sampled"))
      .orderBy("source")
  }

  /** Weighted sampling WITHOUT replacement, k per source — the
    * Efraimidis–Spirakis A-Res scheme with deterministic hash uniforms.
    * Each doc draws u = hash64(doc_id)/2^60 ∈ (0,1] and gets priority
    * key u^(1/w) (w = n_chars, the length-proportional weight a
    * token-budget mixer wants); the k largest keys per source are the
    * sample. Ranking on ln(u)/w is the same order (ln is monotone,
    * w > 0) without pow's double-rounding; the ROUNDED key (9 dp) is
    * what both engines rank on, doc_id breaking ties — the q55
    * convention that makes rank insensitive to libm's last ulp.
    *
    * Versus the siblings: stratifiedSampleSummary is fixed-RATE,
    * fixedKSample is uniform fixed-k; this is fixed-k with inclusion
    * probability ∝ weight — and, like them, a pure function of the
    * stable key, so retries and re-runs select the SAME rows (a
    * rand()-based weighted reservoir survives neither retries nor
    * partition reordering). Weight-scale invariance (2w ranks like w —
    * dyadic scaling divides the key exactly) is property-tested in
    * CurationProperties.
    *
    * Ranking is on the RAW key (both engines build it from the same
    * integer hash with the same IEEE divide sequence; ln's last-ulp
    * wobble can only flip a rank if two keys land within one ulp of
    * each other — a measure-zero hash collision — whereas rounding
    * before ranking creates tie blobs near 0 whose membership IS
    * ulp-sensitive). The emitted es_key is rounded to 9 dp for the
    * cross-engine hash.
    *
    * Scale shape: key computation is scan-local; row_number ≤ k
    * compiles to WindowGroupLimit (PlanShapeSpec pin), so each map
    * partition forwards at most k rows per source into the window
    * shuffle — O(k·sources·partitions), never corpus-sized. */
  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    val u = greatest(hash64(col("doc_id").cast("string"), "ws"), lit(1L))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val key = log(u) / col("n_chars").cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("_key").desc, col("doc_id"))
    docs
      .where(col("n_chars") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"),
        key.as("_key"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("source"), col("rn").cast("long").as("rn"),
        col("doc_id"), col("n_chars"), round(col("_key"), 9).as("es_key"))
      .orderBy("source", "rn")
  }

  /** PERCENTILE-based quality admission — the dynamic-threshold member
    * of the quality tier: the static filters (q47/q83) apply config
    * cutoffs; this derives each source's cutoff from its own score
    * distribution (drop the worst quartile BY SOURCE), the shape a
    * mixed-quality corpus actually needs — a web source's p75
    * rare-token rate is a book source's outlier.
    *
    * Score = per-doc rare-token rate (the q57 signal, made
    * SCALE-RELATIVE: a token is rare when cnt · rareDen < total corpus
    * tokens — an integer comparison on both engines; an absolute
    * cutoff would silently stop firing as the corpus grows, since
    * every count scales with it). Threshold = quantile_cont(q) of the
    * exact per-doc integer ratio per source (interpolated from
    * identically-derived doubles on both engines — the q42 parity).
    * Keep rate <= threshold: ties at the cutoff stay in. The ship
    * digest certifies the kept corpus with the '#qp' content-hash sum
    * (the q141 convention).
    *
    * Scale shape: one corpus pass to (doc, term) partials; the global
    * term frequency is a window SUM over the term partition (the
    * unigramQuality decomposition — no corpus×vocab join) and the
    * corpus-total token count a 1-row broadcast attach; doc rows
    * carry a pre-computed text hash so the digest never rejoins the
    * text; per-source thresholds are a sources-cardinality aggregate
    * broadcast back. */
  def qualityPercentileAdmission(docs: DataFrame, q: Double = 0.75,
                                 rareDen: Long = 500L): DataFrame = {
    require(q > 0.0 && q < 1.0 && rareDen >= 1L)
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

  // ----- DSIR-style importance resampling (q189/q190) -----

  /** Gate-standard DSIR parameters: 4096 hashed feature buckets (the
    * published recipe hashes unigrams+bigrams into a fixed bucket
    * space so the model is two count VECTORS, never a vocabulary), and
    * k = 5 sampled docs per source. */
  val DsirBuckets: Long = 4096L
  val DsirK: Int = 5

  /** Data Selection via Importance Resampling — the published DSIR
    * recipe (hashed n-gram bag-of-words importance weights + Gumbel
    * top-k sampling), the principled replacement for q166's
    * size-weighted sample when a TARGET distribution exists:
    *
    *   - features: unigrams AND bigrams hashed into [[DsirBuckets]]
    *     buckets (hash64 % B — the feature space is fixed-size, so the
    *     "model" is two B-length count vectors, broadcastable forever)
    *   - target = even doc_ids, raw = odd (the q178 model/target split)
    *   - log importance weight of a raw doc:
    *       lw = Σ_f c_doc(f) · [ln p_tgt(f) − ln p_raw(f)]
    *     with add-one smoothing p(f) = (c(f)+1)/(N+B); each ln is
    *     taken ONCE per bucket and nano-quantized (the q164 NANOLOG
    *     discipline), so per-doc weights are exact integer sums
    *   - sampling WITHOUT replacement ∝ exp(lw): Gumbel top-k — key =
    *     lw_nano + round(−ln(−ln(u))·1e9) with u the deterministic
    *     60-bit hash uniform (the q166 convention); the key stays an
    *     INTEGER so cross-engine ordering can never tie-break on a
    *     float ulp. Top k per source by (key desc, doc_id).
    *
    * Output: source, rn, doc_id, log_w (6 dp), key (6 dp), ordered by
    * (source, rn).
    *
    * Scale shape: one tokenize pass → (doc, bucket) partial-agg rows
    * (~2× token volume, 8-byte keys); the bucket model is a ≤B-row
    * aggregate carrying the (N_tgt, N_raw) scalars on a 1-row cross
    * join, broadcast back to the doc rows (never a corpus×vocab
    * join); per-source top-k is row_number ≤ k → partial+final
    * WindowGroupLimit. Output is O(k · sources). */
  def dsirResample(docs: DataFrame, k: Int = DsirK,
                   buckets: Long = DsirBuckets): DataFrame = {
    require(k >= 1 && buckets >= 2L)
    val base = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        (col("doc_id") % 2 === 0).as("is_tgt"),
        filter(tokens(col("text")), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) >= 1)
    // unigram + bigram features, hashed to buckets in the scan
    val grams = concat(
      col("tk"),
      when(size(col("tk")) >= 2,
        transform(sequence(lit(1), size(col("tk")) - 1),
          i => concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1))))
        .otherwise(array().cast("array<string>")))
    val feat = base
      .select(col("doc_id"), col("source"), col("is_tgt"),
        explode(grams).as("g"))
      .select(col("doc_id"), col("source"), col("is_tgt"),
        (hash64(col("g"), "ds") % buckets).as("f"))
      .groupBy(col("doc_id"), col("source"), col("is_tgt"), col("f"))
      .agg(count(lit(1)).as("c"))
    // bucket model: target/raw counts per bucket + the two totals on a
    // 1-row broadcast; one ln per (bucket, side), nano-quantized
    val totals = feat.agg(
      sum(when(col("is_tgt"), col("c")).otherwise(0L)).as("n_tgt"),
      sum(when(!col("is_tgt"), col("c")).otherwise(0L)).as("n_raw"))
    val lr = feat.groupBy(col("f")).agg(
      sum(when(col("is_tgt"), col("c")).otherwise(0L)).as("ct"),
      sum(when(!col("is_tgt"), col("c")).otherwise(0L)).as("cr"))
      .join(broadcast(totals))
      .select(col("f"),
        (round(log((col("ct").cast("double") + lit(1.0)) /
          (col("n_tgt").cast("double") + lit(buckets.toDouble))) * 1e9, 0)
          .cast("long")
          - round(log((col("cr").cast("double") + lit(1.0)) /
            (col("n_raw").cast("double") + lit(buckets.toDouble))) * 1e9, 0)
            .cast("long")).as("lr_nano"))
    val lw = feat.where(!col("is_tgt"))
      .join(broadcast(lr), Seq("f"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c") * col("lr_nano")).as("lw_nano"))
    // Gumbel top-k per source on the INTEGER key
    val u = greatest(hash64(col("doc_id").cast("string"), "dsg"), lit(1L))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val keyed = lw.withColumn("key_nano",
      col("lw_nano") + round(-log(-log(u)) * 1e9, 0).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("key_nano").desc, col("doc_id"))
    keyed
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col("source"), col("rn"), col("doc_id"),
        round(col("lw_nano").cast("double") / 1e9, 6).as("log_w"),
        round(col("key_nano").cast("double") / 1e9, 6).as("key"))
      .orderBy("source", "rn")
  }
}
