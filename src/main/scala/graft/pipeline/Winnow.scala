package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Winnowing tier — local document fingerprinting (Schleimer, Wilbur
  * & Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003) and everything built on the fingerprint table:
  * per-doc digests (q139), df-bounded copy-evidence pairs (q140),
  * ranked neighbors (q142), corpus APPLY (q145), and the persisted
  * bucketed fingerprint store with delta probe / ingest admission /
  * append-fold (q146/q149). Split out of [[Dedup]] mechanically
  * (r16 VERDICT task 7); shares its clustering core
  * ([[Dedup.minLabelComponents]]) and the q68 delta/base split
  * ([[Dedup.deltaSplit]]).
  */
object Winnow {
  // ----- winnowing fingerprints (local document fingerprinting) -----

  /** Winnowing parameters, referenced by the q139/q140 oracles so the
    * SQL recompute moves in lockstep: gram size k, window w (detection
    * guarantee t = w + k - 1 = 8 shared tokens), evidence df cap and
    * pair-report threshold. */
  val WinnowK = 5
  val WinnowW = 4
  val WinnowMod = 25L
  val WinnowMaxDf = 8
  val WinnowMinShared = 5L
  /** Stand-in ingest-batch modulus for the store-incremental tier
    * (q146): hash64(doc_id, "inc") % this == 0 → delta, the q68
    * convention. ~1/4 of the corpus so pair evidence straddles the
    * split at every SF. */
  val WinnowDeltaMod = 4L
  /** Ranked-neighbor depth for [[winnowTopNeighbors]] (q142). */
  val WinnowTopK = 3
  /** Span-collapse gap for [[winnowCopySpans]] (q150): two matched
    * fingerprint positions more than this many tokens apart belong to
    * separate copied spans. Set to the detection guarantee
    * t = w + k − 1: inside one genuinely copied region both documents
    * select identical fingerprints at most w grams apart (every
    * w-window holds a selected gram), so a gap beyond t implies an
    * intervening unshared stretch longer than winnowing can even
    * certify as copied — a separate span by the algorithm's own
    * resolution. */
  val WinnowSpanGap: Long = (WinnowW + WinnowK - 1).toLong

  /** Winnowed document fingerprints — the published local
    * fingerprinting algorithm (Schleimer, Wilbur & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash
    * every k-token gram POSITIONALLY, slide a window of w consecutive
    * gram hashes, keep each window's minimum. Guarantee: any token run
    * of length >= w + k - 1 shared by two documents yields at least
    * one shared fingerprint — sub-document copy detection at a tunable
    * density of ~2/(w+1) fingerprints per token, the granularity
    * whole-doc MinHash (q18/q19) cannot see and suffix arrays are too
    * expensive to provide at corpus scale.
    *
    * Tie-break: the LEFTMOST minimal hash per window (the paper's
    * density analysis prefers rightmost; any fixed rule preserves the
    * guarantee, and leftmost is what a lexicographic min over the
    * zero-padded (hash, pos) key gives — one string min instead of an
    * argmin struct, spelled identically in DuckDB for the oracle).
    * Adjacent windows usually select the same (hash, pos); the
    * DISTINCT collapses them, which is what bounds density.
    *
    * Scale shape: the gram scan is per-doc local (one native kernel
    * call per row); the only exchange is the window's hash-partition
    * by doc_id — narrow 16-byte rows, no skew risk beyond document
    * length itself. Output is the fingerprint table (doc_id, fp_hash,
    * fp_pos), ~2/(w+1) of token count — the artifact every downstream
    * overlap/provenance query joins against. */
  def winnowedFingerprints(docs: DataFrame, k: Int = WinnowK,
                           w: Int = WinnowW): DataFrame = {
    require(k >= 1 && w >= 1, s"k $k and w $w must be >= 1")
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    docs
      .select(col("doc_id"), posShingleHashes(col("text"), k, "wn").as("gs"))
      .select(col("doc_id"), size(col("gs")).as("n"),
        posexplode(col("gs")).as(Seq("pos", "g")))
      // zero-padded (hash, pos) key: lexicographic min == (min hash,
      // leftmost pos) because both fields are fixed-width digits
      .withColumn("sel", min(concat(
        lpad(col("g").cast("string"), 20, "0"),
        lpad(col("pos").cast("string"), 10, "0"))).over(wWin))
      // full windows only (window start pos has w grams left): the
      // paper defines exactly n - w + 1 windows
      .where(col("pos") <= col("n") - w)
      .select(col("doc_id"),
        substring(col("sel"), 1, 20).cast("long").as("fp_hash"),
        substring(col("sel"), 21, 10).cast("long").as("fp_pos"))
      .distinct()
  }

  /** [[winnowedFingerprints]] computed entirely WITHIN the row — an
    * array<struct<fp_hash, fp_pos>> column, bit-identical selection
    * (property-pinned): same '#wn' positional gram hashes (native
    * kernel), same zero-padded (hash, pos) string-min per window,
    * same full-windows-only bound and (hash, pos) distinct — but the
    * window min is a per-row HOF fold over the gram array instead of
    * a cross-row Window, so NO shuffle and NO window operator.
    *
    * This is the form a STREAMING scan needs (q158's ingest
    * admission: window functions are unsupported on streaming
    * DataFrames, and winnowing is per-doc local anyway — the batch
    * operator's window-by-doc_id is an implementation convenience,
    * not a data dependency) and what a SQL-surface function can
    * evaluate per row. Cost is the same O(grams × w) key
    * comparisons; the batch tier keeps the window spelling, which
    * shares the key strings across overlapping windows. */
  def winnowFpStructs(text: Column, k: Int = WinnowK,
                      w: Int = WinnowW): Column = {
    require(k >= 1 && w >= 1, s"k $k and w $w must be >= 1")
    val gs = posShingleHashes(text, k, "wn")
    val n = size(gs)
    val sels = when(n >= w, array_distinct(
      transform(sequence(lit(0), n - w), i =>
        array_min(transform(sequence(i + 1, i + w), j =>
          concat(lpad(element_at(gs, j).cast("string"), 20, "0"),
            lpad((j - 1).cast("string"), 10, "0")))))))
      .otherwise(array().cast("array<string>"))
    transform(sels, s => struct(
      substring(s, 1, 20).cast("long").as("fp_hash"),
      substring(s, 21, 10).cast("long").as("fp_pos")))
  }

  /** Per-document winnowing digest over a doc_id-mod sample — the q139
    * gate: fingerprint count plus hash- and position-sums, so the
    * oracle recompute pins the selection (which hashes) AND the
    * tie-break (which positions) bit-exactly. */
  def winnowFingerprintStats(docs: DataFrame, k: Int = WinnowK,
                             w: Int = WinnowW,
                             mod: Long = WinnowMod): DataFrame =
    winnowedFingerprints(docs.where(col("doc_id") % mod === 0), k, w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(col("fp_hash") % 1000000000L).as("fp_hash_sum"),
        sum(col("fp_pos")).as("fp_pos_sum"))
      .orderBy("doc_id")

  /** Cross-document copy detection over the winnowed fingerprint
    * table — pairs of documents sharing >= minShared fingerprints
    * through BOUNDED evidence: fingerprints held by more than maxDf
    * documents are dropped before pairing (boilerplate is not copy
    * evidence — the q138 lesson applied at design time: an unbounded
    * self-join on a corpus-universal fingerprint is quadratic).
    *
    * Join-FREE one-pass spelling. The naive form is a self-join of
    * the fingerprint table on fp_hash — which computes the whole
    * gram-scan + window subtree once per join side (the int8-audit
    * lesson: Spark does not share uncached subtrees) and shuffles the
    * table twice. Instead: a row_number cap of maxDf + 1 per
    * fingerprint (compiles to partial+final WindowGroupLimit, so a
    * boilerplate fingerprint's million holders never even reach the
    * exchange), collect the ≤ maxDf+1 doc list per fingerprint, keep
    * lists sized 2..maxDf (a truncated maxDf+1 list IS the df > maxDf
    * boilerplate case — dropped, bit-identical semantics to the df
    * filter), and explode the ≤ maxDf*(maxDf-1)/2 ordered pairs from
    * each tiny array. One winnow computation, no join anywhere;
    * output linear in distinct fingerprints by construction. */
  def winnowOverlapPairs(docs: DataFrame, k: Int = WinnowK,
                         w: Int = WinnowW, maxDf: Int = WinnowMaxDf,
                         minShared: Long = WinnowMinShared): DataFrame = {
    require(maxDf >= 2 && minShared >= 1, s"maxDf $maxDf / minShared $minShared")
    val wDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp_hash")).orderBy(col("doc_id"))
    winnowedFingerprints(docs, k, w)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .withColumn("rn", row_number().over(wDf))
      .where(col("rn") <= maxDf + 1)
      .groupBy(col("fp_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")).between(2, maxDf))
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** Ranked fingerprint neighbors — the SEARCH form of
    * [[winnowOverlapPairs]]: for every document with at least one
    * copy-evidence neighbor, the top-k neighbors by shared winnowed
    * fingerprints (ties broken by neighbor id). The attribution view:
    * "who did this document copy from, or get copied by" — read
    * before dropping or down-weighting a training doc that q140
    * flagged. Docs with no neighbor stay silent (q74's convention).
    *
    * Scale shape: the pair table is q140's (minShared = 1 — the rank
    * decides relevance, not a floor), symmetrized by exploding BOTH
    * orientations from each pair row in one map (a union of two
    * selects over the same frame would recompute the whole uncached
    * gram-scan + window + pair subtree per branch — the int8-audit
    * lesson again, measured: 12 WindowGroupLimit nodes in the
    * unioned plan vs 4 here), then ONE row_number per doc_id that
    * compiles to partial+final WindowGroupLimit — per-doc candidate
    * lists are cut to k map-side, so a hub document with thousands
    * of evidence pairs never ships them all to one reducer. */
  def winnowTopNeighbors(docs: DataFrame, k: Int = WinnowK,
                         w: Int = WinnowW, maxDf: Int = WinnowMaxDf,
                         topK: Int = WinnowTopK): DataFrame = {
    require(topK >= 1, s"topK $topK must be >= 1")
    val pairs = winnowOverlapPairs(docs, k, w, maxDf, minShared = 1L)
    val sym = pairs
      .select(explode(array(
        struct(col("doc_a").as("doc_id"), col("doc_b").as("nbr")),
        struct(col("doc_b").as("doc_id"), col("doc_a").as("nbr")))).as("e"),
        col("n_shared"))
      .select(col("e.doc_id").as("doc_id"), col("e.nbr").as("nbr"),
        col("n_shared"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("n_shared").desc, col("nbr"))
    sym.withColumn("rn", row_number().over(wRank))
      .where(col("rn") <= topK)
      .orderBy("doc_id", "rn")
  }

  /** WHERE the copied span lives — span-level attribution over the
    * winnow tier (r16 VERDICT task 1), the "matched substring" use
    * local fingerprinting exists to serve (SIGMOD'03 §5): for every
    * flagged pair (same pair set and n_shared as
    * [[winnowOverlapPairs]] by construction, property-pinned),
    * collapse the matched fingerprint positions into contiguous
    * runs — one row per (pair, side, run) with the run's inclusive
    * token interval [start_pos, end_pos] (end extends the last
    * matched gram by its k − 1 trailing tokens) and its
    * matched-position count. side 'a' locates the spans in doc_a's
    * token coordinates, 'b' in doc_b's — the human-review artifact
    * read before dropping a doc q140 flagged, and what makes the
    * store's fp_pos column earn its bytes.
    *
    * Runs break at position gaps > [[WinnowSpanGap]] (= t =
    * w + k − 1): within one copied region matched fingerprints sit at
    * most w grams apart (every w-window holds a selected gram, and a
    * region shared verbatim selects identically in both docs), so a
    * super-t gap is an unshared stretch beyond the detection
    * guarantee — a distinct span by the algorithm's own resolution.
    *
    * Scale shape: NO JOIN ANYWHERE — the naive spelling joins the
    * fingerprint table back onto flagged pairs twice, recomputing the
    * whole uncached gram-scan subtree per join side (the int8-audit
    * lesson); instead the position evidence rides the pair tier's own
    * one-pass per-fingerprint expansion. A dense_rank cap (compiles
    * to WindowGroupLimit — several positions per doc share one hash,
    * so row_number would miscount docs) bounds every fingerprint's
    * evidence at maxDf DISTINCT docs map-side BEFORE any pair
    * expansion, boilerplate hashes contribute no rows, and the island
    * collapse is a per-row array fold over each pair's bounded
    * position sets — three exchanges total (doc_id window, fp_hash
    * window + agg, pair agg), plan-pinned join-free in
    * PlanShapeSpec. */
  def winnowCopySpans(docs: DataFrame, k: Int = WinnowK,
                      w: Int = WinnowW, maxDf: Int = WinnowMaxDf,
                      minShared: Long = WinnowMinShared,
                      gap: Long = WinnowSpanGap): DataFrame = {
    require(gap >= 1, s"gap $gap must be >= 1")
    val agged = pairPositionSets(docs, k, w, maxDf, minShared)
    agged
      .select(col("doc_a"), col("doc_b"),
        explode(concat(shapedRuns("a", islandRuns(col("ps_a"), gap), k),
          shapedRuns("b", islandRuns(col("ps_b"), gap), k))).as("sp"))
      .select(col("doc_a"), col("doc_b"), col("sp.side").as("side"),
        col("sp.span_idx").as("span_idx"),
        col("sp.start_pos").as("start_pos"),
        col("sp.end_pos").as("end_pos"), col("sp.n_fps").as("n_fps"))
      .orderBy("doc_a", "doc_b", "side", "span_idx")
  }

  /** The span tier's shared pair-evidence stage: flagged pairs with
    * BOTH sides' sorted matched-position sets — one row per pair
    * (doc_a, doc_b, n_shared, ps_a, ps_b). Same pair set and n_shared
    * as [[winnowOverlapPairs]] by construction (property-pinned).
    * Consumed by [[winnowCopySpans]] (islands per pair+side) and
    * [[winnowScrubSpans]] (per-doc position union across pairs). */
  private def pairPositionSets(docs: DataFrame, k: Int, w: Int,
                               maxDf: Int, minShared: Long): DataFrame = {
    require(maxDf >= 2 && minShared >= 1,
      s"maxDf $maxDf / minShared $minShared")
    val wDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp_hash")).orderBy(col("doc_id"))
    // per-hash evidence WITH positions: max(dense_rank) == number of
    // DISTINCT docs, so BETWEEN 2 AND maxDf drops truncated
    // (boilerplate) hashes bit-identically to the q140 df filter
    val perHash = winnowedFingerprints(docs, k, w)
      .withColumn("dr", dense_rank().over(wDf))
      .where(col("dr") <= maxDf + 1)
      .groupBy(col("fp_hash"))
      .agg(sort_array(collect_list(struct(
          col("doc_id").as("d"), col("fp_pos").as("p")))).as("es"),
        max(col("dr")).as("n_docs"))
      .where(col("n_docs").between(2, maxDf))
    // each evidence element pairs with every OTHER distinct doc of
    // its hash, tagged with which SIDE of the ordered pair its
    // position belongs to — both coordinate systems in one expansion
    val docsOf = array_distinct(transform(col("es"), e => e.getField("d")))
    val matched = perHash
      .select(col("fp_hash"), explode(flatten(transform(col("es"), e =>
        transform(filter(docsOf, o => o =!= e.getField("d")), o =>
          struct(
            least(e.getField("d"), o).as("doc_a"),
            greatest(e.getField("d"), o).as("doc_b"),
            when(e.getField("d") < o, lit("a")).otherwise(lit("b"))
              .as("side"),
            e.getField("p").as("pos")))))).as("m"))
    matched
      .groupBy(col("m.doc_a").as("doc_a"), col("m.doc_b").as("doc_b"))
      .agg(count_distinct(col("fp_hash")).as("n_shared"),
        sort_array(collect_set(when(col("m.side") === "a", col("m.pos"))))
          .as("ps_a"),
        sort_array(collect_set(when(col("m.side") === "b", col("m.pos"))))
          .as("ps_b"))
      .where(col("n_shared") >= minShared)
  }

  /** Islands-and-gaps as a per-row array fold (shared by the corpus
    * and store span operators): over a SORTED position set, extend
    * the open run while the next position is within `gap`, else open
    * a new one. */
  private def islandRuns(ps: Column, gap: Long): Column = aggregate(ps,
    expr("CAST(array() AS array<struct<s: BIGINT, e: BIGINT, n: BIGINT>>)"),
    (acc, p) => {
      val last = element_at(acc, -1)
      when(size(acc) > 0 && p - last.getField("e") <= gap,
        concat(slice(acc, lit(1), size(acc) - 1), array(struct(
          last.getField("s").as("s"), p.as("e"),
          (last.getField("n") + 1L).as("n")))))
        .otherwise(concat(acc,
          array(struct(p.as("s"), p.as("e"), lit(1L).as("n")))))
    })

  /** Run list → (side, 1-based span_idx, token interval, count)
    * structs; end extends the last matched gram by its k − 1 trailing
    * tokens. */
  private def shapedRuns(side: String, rs: Column, k: Int): Column =
    transform(rs, (r, i) => struct(lit(side).as("side"),
      (i + 1).cast("long").as("span_idx"),
      r.getField("s").as("start_pos"),
      (r.getField("e") + (k - 1)).as("end_pos"),
      r.getField("n").as("n_fps")))

  /** APPLY the winnow copy-detection tier — the ship operator the
    * q140/q142 reports exist to inform, completing report→apply for
    * sub-document copy detection exactly as [[decontaminateCorpus13]]
    * (q141) completes it for decontamination: connected components
    * over the copy-evidence pair graph, keep the BEST member per
    * component (longest n_chars, ties to smallest doc_id — the
    * [[dedupByClustersKeepBest]] policy: retain the most complete
    * copy), drop the rest, and emit the per-source ship digest with a
    * content hash over the KEPT corpus so the gate certifies the
    * artifact a training run would read.
    *
    * Returns per-source: n_docs, n_flagged (docs with any copy
    * evidence), n_dropped, n_kept, kept_hash_sum ('#wk' 60-bit
    * content hash, mod 1e9, summed — order-independent). Invariant
    * (spec-pinned): n_kept + n_dropped == n_docs, and n_dropped ==
    * n_flagged − (number of components) per construction.
    *
    * Scale shape: the pair graph is [[winnowOverlapPairs]]' — join-
    * free, df-bounded, output O(distinct fingerprints) — and the
    * component solve is the shared [[minLabelComponents]] core
    * (size-gated driver union-find under 1M edges, the distributed
    * min-label loop above). Everything after clustering is sized by
    * FLAGGED docs, not the corpus: the keep-best window partitions by
    * component over cluster members only, the drop set anti-joins
    * back on 8-byte doc_ids, and the digest folds partially per
    * partition — certifying the artifact adds no extra exchange. */
  def winnowDedupCorpus(docs: DataFrame, k: Int = WinnowK,
                        w: Int = WinnowW, maxDf: Int = WinnowMaxDf,
                        minShared: Long = WinnowMinShared): DataFrame = {
    val clusters = Dedup.minLabelComponents(
        winnowOverlapPairs(docs, k, w, maxDf, minShared), "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("label").as("cluster"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val removed = clusters
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rn", row_number().over(wBest))
      .where(col("rn") =!= 1)
      .select(col("doc_id"))
    val bySource = docs.select(col("doc_id"), col("source"))
    val flagged = clusters.join(bySource, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_flagged"))
    val dropped = removed.join(bySource, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_dropped"))
    val kept = docs.join(removed, Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_kept"),
        sum(hash64(col("text"), "wk") % 1000000000L).as("kept_hash_sum"))
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(flagged, Seq("source"), "left")
      .join(dropped, Seq("source"), "left")
      .join(kept, Seq("source"), "left")
      .na.fill(0L, Seq("n_flagged", "n_dropped", "n_kept", "kept_hash_sum"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        col("n_dropped"), col("n_kept"), col("kept_hash_sum"))
      .orderBy("source")
  }

  /** Span-level SCRUB — the SURGICAL apply (r17 VERDICT task 1,
    * completing the tier): [[winnowDedupCorpus]] (q145) drops WHOLE
    * documents, but the span tier (q150/q154) locates exactly which
    * token intervals are copied — so cut the copied spans and KEEP
    * the remainder, the ExactSubstr convention (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022: remove the matched substring, not the document — a
    * novel paragraph following a quoted one survives).
    *
    * Policy: per q145's keep-best, the component's best member
    * (longest n_chars, ties to smallest doc_id) keeps its text WHOLE —
    * the corpus retains one intact copy of the shared material; every
    * OTHER member of the component is scrubbed: the union of its
    * matched positions across ALL its flagged pairs collapses into
    * islands (gap > t = w+k−1 splits, end extends k−1 trailing
    * tokens — the q150 span definition verbatim), and tokens inside
    * any island interval are removed. Spans are TOKEN-indexed and the
    * corpus contract is single-space separation, so the cut is
    * token-filter + single-space rejoin (coordinate mapping
    * spec-pinned). A fully-copied doc scrubs to near-empty — at most
    * w − 1 leading and trailing tokens outside the first/last
    * SELECTED fingerprint survive (winnowing certifies copies at its
    * own ~2/(w+1) resolution) — and is KEPT: cut the span, not the
    * doc.
    *
    * [[winnowScrubbedDocs]] returns the per-doc artifact itself —
    * one row per SCRUBBED doc: (doc_id, source, n_toks, n_kept,
    * new_text), the frame a pipeline writes back over the loser
    * docs. [[winnowScrubSpans]] (the q156 gate) digests it
    * per-source: n_docs, n_scrubbed, n_tokens_removed /
    * n_tokens_kept (over scrubbed docs), and scrubbed_hash_sum — the
    * '#ws' 60-bit content hash over the ENTIRE post-scrub corpus
    * (untouched docs hash their original text), certifying the
    * artifact a training run would read, exactly as q141's '#ka' and
    * q145's '#wk' digests do.
    *
    * Scale shape: the pair-evidence stage is the span tier's
    * (join-free, df-bounded) and is localCheckpoint'd — flagged-pairs-
    * sized — because BOTH the component solve and the position union
    * read it (Spark recomputes uncached subtrees per consumer: the
    * int8-audit lesson); everything downstream is sized by FLAGGED
    * docs — the keep-best window, the per-doc position union, the
    * per-row token filter — while untouched docs contribute one
    * narrow scan + partial-agg for the corpus hash. No operation in
    * the scrub path touches more than (flagged docs × their tokens). */
  def winnowScrubbedDocs(docs: DataFrame, k: Int = WinnowK,
                         w: Int = WinnowW, maxDf: Int = WinnowMaxDf,
                         minShared: Long = WinnowMinShared,
                         gap: Long = WinnowSpanGap): DataFrame = {
    require(gap >= 1, s"gap $gap must be >= 1")
    val pp = pairPositionSets(docs, k, w, maxDf, minShared)
      .localCheckpoint(true) // feeds the CC solve AND the position union
    val clusters = Dedup.minLabelComponents(
        pp.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("label").as("cluster"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val losers = clusters
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rn", row_number().over(wBest))
      .where(col("rn") =!= 1)
      .select(col("doc_id"))
    // per-doc union of matched positions across ALL flagged pairs,
    // then the q150 island collapse — ONE interval list per loser
    val spans = pp
      .select(explode(array(
        struct(col("doc_a").as("doc_id"), col("ps_a").as("ps")),
        struct(col("doc_b").as("doc_id"), col("ps_b").as("ps")))).as("e"))
      .groupBy(col("e.doc_id").as("doc_id"))
      .agg(sort_array(array_distinct(flatten(collect_list(col("e.ps")))))
        .as("ps"))
      .join(losers, "doc_id")
      .select(col("doc_id"), transform(islandRuns(col("ps"), gap), r =>
        struct(r.getField("s").as("s"),
          (r.getField("e") + (k - 1)).as("e"))).as("iv"))
    // the cut: token i survives iff no island interval covers it
    val toksIdx = transform(split(col("text"), " "),
      (t, i) => struct(t.as("t"), i.cast("long").as("i")))
    val keptToks = filter(toksIdx, s => !exists(col("iv"), r =>
      s.getField("i") >= r.getField("s") &&
        s.getField("i") <= r.getField("e")))
    docs.join(spans, "doc_id")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"),
        size(keptToks).cast("long").as("n_kept"),
        array_join(transform(keptToks, s => s.getField("t")), " ")
          .as("new_text"))
  }

  /** The q156 gate digest over [[winnowScrubbedDocs]] — see the
    * policy scaladoc above. */
  def winnowScrubSpans(docs: DataFrame, k: Int = WinnowK,
                       w: Int = WinnowW, maxDf: Int = WinnowMaxDf,
                       minShared: Long = WinnowMinShared,
                       gap: Long = WinnowSpanGap): DataFrame = {
    // loser-sized (flagged docs with their rebuilt texts), and read
    // by three consumers below — the untouched anti-join, the scrub
    // rollup, and the corpus hash
    val scrubbed = winnowScrubbedDocs(docs, k, w, maxDf, minShared, gap)
      .localCheckpoint(true)
    val un = docs.join(scrubbed.select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(sum(hash64(col("text"), "ws") % 1000000000L).as("hs_un"))
    val sc = scrubbed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_scrubbed"),
        sum(col("n_toks") - col("n_kept")).as("n_tokens_removed"),
        sum(col("n_kept")).as("n_tokens_kept"),
        sum(hash64(col("new_text"), "ws") % 1000000000L).as("hs_sc"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(un, Seq("source"), "left")
      .join(sc, Seq("source"), "left")
      .na.fill(0L, Seq("hs_un", "n_scrubbed", "n_tokens_removed",
        "n_tokens_kept", "hs_sc"))
      .select(col("source"), col("n_docs"), col("n_scrubbed"),
        col("n_tokens_removed"), col("n_tokens_kept"),
        (col("hs_un") + col("hs_sc")).as("scrubbed_hash_sum"))
      .orderBy("source")
  }

  /** Per-document scrub artifact (q162) — the reviewer-facing rows
    * BEHIND the q156 digest: every flagged non-winner doc with its
    * token accounting and a '#wd' 60-bit hash over the rebuilt text,
    * so each shipped scrubbed document is certified individually, not
    * only in per-source aggregate (a per-doc error that cancels in a
    * digest sum cannot hide here). Output is loser-sized; the rebuilt
    * texts themselves stay distributed — only their hashes surface. */
  def winnowScrubbedDocReport(docs: DataFrame, k: Int = WinnowK,
                              w: Int = WinnowW, maxDf: Int = WinnowMaxDf,
                              minShared: Long = WinnowMinShared,
                              gap: Long = WinnowSpanGap): DataFrame =
    winnowScrubbedDocs(docs, k, w, maxDf, minShared, gap)
      .select(col("doc_id"), col("source"), col("n_toks"), col("n_kept"),
        hash64(col("new_text"), "wd").as("scrubbed_hash"))
      .orderBy("doc_id")

  // ----- persisted winnow fingerprint store (incremental tier) -----

  /** Build the PERSISTED winnow fingerprint store — the q68/q99 band-
    * store discipline applied to the winnowing tier (r15 VERDICT
    * task 4). The fingerprint table (doc_id, fp_hash, fp_pos) is the
    * reusable provenance artifact at 100 TB: a nightly compaction
    * fingerprints the standing corpus ONCE and persists it BUCKETED
    * on fp_hash, so each day's ingest batch probes for sub-document
    * copies without re-fingerprinting the corpus and without
    * shuffling the base side — the bucketed scan already has the
    * probe join's partitioning; only the day's delta moves. fp_pos is
    * kept (not needed for pairing) because the store doubles as the
    * attribution artifact: WHERE in the base doc the copied span
    * lives. */
  def buildWinnowStore(base: DataFrame, table: String, path: String,
                       k: Int = WinnowK, w: Int = WinnowW,
                       nBuckets: Int = 16): Unit =
    winnowedFingerprints(base, k, w).write.mode("overwrite")
      .bucketBy(nBuckets, "fp_hash").sortBy("fp_hash")
      .option("path", path)
      .saveAsTable(table)

  /** One store build per (process, table, params, base fingerprint) —
    * the band-store stance (Verify/Bench run many queries in one
    * session; the nightly-artifact semantics are build-once-probe-
    * thereafter), HARDENED (r16 VERDICT task 4 + ADVICE): the memo
    * value is the signature the store was built with — winnow params
    * (k, w) AND a cheap base-corpus fingerprint (row count + max
    * doc_id, one narrow doc_id-column aggregate per probe call — the
    * price of never silently probing a stale store). A CHANGED base
    * at the same table+path rebuilds instead of probing yesterday's
    * fingerprints; different k/w never alias; and a fresh
    * SparkSession in the same JVM rebuilds too (the memo alone would
    * hit while the new session's catalog lacks the table — the
    * second-session hazard). The build serializes per location under
    * a per-key monitor ([[StoreOps.ensure]] — ADVICE r17: the old
    * single-map compute() held a CHM bin lock across the whole Spark
    * build, stalling probes of unrelated stores that hashed to the
    * same bin).
    *
    * The signature is ID-SET-shaped plus one cheap CONTENT MOMENT:
    * count + max + id-hash sum over doc_id, and — when the base
    * carries the corpus-standard `n_chars` metadata column —
    * sum(n_chars), all in ONE narrow aggregate per probe call (never
    * the text: a text-shaped fingerprint would re-read the whole base
    * per probe, exactly the scan the store exists to avoid at
    * 100 TB). The moment closes most of the remaining stale-guard gap
    * (ADVICE r17): an in-place text swap at an identical doc_id set
    * almost always moves total n_chars and now rebuilds. Residual
    * contract: a mutation preserving BOTH the id set and total
    * n_chars (or a base without n_chars) is not detected — rebuild
    * explicitly via [[buildWinnowStore]], the nightly maintenance
    * job's flow. */
  private[graft] def ensureWinnowStore(base: DataFrame, table: String,
                                       path: String, k: Int,
                                       w: Int): Unit = {
    val want = s"k=$k,w=$w," + baseSignature(base, "ws")
    StoreOps.ensure(s"$table@$path", want,
      base.sparkSession.catalog.tableExists(table)) {
      buildWinnowStore(base, table, path, k, w)
    }
  }

  /** The shared base-corpus signature (winnow AND band store memos):
    * id-set shape + the n_chars moment when available, one narrow
    * aggregate over metadata columns only. */
  private[pipeline] def baseSignature(base: DataFrame,
                                      seed: String): String = {
    val withNc = base.columns.contains("n_chars")
    val aggs = Seq(count(lit(1)), max(col("doc_id")),
      sum(hash64(col("doc_id").cast("string"), seed) % 1000000000L)) ++
      (if (withNc) Seq(sum(col("n_chars").cast("long"))) else Nil)
    val sig = base.agg(aggs.head, aggs.tail: _*).head()
    def at(i: Int, dflt: Long): Long =
      if (sig.isNullAt(i)) dflt else sig.getLong(i)
    s"n=${sig.getLong(0)},mx=${at(1, -1L)},hs=${at(2, 0L)}" +
      (if (withNc) s",nc=${at(3, 0L)}" else "")
  }

  /** Delta-vs-base sub-document copy detection THROUGH the persisted
    * fingerprint store — the asymmetric (ingest admission) form of
    * [[winnowOverlapPairs]], exactly as [[incrementalDedupViaBandStore]]
    * (q99) is the asymmetric form of the LSH pair tier: documents with
    * hash64(doc_id, "inc") % deltaMod == 0 stand in for the incoming
    * batch (the q68 split, hash not modulo — doc_id ranges correlate
    * with source); the rest are the standing corpus, fingerprinted
    * via the store. A delta doc pairs with every base doc sharing
    * >= minShared winnowed fingerprints through df-BOUNDED evidence,
    * where df is the BASE-side holder count — the store's view of
    * boilerplate (a production pipeline folds each admitted batch
    * into the store nightly, so base df is the durable definition;
    * delta-internal pairs are [[winnowOverlapPairs]]' job, not this
    * tier's).
    *
    * Scale shape: the base side streams out of the bucketed store —
    * the per-fingerprint doc-list aggregate rides the store's fp_hash
    * bucketing (no base Exchange, pinned in SkewAndBucketSpec); only
    * the delta's fingerprints shuffle. The df cap bounds every doc
    * list at maxDf before the join, so a boilerplate fingerprint in
    * the store never fans a probe out to its million holders —
    * output is <= maxDf rows per (delta doc, distinct fingerprint)
    * by construction. */
  def winnowStoreOverlap(docs: DataFrame, deltaMod: Long,
                         table: String, path: String,
                         k: Int = WinnowK, w: Int = WinnowW,
                         maxDf: Int = WinnowMaxDf,
                         minShared: Long = WinnowMinShared): DataFrame = {
    val (base, delta) = Dedup.deltaSplit(docs, deltaMod)
    ensureWinnowStore(base, table, path, k, w)
    winnowStorePairs(delta, table, k, w, maxDf, minShared)
  }

  /** Fold an admitted batch INTO the standing fingerprint store — the
    * nightly maintenance job the store's contract assumes: tomorrow's
    * ingest must see today's admitted documents as base. Bucketed
    * `insertInto` writes the new fingerprints into the table's own
    * (fp_hash, 16) bucket spec, so the no-base-shuffle probe property
    * survives appends (spec-pinned: probe-after-append ==
    * probe-of-rebuilt-store). */
  def appendWinnowStore(batch: DataFrame, table: String,
                        k: Int = WinnowK, w: Int = WinnowW): Unit =
    winnowedFingerprints(batch, k, w).write.mode("append")
      .insertInto(table)

  /** Compact the standing fingerprint store IN PLACE (r16 VERDICT
    * task 3): [[appendWinnowStore]] folds batches blindly, so a doc
    * re-appended (an ingest replay) duplicates (doc_id, fp_hash,
    * fp_pos) rows — probe CORRECTNESS survives (the pair tail starts
    * from DISTINCT (doc, fp_hash)) but store bytes and probe-scan
    * cost grow monotonically. Compaction = DISTINCT rewrite
    * PRESERVING the (fp_hash, nBuckets) bucket spec, through a
    * UNIQUE staging parquet dir (Spark refuses to overwrite a table
    * from a plan that reads it) with entry-sweep + finally-delete
    * crash-safety and a SINGLE-WRITER contract — see
    * [[StoreOps.compactBucketed]]. Spec-pinned: probe-before ==
    * probe-after, row count shrinks to distinct, the probe plan
    * keeps `Bucketed: true` with no base-side exchange, and a stale
    * pre-existing staging dir neither corrupts nor survives the
    * rewrite. */
  def compactWinnowStore(spark: SparkSession, table: String,
                         path: String, nBuckets: Int = 16): Unit =
    StoreOps.compactBucketed(spark, table, path, nBuckets,
      Seq("fp_hash"), Seq("doc_id", "fp_hash", "fp_pos"))

  /** ADMIT the ingest batch through the store — report→apply for the
    * incremental tier, exactly as q145 completes q140 and q141
    * completes q134: [[winnowStoreOverlap]] reports delta-vs-base
    * copy pairs; this drops every delta doc with copy evidence
    * against the standing corpus and emits the per-source admission
    * digest with a '#wa' content hash over the ADMITTED batch — the
    * artifact the ingest job actually appends. Policy: the BASE copy
    * wins (the standing corpus is already shipped/trained-on; an
    * incoming near-copy is the one to drop) — the asymmetric
    * counterpart of q145's keep-best, which arbitrates only within
    * the not-yet-shipped corpus.
    *
    * Scale shape: [[winnowStorePairs]]' (no base exchange, df-bounded
    * map-side) plus ONE anti-join of the batch against its own
    * flagged ids — ingest-batch-sized throughout. */
  def winnowStoreAdmit(docs: DataFrame, deltaMod: Long,
                       table: String, path: String,
                       k: Int = WinnowK, w: Int = WinnowW,
                       maxDf: Int = WinnowMaxDf,
                       minShared: Long = WinnowMinShared): DataFrame = {
    val (base, delta) = Dedup.deltaSplit(docs, deltaMod)
    ensureWinnowStore(base, table, path, k, w)
    val flagged = winnowStorePairs(delta, table, k, w, maxDf, minShared)
      .select(col("delta_doc").as("doc_id"))
    admitDigest(delta, flagged)
  }

  /** The q149 admission digest over an arbitrary flagged-id frame —
    * shared verbatim by the batch gate ([[winnowStoreAdmit]]) and the
    * STREAMING ingest admission (q158), which is what lets the
    * streaming gate share q149's oracle: same digest, same '#wa'
    * hash, only the flag TRANSPORT differs. */
  private[graft] def admitDigest(delta: DataFrame,
                                 flaggedIds: DataFrame): DataFrame = {
    val flagged = flaggedIds.select(col("doc_id")).distinct()
    val admitted = delta.join(flagged, Seq("doc_id"), "left_anti")
    val bySource = delta.select(col("doc_id"), col("source"))
    delta.groupBy(col("source")).agg(count(lit(1)).as("n_delta"))
      .join(flagged.join(bySource, "doc_id").groupBy(col("source"))
        .agg(count(lit(1)).as("n_copy_flagged")), Seq("source"), "left")
      .join(admitted.groupBy(col("source"))
        .agg(count(lit(1)).as("n_admitted"),
          sum(hash64(col("text"), "wa") % 1000000000L)
            .as("admitted_hash_sum")), Seq("source"), "left")
      .na.fill(0L, Seq("n_copy_flagged", "n_admitted", "admitted_hash_sum"))
      .select(col("source"), col("n_delta"), col("n_copy_flagged"),
        col("n_admitted"), col("admitted_hash_sum"))
      .orderBy("source")
  }

  /** Probe tail of [[winnowStoreOverlap]], exposed for the plan pin:
    * the base aggregate must scan bucketed (no Exchange below it);
    * only the delta side shuffles. */
  private[graft] def winnowStorePairs(delta: DataFrame, table: String,
                                      k: Int, w: Int, maxDf: Int,
                                      minShared: Long): DataFrame = {
    val basePerFp = storeDocLists(delta.sparkSession, table, maxDf)
    winnowedFingerprints(delta, k, w)
      .select(col("doc_id").as("delta_doc"), col("fp_hash")).distinct()
      .join(basePerFp, Seq("fp_hash"))
      .select(col("delta_doc"), explode(col("ds")).as("base_doc"))
      .groupBy(col("delta_doc"), col("base_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy("delta_doc", "base_doc")
  }

  /** The store's df-bounded per-fingerprint doc lists — the probe
    * tiers' shared base side (batch [[winnowStorePairs]] and the
    * q158 streaming probe's static frame). row_number cap at
    * maxDf + 1 BEFORE the collect (the q140 discipline): a
    * boilerplate fingerprint's million holders are cut to maxDf + 1
    * rows map-side (WindowGroupLimit riding the store's fp_hash
    * bucketing+sort), and a truncated maxDf+1 list IS the df > maxDf
    * case — dropped, bit-identical to the true-df filter. */
  private[graft] def storeDocLists(spark: SparkSession, table: String,
                                   maxDf: Int): DataFrame = {
    val wDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp_hash")).orderBy(col("doc_id"))
    spark.table(table)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .withColumn("rn", row_number().over(wDf))
      .where(col("rn") <= maxDf + 1)
      .groupBy(col("fp_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) <= maxDf)
  }

  /** Span-level attribution THROUGH the persisted store — the reason
    * the store keeps fp_pos at all (the q146 scaladoc's promise, now
    * an operator): for every delta-vs-base pair [[winnowStorePairs]]
    * flags — SAME df bound, SAME pair set by construction — WHERE the
    * copied span lives, in the incoming doc's token coordinates
    * (side 'delta') AND the standing corpus doc's (side 'base'). The
    * reviewer's artifact when ingest admission (q149) rejects a
    * document: which base doc it copies, and which token intervals on
    * each side.
    *
    * Scale shape: the base side aggregates per-fingerprint (doc, pos)
    * evidence lists FROM ITS BUCKETS — a dense_rank cap (several
    * positions per doc share one hash, so row_number would miscount
    * docs; compiles to WindowGroupLimit) rides the store's fp_hash
    * bucketing with no base Exchange, exactly the winnowStorePairs
    * pin; only the delta's fingerprints shuffle; base positions
    * explode from ≤ maxDf-doc lists map-side; the island collapse is
    * a per-row fold over each pair's bounded position sets. */
  def winnowStoreSpans(delta: DataFrame, table: String,
                       k: Int = WinnowK, w: Int = WinnowW,
                       maxDf: Int = WinnowMaxDf,
                       minShared: Long = WinnowMinShared,
                       gap: Long = WinnowSpanGap): DataFrame = {
    val wDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp_hash")).orderBy(col("doc_id"))
    // max(dense_rank) == distinct base docs: <= maxDf drops truncated
    // (boilerplate) hashes bit-identically to winnowStorePairs' filter
    val basePerFp = delta.sparkSession.table(table)
      .withColumn("dr", dense_rank().over(wDf))
      .where(col("dr") <= maxDf + 1)
      .groupBy(col("fp_hash"))
      .agg(sort_array(collect_list(struct(
          col("doc_id").as("bd"), col("fp_pos").as("bp")))).as("es"),
        max(col("dr")).as("n_docs"))
      .where(col("n_docs") <= maxDf)
    val agged = winnowedFingerprints(delta, k, w)
      .select(col("doc_id").as("delta_doc"), col("fp_hash"),
        col("fp_pos").as("dp"))
      .join(basePerFp, Seq("fp_hash"))
      .select(col("delta_doc"), col("fp_hash"), col("dp"),
        explode(col("es")).as("e"))
      .groupBy(col("delta_doc"), col("e.bd").as("base_doc"))
      .agg(count_distinct(col("fp_hash")).as("n_shared"),
        sort_array(collect_set(col("dp"))).as("ps_delta"),
        sort_array(collect_set(col("e.bp"))).as("ps_base"))
      .where(col("n_shared") >= minShared)
    agged
      .select(col("delta_doc"), col("base_doc"),
        explode(concat(
          shapedRuns("base", islandRuns(col("ps_base"), gap), k),
          shapedRuns("delta", islandRuns(col("ps_delta"), gap), k)))
          .as("sp"))
      .select(col("delta_doc"), col("base_doc"),
        col("sp.side").as("side"), col("sp.span_idx").as("span_idx"),
        col("sp.start_pos").as("start_pos"),
        col("sp.end_pos").as("end_pos"), col("sp.n_fps").as("n_fps"))
      .orderBy("delta_doc", "base_doc", "side", "span_idx")
  }

  /** [[winnowStoreSpans]] behind the q146 split + build-once memo —
    * the gate entry (q154), sharing the store with q146/q149/q152. */
  def winnowStoreSpanReport(docs: DataFrame, deltaMod: Long,
                            table: String, path: String,
                            k: Int = WinnowK, w: Int = WinnowW,
                            maxDf: Int = WinnowMaxDf,
                            minShared: Long = WinnowMinShared,
                            gap: Long = WinnowSpanGap): DataFrame = {
    val (base, delta) = Dedup.deltaSplit(docs, deltaMod)
    ensureWinnowStore(base, table, path, k, w)
    winnowStoreSpans(delta, table, k, w, maxDf, minShared, gap)
  }
}
