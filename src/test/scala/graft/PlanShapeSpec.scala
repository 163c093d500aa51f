package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale-critical physical properties
  * the scaladocs claim, pinned so a refactor can't silently lose them.
  * (Shapes audited via ExplainTool; see SCALE.md.) */
class PlanShapeSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  /** Like [[plan]], but with every InMemoryTableScan's CACHED plan
    * expanded (each distinct cached relation once) — a persisted
    * subtree otherwise hides its scan/join shape behind the cache
    * node, and the q136 pin needs to see inside it. */
  private def expandCached(
      plan: org.apache.spark.sql.execution.SparkPlan): String = {
    def expand(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
      val cached = p.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          s.relation.cachedPlan
      }
      p.toString +: cached.flatMap(expand)
    }
    // distinct: the two rankings read the SAME cached relation — its
    // plan text must appear (and be counted) once
    expand(plan).distinct.mkString("\n")
  }

  test("q12: l_shipdate filter pushes into the parquet scan; partial+final agg") {
    val p = plan("q12_lineitem_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("HashAggregate"))
  }

  test("q13: broadcast join on the 25-row dim; top-k via TakeOrderedAndProject") {
    val p = plan("q13_top_nations")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q19 LSH: equi-join on band buckets — no cartesian, no BNLJ") {
    val p = plan("q19_lsh_near_dups")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q109 pure-SQL LSH keeps the banded shape: no cartesian, no BNLJ") {
    // the SQL spelling must inherit the Scala operator's scale shape,
    // not just its answers: candidates come from the band-bucket
    // group-by, verification joins on candidate ids — nothing all-pairs
    val p = plan("q109_sql_lsh_near_dups")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q22 cosine top-k: 1-row broadcast attach + TakeOrderedAndProject, no shuffle of the scan side") {
    val p = plan("q22_cosine_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastExchange"))
    // the only exchange is the broadcast of the single query vector
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("q29 cosine near-dups: bucket-collect — no join carries the embedding arrays") {
    // the pair table is session-cached (built eagerly at construction);
    // this pins the probe surface — the bucket-collect BUILD shape is
    // structurally shared with q35, whose plan is pinned uncached below
    val p = plan("q29_cosine_near_dups")
    assert(!p.contains("Join")) // one groupBy shuffle, zero joins
    assert(!p.contains("CartesianProduct"))
  }

  test("q18/q20: the native hash kernels are in the plan (not HOF spellings)") {
    val p18 = plan("q18_minhash_signatures")
    assert(p18.contains("affine_minhashes(hash_tokens("))
    assert(!p18.contains("transform(")) // no interpreted HOF hashing left
    val p20 = plan("q20_simhash")
    assert(p20.contains("simhash64(hash_tokens("))
  }

  test("q33: hamming filtered before a hash-based distinct — no wide sort-aggregate") {
    val p = plan("q33_simhash_near_dups")
    assert(!p.contains("SortAggregate"))
    assert(!p.contains("Join"))
  }

  test("q16 exact dedup: map-side partial aggregation before the hash shuffle") {
    val p = plan("q16_exact_dedup")
    assert(p.contains("HashAggregate(keys=[source"))
  }

  test("q41 sessionize: both windows and the session agg share ONE data shuffle") {
    val p = plan("q41_sessionize")
    // exactly two exchanges: the user_id hash partitioning (reused by
    // lag, running sum, AND the (user_id, _sess) aggregate — same-key
    // co-location) and the final output sort
    assert("Exchange".r.findAllIn(p).length == 2)
    assert(p.contains("Window"))
    assert(!p.contains("Join"))
  }

  test("q44 decontamination: the training side never shuffle-joins — broadcast semi + flag only") {
    val p = plan("q44_decontamination")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q45 stratified sample: scan-local keep decision — no joins, partial+final agg") {
    val p = plan("q45_stratified_sample")
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate(keys=[source"))
  }

  test("q43 top terms: skew-safe partial agg collapses hot terms map-side; top-k never global-sorts") {
    val p = plan("q43_top_terms")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("HashAggregate(keys=[term"))
  }

  test("q47 json props: extraction is scan-local (codegen'd path walk), no joins, partial+final agg") {
    val p = plan("q47_json_props")
    assert(p.contains("get_json_object"))
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate"))
  }

  test("q48 repetition: hash aggregates all the way down — no sort-agg, no joins") {
    val p = plan("q48_repetition")
    assert(!p.contains("Join"))
    assert(!p.contains("SortAggregate"))
    assert(p.contains("HashAggregate"))
  }

  test("q49 source overlap: one vocab shuffle, pairs expand map-side — no vocabulary join") {
    val p = plan("q49_source_overlap")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin")) // the old self-join re-shuffled the vocab twice
    assert(p.contains("BroadcastHashJoin")) // the tiny per-source size table
    assert(p.contains("ObjectHashAggregate")) // collect_set by hash, never sort-agg
  }

  test("q50 moving avg: window runs over the aggregated daily frame, not raw events") {
    val p = plan("q50_moving_avg")
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate")) // daily partial+final BEFORE the window
    assert(p.contains("Window"))
  }

  test("q51 argMax: one partial+final struct-max aggregate — no window, no join, one data shuffle") {
    val p = plan("q51_arg_max")
    assert(!p.contains("Window"))
    assert(!p.contains("Join"))
    // Spark plans max(struct(...)) as SortAggregate (struct agg buffers
    // are not hash-aggregable) — but it is STILL partial+final with
    // map-side combine, so the shuffle carries one partial row per
    // (partition, user), which is the property that matters at scale.
    assert(p.contains("SortAggregate(key=[user_id"))
    // two exchanges only: the user_id partial shuffle + the output sort
    assert("Exchange".r.findAllIn(p).length == 2)
  }

  test("q123 paragraph dedup: keeper via partial+final agg — NO window over the content key") {
    val p = plan("q123_paragraph_dedup")
    // the skew-safe claim: a row_number window would put every
    // occurrence of a hot boilerplate key in ONE partition; the
    // min-struct aggregate folds hot keys map-side instead
    assert(!p.contains("Window"))
    // the keeper is a struct-min aggregate (SortAggregate partial+
    // final, the q51 pattern) keyed on the 64-byte content hash
    assert(p.contains("SortAggregate(key=[h"))
    // no cartesian anywhere; the keeper join is an equi-join on h
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q123/q126 keeper propagate: cold join distributes on (h, salt); hot keepers ride a broadcast") {
    for (q <- Seq("q123_paragraph_dedup", "q126_paragraph_dedup_hotkey")) {
      val p = plan(q)
      // the cold keeper join's DISTRIBUTION keys must include the salt
      // — a constant-folded `salt = 0` residual condition would demote
      // the key set to h alone and re-serialize hot keys into one task
      assert("""Join \[h#\d+, salt#\d+\]""".r.findFirstIn(p).nonEmpty,
        s"$q: keeper join does not key on (h, salt):\n${p.take(2000)}")
      // the hot keeper set reaches the paras side by broadcast (never
      // a shuffle of the occurrences)
      assert(p.contains("BroadcastHashJoin"), q)
    }
  }

  test("q54 retention: one event-volume shuffle (user_id collect_set) — no joins, no windows") {
    val p = plan("q54_retention")
    assert(!p.contains("Join"))
    assert(!p.contains("Window"))
    // collect_set is an ObjectHashAggregate, partial+final (map-side
    // combine of per-user day sets before the only data shuffle)
    assert(p.contains("ObjectHashAggregate"))
    // exactly three exchanges: user_id shuffle, (cohort, offset) agg,
    // output sort — none of them carry raw events
    assert("Exchange".r.findAllIn(p).length == 3)
  }

  test("q55 tfidf: ONE corpus scan (join-free df decomposition) + rank-limit pushdown") {
    val p = plan("q55_tfidf_terms")
    // two parquet scans total: the corpus and the 1-row n_total count —
    // the naive tf⋈df formulation scans+tokenizes the corpus twice
    assert("Scan parquet".r.findAllIn(p).length == 2)
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("ShuffledHashJoin"))
    // per-source top-k is rank-limit-pushed (partial WindowGroupLimit
    // before the source exchange), never a global sort of the vocab
    assert(p.contains("WindowGroupLimit"))
  }

  test("q56 pivot: one hash aggregate on lang — no joins, no expand per source") {
    val p = plan("q56_lang_source_pivot")
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate(keys=[lang"))
  }

  test("q57 unigram quality: join-free model scoring — one corpus scan, window-decomposed frequencies") {
    val p = plan("q57_unigram_quality")
    assert(!p.contains("Join")) // training and scoring share one lineage
    assert("Scan parquet".r.findAllIn(p).length == 1)
    assert(p.contains("Window"))
  }

  test("q58 embedding dedup: bucketed pair generation — no cartesian, no BNLJ, anti-join sized by true dups") {
    val p = plan("q58_embedding_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q52 funnel: single shuffle on user_id — no self-joins of the fact table") {
    val p = plan("q52_funnel")
    assert(!p.contains("Join"))
    // exactly two exchanges: the user_id grouping + the tiny depth agg
    assert("Exchange".r.findAllIn(p).length <= 3)
  }

  test("q59 chunking: scan-local slice — no joins, no aggregates, no data shuffle") {
    val p = plan("q59_chunk_documents")
    assert(!p.contains("Join"))
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"))
    // the only exchange is the gate-determinism sort's range partitioning
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("q60 mixture weights: one partial+final corpus agg; totals ride a one-row broadcast") {
    val p = plan("q60_mixture_weights")
    assert(p.contains("HashAggregate(keys=[source"))
    // the sorted-fold denominator comes back as a ONE-ROW broadcast
    // cross join over the |sources|-row aggregated frame — the only
    // join in the plan, and its build side is a single row
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("Window")) // no engine-ordered window sum anywhere
  }

  test("q62 fixed-k sample: rank filter pushes a WindowGroupLimit below the shuffle") {
    val p = plan("q62_fixed_k_sample")
    assert(p.contains("WindowGroupLimit"))
    assert(!p.contains("Join"))
  }

  test("q63 quantization error: scan-local scoring — no joins, no array through a shuffle") {
    val p = plan("q63_quantization_error")
    assert(!p.contains("Join"))
    // the shuffle carries (label, qerr) doubles, never the embedding
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
  }

  test("q135 13-gram decontamination: hit test is a semi-join of 8-byte hashes — no cartesian, no BNLJ") {
    val p = plan("q135_decontamination_planted")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // shingles hash scan-side through the native kernel — only 8-byte
    // hashes reach the join, never shingle text
    assert(p.contains("hash_tokens("))
  }

  test("q138 eval detail: inner equi-join of 8-byte hashes — no cartesian, no BNLJ, distinct-counts after the prune") {
    val p = plan("q138_contaminated_evals13")
    // the per-eval-doc detail joins eval×train pairs on the 60-bit
    // shingle hash — an equi-join whose output is O(true
    // contamination); never a cartesian, and only 8-byte hashes
    // (scan-side hash_tokens) cross it, never shingle text
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("hash_tokens("))
    // the bounded-evidence cap (≤64 train docs per shingle) compiles
    // to partial+final WindowGroupLimit — each map task ships at most
    // 64 rows per shingle into the g-shuffle, so a banner-grade
    // boilerplate shingle can never rebuild the E×T clique that the
    // unbounded spelling spilled >37 GB on at sf10
    assert(p.contains("WindowGroupLimit"))
    // both count_distinct aggregates sit ABOVE the join (partial
    // distinct expand/aggregate), so the wide work is bounded by the
    // join's contamination-sized output
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
  }

  test("q141 decontaminate apply: semi-join hit set, anti-join keep — no cartesian, hashes only") {
    val p = plan("q141_decontaminate_apply")
    // the ship path is the report's LeftSemi (train hashes vs the
    // eval suite) plus ONE LeftAnti on doc_id — both 8-byte equi-joins
    assert(p.contains("LeftSemi"))
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("hash_tokens("))
  }

  test("q139 winnowing: scan-local gram kernel; the only exchange is the doc_id window partition") {
    val p = plan("q139_winnow_fingerprints")
    // positional gram hashing rides the scan (native kernel); the
    // window min hash-partitions by doc_id — narrow (doc_id, pos, g)
    // rows — and nothing joins
    assert(p.contains("hash_shingle_seq("))
    assert(!p.contains("Join"))
    assert(p.contains("Window"))
  }

  test("q140 winnow overlap: join-FREE one-pass pairing; df cap is a WindowGroupLimit") {
    val p = plan("q140_winnow_overlap")
    assert(p.contains("hash_shingle_seq("))
    // ONE winnow computation (the self-join spelling computed the
    // gram-scan + window subtree per side), no join of any kind:
    // pairs explode from <= maxDf-element per-fingerprint doc lists
    assert(!p.contains("Join"))
    // the row_number cap (maxDf + 1 per fingerprint) compiles to
    // partial+final WindowGroupLimit — a boilerplate fingerprint's
    // holders are pruned map-side, before the fp_hash exchange
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
  }

  test("q142 winnow neighbors: join-free, ONE pair subtree; df cap AND rank are WindowGroupLimits") {
    val p = plan("q142_winnow_neighbors")
    assert(!p.contains("Join"))
    // Anchor to the PROPERTIES, not a total-node-count window (a
    // benign optimizer change that splits/merges window-limit nodes
    // must not fail this — ADVICE r15): BOTH caps must compile to
    // WindowGroupLimit — the df cap partitions by the fingerprint
    // hash, the per-doc rank cut partitions by doc_id — so each is
    // identified by its partition column appearing on a
    // WindowGroupLimit line, independent of how many partial/final
    // nodes the planner emits for it.
    val wgl = p.linesIterator.filter(_.contains("WindowGroupLimit")).toSeq
    assert(wgl.exists(_.contains("fp_hash")),
      s"df cap is not a WindowGroupLimit:\n${wgl.mkString("\n")}")
    assert(wgl.exists(_.contains("doc_id")),
      s"per-doc rank cut is not a WindowGroupLimit:\n${wgl.mkString("\n")}")
    // ONE fingerprint subtree: the gram kernel appears in a handful of
    // projection/scan lines of a single winnow pass (~3 observed); a
    // unioned double-compute doubles it — the shape this operator was
    // rewritten to avoid (explode both orientations from ONE pairs
    // read, never union-of-two-selects over an uncached frame)
    val kernelRefs = "hash_shingle_seq\\(".r.findAllIn(p).size
    assert(kernelRefs >= 1 && kernelRefs <= 6, s"kernel refs $kernelRefs")
  }

  test("q150 winnow spans: join-FREE attribution; df cap bounds evidence BEFORE pair expansion") {
    val p = plan("q150_winnow_spans")
    // no join anywhere: position evidence rides the pair tier's
    // one-pass per-fingerprint expansion, and the island collapse is
    // a per-row array fold — never a join of fingerprint rows back
    // onto flagged pairs (which would recompute the gram-scan subtree
    // per side)
    assert(!p.contains("Join"))
    // the dense_rank cap (maxDf + 1 DISTINCT docs per fingerprint)
    // compiles to WindowGroupLimit partitioned by the fingerprint
    // hash — boilerplate holders pruned map-side, before the exchange
    val wgl = p.linesIterator.filter(_.contains("WindowGroupLimit")).toSeq
    assert(wgl.exists(_.contains("fp_hash")),
      s"df cap is not a WindowGroupLimit:\n${wgl.mkString("\n")}")
    // ONE fingerprint subtree (same bound as the q142 pin)
    val kernelRefs = "hash_shingle_seq\\(".r.findAllIn(p).size
    assert(kernelRefs >= 1 && kernelRefs <= 6, s"kernel refs $kernelRefs")
  }

  test("q136 int8 recall: ONE cached scored pass; broadcast sample; rank filters are WindowGroupLimits") {
    // The public entry is EAGER since r16 (it materializes the
    // per-query result and unpersists the scored cache before
    // returning — no session-lifetime cache entry), so the pin reads
    // the lazy two-frame form directly and releases the handle itself.
    val (res, scored) = graft.pipeline.Similarity.int8RecallAuditFrames(
      graft.sources.Corpus.table(spark, sf, "embeddings"), 10, 4L)
    val p = try expandCached(res.queryExecution.executedPlan)
      finally scored.unpersist(false)
    // the scored pass attaches the sample via broadcast (the q70
    // shape) — never a shuffled cartesian of the corpus — and it is
    // PERSISTED: exactly one scored cross-join in the expanded plan,
    // both rankings reading the cache (r14 VERDICT task 3)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("InMemoryTableScan"))
    // ONE distinct scored cross-join node: a materialized cache inlines
    // its (adaptive) plan under BOTH rankings and prints Final+Initial
    // sections, so count distinct node TEXTS (same expr ids = same
    // node) — a genuinely recomputed second scored pass would carry
    // fresh expression ids and fail this
    val scoredJoins = p.linesIterator.flatMap { l =>
      val i = l.indexOf("BroadcastNestedLoopJoin")
      if (i < 0) None else Some(l.substring(i))
    }.toSeq.distinct.size
    assert(scoredJoins <= 1,
      s"expected one cached scored cross-join, got $scoredJoins:\n$p")
    // both rank filters compile to partial+final WindowGroupLimit —
    // per-query top-k is bounded map-side; a refactor that breaks the
    // rank-filter pattern would silently reintroduce a corpus-sized
    // per-query sort (r14 VERDICT task 2)
    assert("WindowGroupLimit".r.findAllIn(p).size >= 4, p)
  }

  test("q128 IVF recall ladder: the true-top-k prefix filter is a WindowGroupLimit") {
    val p = plan("q128_ivf_recall_ladder")
    // rn <= k sits between the ranking window and the running-count
    // window — partial+final WindowGroupLimit caps what each map task
    // ships into the qid shuffle at k rows per query (r14 VERDICT
    // task 2; prefix-safety argued at the filter site in Similarity)
    assert(p.contains("WindowGroupLimit"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q61 normalized dedup: hash aggregates over 64-byte hash keys — no join, no sort-agg") {
    val p = plan("q61_normalized_dedup")
    assert(!p.contains("Join"))
    assert(!p.contains("SortAggregate"))
    assert(p.contains("HashAggregate")) // distinct-expand partials, hashes computed scan-side
  }

  test("q64 cross-doc share: join-free — df via window over the hash partition") {
    val p = plan("q64_crossdoc_share")
    assert(!p.contains("Join"))
    assert(p.contains("Window"))
    assert(p.contains("HashAggregate"))
  }

  test("q65 train split: scan-local assignment, one partial+final aggregate") {
    val p = plan("q65_train_split")
    assert(!p.contains("Join"))
    assert(!p.contains("Window"))
    assert(p.contains("partial_count")) // map-side combine before the shuffle
  }

  test("q66 hash shards: scan-local assignment, one partial+final aggregate") {
    val p = plan("q66_hash_shards")
    assert(!p.contains("Join"))
    assert(!p.contains("Window"))
    assert(p.contains("partial_count"))
  }

  test("q68 incremental dedup: equi-joins only — band-key join, never all-pairs") {
    val p = plan("q68_incremental_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("LeftSemi")) // exact tier + candidate-member prune
  }

  test("q69 collocations: map-side-combined count aggs; top-k is TakeOrdered, not a sort") {
    val p = plan("q69_collocations")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_count")) // bigram + unigram partials collapse map-side
  }

  test("q70 bucket recall: sampled queries broadcast — the corpus side never shuffles wide") {
    val p = plan("q70_bucket_recall")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // both rank filters bound per-query top-k map-side (r14 VERDICT
    // task 2 — the q136/q128 pin, applied to the family's original)
    assert(p.contains("WindowGroupLimit"))
  }

  test("q71 knn label audit: bucket-collect pairs — no cartesian, no wide self-join") {
    val p = plan("q71_knn_label_audit")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Window")) // neighbor rank + majority-vote pick
  }

  test("q72 burst days: window over the daily POST-AGG frame, not raw events") {
    val p = plan("q72_burst_days")
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate")) // daily partial+final before the window
    assert(p.contains("Window"))
  }

  test("q73 cluster sizes: cluster-count-sized aggregates after the shared CC solve") {
    val p = plan("q73_cluster_sizes")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"))
  }

  test("q74 contamination detail: hash equi-join only — no text crosses the join") {
    val p = plan("q74_contaminated_evals")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("HashAggregate"))
  }

  test("q75 seqlen histogram: scan-local buckets, one partial+final aggregate") {
    val p = plan("q75_seqlen_histogram")
    assert(!p.contains("Join"))
    assert(!p.contains("Window"))
    assert(p.contains("partial_count"))
  }

  test("q67 minhash audit: broadcast-only joins — corpus pruned before signatures") {
    val p = plan("q67_minhash_audit")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
    // the signature recomputation reads only pair members (semi-join prune)
    assert(p.contains("LeftSemi"))
  }

  test("q76 image decode: embarrassingly parallel map over the scan — no joins, no data shuffle") {
    val p = plan("q76_image_decode")
    assert(!p.contains("Join"))
    assert(!p.contains("Exchange hashpartitioning"))
    assert(p.contains("MapPartitions")) // per-task codec, never driver-side
  }

  test("q77 jsonl health: one aggregate over the json scan — no join, single pass") {
    val p = plan("q77_jsonl_health")
    assert(!p.contains("Join"))
    assert(p.contains("FileScan json"))
    assert(p.contains("HashAggregate"))
  }

  test("q78 store probe: the scan prunes on the cell partition column") {
    val p = plan("q78_ivf_store_probe")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q79 adaptive salted join: unskewed corpus derives the PLAIN join — no explode fan-out") {
    // the derivation (factor 1 here, proportional under crafted skew)
    // and salted-branch parity are pinned in SkewAndBucketSpec; the
    // plan pin is that the gate corpus pays no salt machinery at all
    val p = plan("q79_salted_join")
    assert(!p.contains("_salt"))
    assert(!p.contains("Generate explode"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q131 forced-salt join: the join key carries the salt; no cartesian anywhere") {
    val p = plan("q131_salted_join_forced")
    assert(p.contains("_salt"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q81 pattern scan: ONE corpus scan for all patterns — no joins, explode not re-scan") {
    val p = plan("q81_pattern_scan")
    assert(!p.contains("Join"))
    assert(p.contains("Generate explode")) // patterns fan out per row
    assert(p.split("FileScan parquet").length == 2) // exactly one scan
  }

  test("q82 keep-best dedup: window over CLUSTERED docs only; anti-join sized by true dups") {
    val p = plan("q82_cluster_keep_best")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"))
    assert(p.contains("LeftAnti"))
  }

  test("q83 filter funnel: scan-local signals, one partial+final aggregate — no joins") {
    val p = plan("q83_filter_funnel")
    assert(!p.contains("Join"))
    assert(!p.contains("Window"))
    assert(p.contains("partial_count"))
  }

  test("q84 tolerance as-of: still one window, no join node — the age bound is a filter") {
    val p = plan("q84_asof_tolerance")
    assert(p.contains("Window"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q113 pure-SQL as-of: the SQL spelling keeps the zero-join shape") {
    // the union + running-last-window dataflow must survive the SQL
    // surface: windows and their exchanges only — a planner that
    // rewrote it into a range join would explode at scale exactly like
    // the naive formulation AsOfJoin.scala documents
    val p = plan("q113_sql_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q85 quantile guard: agg materialized ONCE (checkpoint scan), rank check broadcasts it back") {
    val p = plan("q85_quantile_guard")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // the percentile agg is localCheckpoint'd — the probe plan reads
    // the materialized frame instead of re-evaluating the sketch
    // subtree per consumer (two corpus scans otherwise)
    assert(p.contains("ExistingRDD"))
    assert(!p.contains("percentile_approx(") || p.split("FileScan parquet").length <= 2)
  }

  test("q86 novelty: one vocabulary shuffle on 8-byte hashes — no text through a join") {
    val p = plan("q86_novelty")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the first-seen join keys on the hash; no string column crosses it
    assert(p.contains("hash_tokens") || p.contains("sha256_prefix60"))
  }

  test("q87 star join: dims broadcast, no cartesian — the classic star-schema plan") {
    val p = plan("q87_nation_year_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q95/q96/q108/q111 codec tiers: embarrassingly parallel maps — no joins, no data shuffle") {
    // same shape contract as q76: the only exchange is the final
    // gate-determinism sort; codecs run per task, never driver-side
    Seq("q95_frame_sample", "q96_audio_decode", "q108_tiff_frame_sample",
        "q111_aiff_decode", "q112_au_decode").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), q)
      assert(!p.contains("Exchange hashpartitioning"), q)
      assert(p.contains("MapPartitions"), q)
    }
  }

  test("q114 quarantine audit: classify map + ONE per-type aggregate — no joins") {
    // the audit's scale shape: decode/classify runs per task
    // (MapPartitions), and the only exchange is the tiny per-type
    // partial+final aggregate — no payload bytes cross a join
    val p = plan("q114_codec_quarantine")
    assert(!p.contains("Join"))
    assert(p.contains("MapPartitions"))
    assert(p.contains("HashAggregate"))
  }

  test("q118 SQL money_sum: same pushdown + partial/final agg shape as q12") {
    val p = plan("q118_sql_money_sum")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_money_sum"), "partial aggregation must be map-side")
    assert(!p.contains("Join"))
  }

  test("q98 compression guard: scan-local codec, one partial+final aggregate — no joins") {
    val p = plan("q98_compression_guard")
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate"))
  }

  test("q99 band store: the persisted base side joins from its buckets — no base-side shuffle") {
    // force the shuffle join (broadcast would hide the property being
    // pinned), then assert the store side scans Bucketed with no
    // Exchange anywhere in the candidate join — only the delta side
    // may shuffle; restore the conf either way
    val s = spark
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bandstore_pin").toString
    val docs = graft.sources.Corpus.table(s, sf, "documents")
    graft.pipeline.Dedup.buildBandStore(
      docs.where(col("doc_id") % 2 === 0), "band_store_pin_tbl", dir)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val p = graft.pipeline.Dedup.bandStoreCandidates(
          docs.where(col("doc_id") % 2 =!= 0), "band_store_pin_tbl")
        .queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"))
      // exactly ONE band-keyed exchange: the delta side aligning to
      // the store's bucketing; a second would mean the base side
      // re-shuffled despite its buckets (the post-join distinct's
      // pair-keyed exchange is legitimate and not counted)
      assert("Exchange hashpartitioning\\(band".r.findAllIn(p).size == 1, p)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS band_store_pin_tbl")
    }
  }

  test("q146 winnow store: base side aggregates from its buckets — no base-side shuffle") {
    // the q99 property for the fingerprint store: the per-fingerprint
    // doc-list aggregate and the probe join ride the store's fp_hash
    // bucketing; only the delta side exchanges. Broadcast disabled so
    // the join decision is about co-location, not size.
    val s = spark
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnowstore_pin").toString
    val docs = graft.sources.Corpus.table(s, sf, "documents")
    graft.pipeline.Winnow.buildWinnowStore(
      docs.where(col("doc_id") % 2 === 0), "winnow_store_pin_tbl", dir)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val p = graft.pipeline.Winnow.winnowStorePairs(
          docs.where(col("doc_id") % 2 =!= 0), "winnow_store_pin_tbl",
          graft.pipeline.Winnow.WinnowK, graft.pipeline.Winnow.WinnowW,
          graft.pipeline.Winnow.WinnowMaxDf, 1L)
        .queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"))
      // the base-df cap compiles to WindowGroupLimit (map-side cut)
      assert(p.contains("WindowGroupLimit"), p)
      // exactly ONE fp_hash-keyed exchange: the delta side aligning to
      // the store's bucketing; a second would mean the base side
      // re-shuffled despite its buckets (the delta's own distinct and
      // the final pair-keyed aggregate exchanges are legitimate and
      // keyed differently)
      assert("Exchange hashpartitioning\\(fp_hash".r.findAllIn(p).size == 1, p)
      // q154: the SPAN probe keeps every store property — bucketed
      // base scan, WindowGroupLimit df cap (dense_rank: positions
      // share hashes), still exactly ONE fp_hash exchange
      val ps = graft.pipeline.Winnow.winnowStoreSpans(
          docs.where(col("doc_id") % 2 =!= 0), "winnow_store_pin_tbl",
          minShared = 1L)
        .queryExecution.executedPlan.toString
      assert(ps.contains("Bucketed: true"))
      assert(ps.contains("WindowGroupLimit"), ps)
      assert("Exchange hashpartitioning\\(fp_hash".r.findAllIn(ps).size == 1, ps)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS winnow_store_pin_tbl")
    }
  }

  test("q97 bloom admission: negatives bypass every join; positives re-check without cartesian") {
    val p = plan("q97_bloom_admission")
    // the scan-local fast path exists: a Union arm with no join above it
    assert(p.contains("Union"))
    // the exact re-check is equi-join only, never nested-loop/cartesian
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q130 SQL paragraph tier: the AQE skew-split ceiling, and the salted spelling that answers it") {
    // r13 stated "AQE's skew split owns the SQL keeper join" without
    // evidence (VERDICT task 3). Measured here: it does NOT — the
    // keeper aggregate rides the join's own h-shuffle, so the join's
    // build child is Agg←Sort←ShuffleStage, never the Sort←ShuffleStage
    // shape OptimizeSkewedJoin pattern-matches, and the planted 50%
    // hot key serializes into one task at ANY threshold. Part 1 pins
    // that ceiling by running the PLAIN hot spelling under maximally
    // permissive skew confs and asserting no split happened (if a
    // Spark upgrade starts splitting, this fails and the static salt
    // can be retired). Part 2 pins the shipped answer: q130's salted
    // spelling keys the keeper join on (h, salt), so the hot key
    // spreads over SqlSaltFactor partitions by construction.
    val s = spark
    val sfDir = "/root/testdata/sf0.01"
    QueryRunner.init(s, sfDir)
    val confs = Seq(
      // 100 TB posture: the corpus-wide keeper side is NOT broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the 256MB/5x-median defaults to the ~100 KB hot partition
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // skew split granularity is map-output chunks: a hot reduce
      // partition can only split across the map tasks that produced
      // it, so stage the corpus over 16 partitions the way a real
      // landing directory's many files would arrive (sf0.01 ships as
      // one tiny file = one map task = unsplittable for that reason
      // alone, which would make part 1 vacuous)
      graft.sources.Corpus.table(s, sfDir, "documents")
        .repartition(16).createOrReplaceTempView("documents")

      // part 1 — the ceiling: plain join, permissive thresholds, no split
      val plain = s.sql(SparkEntry.sqlParagraphDedupText(hot = true))
      plain.collect() // AQE decides from runtime stats — must materialize
      val pPlain = plain.queryExecution.executedPlan.toString
      assert(pPlain.contains("isFinalPlan=true"), pPlain.take(500))
      assert("""SortMergeJoin \[h#\d+\], \[h#\d+\]""".r
        .findFirstIn(pPlain).nonEmpty, pPlain.take(2000))
      assert(!pPlain.contains("skew=true"),
        "AQE now splits the plain keeper join — revisit the static salt:\n" +
          pPlain.take(2000))

      // part 2 — the answer: the salted spelling distributes on (h, salt)
      val salted = s.sql(SparkEntry.sqlParagraphDedupText(hot = true,
        saltFactor = graft.pipeline.Dedup.SqlSaltFactor))
      salted.collect()
      val pSalt = salted.queryExecution.executedPlan.toString
      assert("""SortMergeJoin \[h#\d+, [^\]]+\], \[h#\d+, salt#\d+\]""".r
        .findFirstIn(pSalt).nonEmpty,
        s"salted spelling does not key the keeper join on (h, salt):\n" +
          pSalt.take(3000))
      // and the two spellings agree bit-for-bit on the planted corpus
      assert(plain.collect().toSeq == salted.collect().toSeq)
    } finally {
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
      // restore the plain corpus view for later tests on this session
      graft.sources.Corpus.table(s, sfDir, "documents")
        .createOrReplaceTempView("documents")
    }
  }

  test("q165 interval join: bucket equi-join — no cartesian, no BNLJ") {
    // the naive spelling of a pure range predicate is a
    // BroadcastNestedLoopJoin (or CartesianProduct big-big); the bucket
    // decomposition must keep it an equi-join at any relative size
    val p = plan("q165_interval_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("q166 weighted sample: row_number ≤ k compiles to WindowGroupLimit") {
    // partial (map-side) + final group-limit: each partition forwards at
    // most k rows per source into the window shuffle
    val p = plan("q166_weighted_sample")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q164 bigram LM: no cartesian; BNLJ only as the two 1-row attaches") {
    // the model joins are hash/sort-merge on the bigram keys; the only
    // nested-loop shapes allowed are the 1-row n_corpus broadcasts
    // (the q22 single-row-attach pattern)
    val p = plan("q164_bigram_lm")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p.take(2000))
  }

  test("q176 edit-distance join: segment equi-join, no cartesian/BNLJ; " +
    "pair dedupe is a partial+final HashAggregate; the audit bound " +
    "pushes into both scans") {
    // the naive spelling of a Levenshtein predicate is all-pairs; the
    // PassJoin blocking must keep it an equi-join on (seg_idx, text),
    // verify each candidate pair ONCE (distinct before levenshtein),
    // and let Catalyst push the doc_id window through the join
    val p = plan("q176_edit_distance_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortAggregate"), "pair dedupe fell off the hash path")
    assert(p.contains("HashAggregate"))
    assert("LessThan\\(doc_id,1000\\)".r.findAllIn(p).size >= 2,
      "audit bound must reach both parquet scans")
  }

  test("q174 BM25: top-k is TakeOrderedAndProject; no cartesian; BNLJ " +
    "only as the 1-row corpus-stats attach") {
    val p = plan("q174_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(2000))
  }

  test("q182 batch BM25: per-query rank is a partial+final " +
    "WindowGroupLimit; broadcast membership; no cartesian") {
    val p = plan("q182_bm25_batch")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1)
  }

  test("q180 BM25 store probe: bucket-pruned postings, no corpus scan") {
    // query time must read ONLY the query's own term buckets (IN on
    // the bucket column prunes) plus the 1-row stats sidecar — never
    // the documents table
    val p = plan("q180_bm25_store")
    assert(p.contains("Bucketed: true"))
    assert(p.contains("SelectedBucketsCount"),
      "term filter must prune store buckets")
    assert(!p.contains("documents.parquet"),
      "store probe must not rescan the corpus")
  }

  test("q187 repetition admission: doc-local aggregation — no window, " +
    "no cartesian, one small-side join back to the doc spine") {
    val p = plan("q187_repetition_admission")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"), "signals must not ride a corpus window")
    assert(p.contains("HashAggregate"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 0, p.take(2000))
  }

  test("q189 DSIR: bucket model broadcasts; per-source top-k is a " +
    "partial+final WindowGroupLimit; no cartesian") {
    val p = plan("q189_dsir_resample")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // the ≤B-row bucket model and the 1-row totals both broadcast
    assert(p.contains("BroadcastHashJoin"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1)
  }

  test("q171 PQ recall: ONE cached scored pass; broadcast sample; rank filters are WindowGroupLimits") {
    // the q136 pin applied to the codebook quantizer: the scored table
    // (broadcast-sample cross-join) computes once and is cached; the
    // exact, ADC, and shortlist-rescore rankings all read the cache
    // through partial+final WindowGroupLimits
    val (res, scored) = graft.pipeline.Similarity.pqRecallAuditFrames(
      graft.sources.Corpus.table(spark, sf, "embeddings"), 10, 4L)
    val p = try expandCached(res.queryExecution.executedPlan)
      finally scored.unpersist(false)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("InMemoryTableScan"))
    val scoredJoins = p.linesIterator.flatMap { l =>
      val i = l.indexOf("BroadcastNestedLoopJoin")
      if (i < 0) None else Some(l.substring(i))
    }.toSeq.distinct.size
    assert(scoredJoins <= 1,
      s"expected one cached scored cross-join, got $scoredJoins:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 4, p)
  }
}
