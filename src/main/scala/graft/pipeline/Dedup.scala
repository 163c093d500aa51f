package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions._

/** Deduplication operators over a `documents(doc_id, text, lang, source,
  * n_chars)` table — the four standard tiers of a training-data pipeline:
  * exact (content hash), MinHash+LSH (set similarity), SimHash
  * (bit-vector similarity), and char-n-gram Jaccard (verification
  * metric).
  *
  * 100 TB design stance:
  *  - exact dedup is a hash shuffle with map-side partial aggregation —
  *    embarrassingly scalable;
  *  - near-dup NEVER goes all-pairs: LSH banding turns it into an
  *    equi-join on (band, key) buckets, so cost is O(candidates), and
  *    candidates are pairs that already collide on a band;
  *  - the only driver-sized assumption is that a single bucket's
  *    membership fits an executor — with 4 bands × 2 rows of 60-bit
  *    hashes, bucket skew means near-identical content, which is
  *    exactly what we want grouped.
  */
object Dedup {

  /** Exact-duplicate summary by source: total vs distinct content hashes.
    * (sha2 over full text == ClickHouse-style content fingerprint.) */
  def exactDedupSummary(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), sha2(col("text"), 256).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("h")).as("n_unique"))
      .orderBy("source")

  /** Normalized exact dedup: duplicate groups AFTER text normalization
    * (lowercase, collapse whitespace runs, trim) — the "fuzzy-exact"
    * tier every pipeline runs between raw-hash dedup and MinHash:
    * catches re-encodings and formatting variants that differ as bytes
    * but not as content, at exact-dedup cost. Groups travel as sha256
    * of the normalized text, never the text itself, so the shuffle key
    * is 64 bytes regardless of document size — same map-side
    * partial-agg + hash-shuffle shape as exactDedupSummary. Returns
    * only groups with >1 members: (hash, member count, smallest doc_id
    * = the canonical keeper). */
  def normalizedDupGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256)
          .as("norm_h"))
      .groupBy(col("norm_h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
      .where(col("n_docs") > 1)
      .orderBy("norm_h")

  /** Gate-facing normalized-dedup summary: per source, documents vs
    * distinct RAW content hashes vs distinct NORMALIZED hashes — the
    * "how much does normalization buy" report (n_unique_raw −
    * n_unique_norm = docs reclaimed by case/whitespace folding). Always
    * |sources| rows, so the gate checks real values even on a corpus
    * with no duplicates at all (the group-detail form above is the
    * production artifact, but an empty frame is a gate that cannot
    * fail; its semantics are pinned on crafted variants in
    * PipelineSpec). Same one-shuffle partial-agg shape as
    * exactDedupSummary — both hashes are computed scan-side, 64-byte
    * keys through the shuffle. */
  def normalizedDedupSummary(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), sha2(col("text"), 256).as("raw_h"),
        // NFC first (composed vs decomposed accents are different
        // bytes — round 10, parity gated byte-level by q102), then
        // case-fold, then whitespace-collapse
        sha2(trim(regexp_replace(lower(
            graft.functions.NfcNormalize.column(col("text"))), "\\s+", " ")),
          256).as("norm_h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_h")).as("n_unique_raw"),
        countDistinct(col("norm_h")).as("n_unique_norm"))
      .orderBy("source")

  /** Approximate dedup summary: HLL++ distinct-hash counts per source —
    * the 100 TB spelling of exactDedupSummary. Exact countDistinct
    * shuffles every distinct hash to its group; HLL shuffles one
    * constant-size sketch per (partition, group) and merges, so the
    * shuffle volume is O(groups), independent of cardinality. Spark's
    * HLL++ is deterministic for fixed input (no RNG), rsd is the
    * accuracy dial. Not portable SQL (engine-specific sketch) → the
    * gate records the rows-only check; the exact-vs-approx error bound
    * is pinned in PipelineSpec. */
  def dedupSummaryApprox(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs
      .select(col("source"), sha2(col("text"), 256).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           approx_count_distinct(col("h"), rsd).as("n_unique_approx"))
      .orderBy("source")

  /** Oracle-checkable companion to dedupSummaryApprox: the HLL sketch
    * value itself is engine-specific (never portable), but its exact
    * columns and its ERROR BOUND are checkable — emit the exact per-source
    * doc count alongside a boolean asserting the HLL estimate landed
    * within `tol` of the true distinct count (tol = 4σ at rsd 0.05; HLL++
    * is deterministic for fixed input, so this is a hard invariant, not a
    * flaky statistical test). The oracle pins (source, n_docs, TRUE) — an
    * out-of-bound sketch hash-mismatches the gate instead of hiding
    * behind a rows-only check. One extra exact countDistinct vs q39: the
    * guard costs what the exact tier costs, which is the point — run it
    * at audit time, run the sketch tier in production. */
  def dedupApproxGuard(docs: DataFrame, rsd: Double = 0.05,
                       tol: Double = 0.2): DataFrame = {
    val h = docs.select(col("source"), sha2(col("text"), 256).as("h"))
    h.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("h")).as("n_unique"),
           approx_count_distinct(col("h"), rsd).as("n_approx"))
      .select(col("source"), col("n_docs"),
        (abs(col("n_approx") - col("n_unique")) <=
          col("n_unique").cast("double") * tol).as("within_bounds"))
      .orderBy("source")
  }

  /** Keep-first exact dedup: one survivor (min doc_id) per content hash.
    * Pure aggregation — no window, so no per-partition sort at scale. */
  def dedupKeepFirst(docs: DataFrame): DataFrame =
    docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keeper"))
      .agg(count(lit(1)).as("kept"))

  // private[graft]: SparkEntry GENERATES the q109 SQL spelling from
  // these constants so the SQL surface cannot drift from this dataflow
  private[graft] val NumHashes = 8
  val Bands = 4
  val RowsPerBand = 2
  val ShingleK = 3

  /** The star-fallback bucket cap every bounded-pair tier defaults to;
    * the q33/q109 SQL spellings and the DuckDB oracles mirror this
    * value, so it is defined exactly once. */
  val DefaultMaxBucket = 1000

  private def minhashCols(doc: DataFrame): DataFrame = {
    // One native expression per stage: text → distinct-shingle hashes →
    // all 8 affine minhashes in one pass (functions/TextHashExprs).
    // Staged selects keep each multi-referenced array computed once per
    // row (CollapseProject's expensive-expression guard, SPARK-36718);
    // fanOutSmallScan spreads the CPU-bound hashing across cores when
    // the scan is under-split.
    val withHs = graft.sources.Corpus.fanOutSmallScan(doc)
      .select(col("doc_id"), shingleHashes(col("text"), ShingleK, "mh").as("hs"))
    val withMh = withHs.select(col("doc_id"),
      minhashesAll(col("hs"), NumHashes).as("mh"))
    withMh.select(col("doc_id") +:
      (0 until NumHashes).map(i => col("mh")(i).as(s"mh$i")): _*)
  }

  /** MinHash signatures (first `NumHashes` seeded hash functions) —
    * the correctness-observable core of the LSH pipeline. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashCols(docs)
      .select(col("doc_id") +: (0 until 4).map(i => col(s"mh$i")): _*)
      .orderBy("doc_id")

  /** Near-duplicate pairs via banded MinHash-LSH, verified with true
    * Jaccard over shingle sets and thresholded.
    *
    * Dataflow: signatures → explode to (band, key) → self-equi-join on
    * the bucket → distinct candidate pairs → verify. Both join sides
    * shuffle ONLY on the band key; there is no cross join anywhere.
    */
  def lshNearDupPairs(docs: DataFrame, threshold: Double,
                      maxBucket: Int = DefaultMaxBucket): DataFrame =
    // deterministic order on the public/gate surface only — the
    // cluster/index consumers take the unsorted variant, because a
    // global sort of the pair table is pure waste to a CC loop and at
    // 100 TB the pair set is O(duplicates), not test-sized
    lshNearDupPairsUnsorted(docs, threshold, maxBucket)
      .orderBy("doc_a", "doc_b")

  /** (doc_id, band, bkey) — every document exploded to its LSH band
    * keys. The shared candidate-generation input of the symmetric
    * (corpus-vs-itself) and asymmetric (delta-vs-base) near-dup tiers. */
  private def bandedKeys(docs: DataFrame): DataFrame = {
    // Docs with fewer than ShingleK tokens have NO shingles and thus a
    // null signature; concat_ws skips nulls, so every such doc would
    // share the identical hash64("") key in every band — one hot bucket
    // that makes candidate generation quadratic in the shingle-less
    // population. They can never verify anyway (Jaccard over an empty
    // shingle set is null, which fails every >= threshold), so dropping
    // them changes no verified pair. The filter runs BEFORE the
    // signature projection on the cheap token-count predicate:
    // filtering on the signature column itself would be pushed below
    // the projection with the alias substituted
    // (PushPredicateThroughNonJoin), computing the whole shingle-hash +
    // minhash chain twice per row.
    val eligible = docs.where(size(tokens(col("text"))) >= ShingleK)
    val sig = minhashCols(eligible)
    val mhCols = (0 until NumHashes).map(i => col(s"mh$i"))
    val bandStructs = array((0 until Bands).map(b =>
      struct(lit(b).as("band"), bandKey(mhCols, b, RowsPerBand).as("bkey"))): _*)
    sig.select(col("doc_id"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bkey"))
  }

  private[pipeline] def lshNearDupPairsUnsorted(
      docs: DataFrame, threshold: Double, maxBucket: Int): DataFrame = {
    // Candidate generation WITHOUT a self-join: group ids per
    // (band, key) bucket and expand each bucket's pair combinations —
    // the classic map-reduce LSH shape. One shuffle carrying three
    // longs per row; bucket membership is bounded (colliding minhash
    // bands ⇒ near-identical content). The earlier self-join
    // formulation was correct but its 4-join AQE tree was
    // pathologically variance-prone in-session (6s…190s); this DAG is
    // one shuffle + two broadcast joins.
    val banded = bandedKeys(docs)
    val ids = array_sort(collect_list(col("doc_id")))
    val cand = banded
      .groupBy(col("band"), col("bkey"))
      .agg(ids.as("ids"))
      .where(size(col("ids")) > 1)
      // all (i<j) pairs within the bucket; buckets over maxBucket fall
      // back to representative star pairs (see boundedPairs scaladoc)
      .select(explode(boundedPairs(col("ids"), maxBucket,
        (a, b) => struct(a.as("doc_a"), b.as("doc_b")))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()

    // Verification re-attaches shingle sets to the (few) candidates —
    // recomputed straight from text (string ops only, no hashing). The
    // candidate side scales with TRUE duplication, not corpus size, so
    // it is broadcast explicitly: the big side streams, nothing wide is
    // ever built into a hash relation. If a pathologically duplicated
    // corpus outgrows the broadcast budget, drop the hint — AQE picks a
    // shuffle join on doc_id with identical semantics.
    //
    // Candidates are materialized ONCE (localCheckpoint; at cluster
    // scale: a reliable checkpoint) — they feed three consumers (the
    // candidate-id set and both pair joins), and re-deriving the whole
    // minhash+banding pipeline per consumer would triple the dominant
    // cost. The id set then prunes the corpus with a broadcast
    // semi-join BEFORE the shingle recomputation, so verification CPU
    // scales with documents-in-candidates, not corpus size.
    // eager = true, deliberately: the three consumers reach candM
    // through SEPARATE broadcast exchanges, and broadcast jobs run
    // concurrently on their own threads — against a LAZY checkpoint
    // they race to compute the not-yet-materialized plan and each
    // re-runs the whole minhash+banding stage (measured: 17.6 s cold /
    // 2.8 s warm lazy vs 5.9 s cold / 1.6 s warm eager at sf0.1).
    // Eager materializes once, serially, before the fan-out. The cost
    // is that plan-only consumers (explain) also trigger the job;
    // that's the right trade for an operator whose construction IS the
    // index build. (localCheckpoint blocks are non-replayable either
    // way; at cluster scale use a reliable checkpoint dir — SCALE.md.)
    val candM = cand.localCheckpoint(true)
    val candIds = candM
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val shTbl = graft.sources.Corpus.fanOutSmallScan(docs)
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shinglesOf(col("text"), ShingleK).as("sh"))
    val withA = shTbl
      .join(broadcast(candM), col("doc_id") === col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("sh").as("sha_"))
    shTbl
      .join(broadcast(withA), col("doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(jaccard(col("sha_"), col("sh")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash per document (64-bit sign fingerprint as a bitstring) —
    * token hashing and the 64-bit fold are both native expressions, so
    * the whole column is one codegen'd kernel chain.
    *
    * The trailing `orderBy("doc_id")` is a GATE-DETERMINISM artifact
    * (the driver hashes sorted output): at 100 TB it is a full-corpus
    * range sort and a production fingerprint pass should drop it — the
    * per-doc computation itself is embarrassingly parallel and
    * shuffle-free. Same note in SCALE.md. */
  def simhashAll(docs: DataFrame): DataFrame =
    graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"),
        simhashFromHashes(tokenHashes(col("text"), "sim")).as("simhash"))
      .orderBy("doc_id")

  /** SimHash near-duplicate pairs with hamming distance ≤ maxHamming,
    * found via pigeonhole bucketing: split the 64-bit fingerprint into
    * (maxHamming+1) chunks — any pair within the distance budget must
    * agree on at least one whole chunk, so candidates are exactly the
    * pairs sharing a (chunk_idx, chunk_value) bucket. Same
    * one-shuffle + pair-expansion DAG as the MinHash tier; hamming is
    * verified on the (few) candidates. */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int,
                          maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val chunks = maxHamming + 1
    val chunkBits = 64 / chunks
    val sims = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"),
        simhashFromHashes(tokenHashes(col("text"), "sim")).as("simhash"))

    // Unlike the MinHash tier (whose shingle sets are too wide to carry
    // through a shuffle), the whole fingerprint is 64 chars — so it
    // rides along into the buckets and pairs verify inline, with NO
    // re-join and the simhash computed exactly once per document.
    val banded = sims.select(col("doc_id"), col("simhash"),
        explode(array((0 until chunks).map(c =>
          struct(lit(c).as("cidx"),
            substring(col("simhash"), c * chunkBits + 1, chunkBits).as("chunk"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.cidx"), col("ck.chunk"))
    // Hamming is computed per candidate INSTANCE (native byte-compare
    // kernel, ≤chunks× per pair) and filtered BEFORE the distinct: the
    // dedup then hash-aggregates only the few (doc_a, doc_b, hamming)
    // survivors instead of sort-aggregating every chunk collision with
    // two 64-char fingerprints in tow (~200k wide rows at sf0.1).
    val members = array_sort(collect_list(struct(col("doc_id"), col("simhash"))))
    banded
      .groupBy(col("cidx"), col("chunk"))
      .agg(members.as("ms"))
      .where(size(col("ms")) > 1)
      .select(explode(boundedPairs(col("ms"), maxBucket,
        (a, b) => struct(
          a.getField("doc_id").as("doc_a"),
          b.getField("doc_id").as("doc_b"),
          hamming64(a.getField("simhash"), b.getField("simhash")).as("hamming")))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** The verified near-dup pair set, materialized ONCE per
    * (corpus, threshold) per session — the build-the-index-once pattern.
    * Every cluster-tier consumer (nearDupClusters, dedupByClusters, and
    * any downstream keep/drop pass) needs the SAME pair set, and the LSH
    * candidate generation + jaccard verification is the dominant cost of
    * the whole family — re-deriving it per consumer multiplies the most
    * expensive stage of the pipeline. Held in the session-scoped
    * SessionCache (never a JVM-global map: a checkpoint from one
    * session is dead in another), keyed on the corpus frame's semantic
    * plan hash + a (path, size, mtime) lineage fingerprint, so two
    * reads of the same table share the index while different corpora,
    * thresholds, or an in-place rewrite of the same file names never
    * collide. The cached frame is localCheckpoint-materialized (lineage
    * truncated); at cluster scale persist the pair set to a reliable
    * checkpoint dir or a parquet sink instead — same semantics, and the
    * pair table (O(true duplicates), tiny relative to the corpus) is
    * exactly what a production pipeline would write out anyway. */
  private def verifiedPairIndex(docs: DataFrame, threshold: Double): DataFrame =
    graft.SessionCache.getOrBuild(docs.sparkSession,
      ("Dedup.pairIndex", docs.semanticHash(),
        graft.SessionCache.lineageFingerprint(docs), threshold)) {
      // eager: the pair set feeds BOTH branches of the symmetric edge
      // union — a lazy checkpoint would let their tasks race to compute
      // it (same hazard as candM above); index construction is the
      // build step, so building at insert time is the honest cost.
      // The verified jaccard rides along (one double per pair): the
      // clustering consumers project it away, the estimate audit needs
      // it, and a production pipeline persists it anyway.
      lshNearDupPairsUnsorted(docs, threshold, maxBucket = DefaultMaxBucket)
        .localCheckpoint(true)
    }

  /** Connected-component clusters of the near-duplicate pair graph:
    * every document that appears in a verified LSH near-dup pair is
    * labeled with the smallest doc_id reachable from it (its cluster
    * representative). Iterative min-label propagation — the standard
    * distributed-CC shape: each round is one shuffle join
    * (edges ⋈ labels) plus a min-aggregate, and the loop stops when no
    * label changed (≤ graph diameter rounds; near-dup clusters are
    * shallow). Lineage is truncated per round with localCheckpoint so
    * the plan does not grow with iterations; at 100 TB use a reliable
    * checkpoint dir and the large-star/small-star variant (see
    * SCALE.md) — both preserve these semantics exactly.
    *
    * Convergence is guaranteed (labels are monotone-decreasing over a
    * finite set, fixpoint within graph-diameter rounds), so the
    * default runs to the fixpoint the q36/q37 oracle computes; pass a
    * finite maxIter only to bound rounds explicitly, accepting
    * possibly-unconverged labels on deeper-than-maxIter chains. */
  def nearDupClusters(docs: DataFrame, threshold: Double,
                      maxIter: Int = Int.MaxValue): DataFrame =
    minLabelComponents(verifiedPairIndex(docs, threshold),
        "doc_a", "doc_b", maxIter)
      .select(col("node").as("doc_id"), col("label").as("cluster"))
      .orderBy("doc_id")

  /** Min-label connected components over an undirected pair graph —
    * the shared clustering core of every near-dup tier (text LSH pairs
    * AND embedding cosine pairs run the same loop; see nearDupClusters
    * and Similarity.dedupEmbeddingsByClusters). Input: one row per
    * undirected edge (aCol, bCol). Output: (node, label) with label =
    * the smallest node id reachable from node. Semantics and scale
    * notes as documented on nearDupClusters. */
  /** Edge-count bound for the driver-local CC fast path: 10⁶ edges ≈
    * 16 MB of (long, long) — trivially driver-sized, and far above any
    * observed pair-table size (the pair set is O(true duplicates)).
    * Above the bound the distributed loop below runs unchanged. */
  private val MaxLocalEdges = 1000000L

  private[pipeline] def minLabelComponents(pairs: DataFrame,
      aCol: String, bCol: String,
      maxIter: Int = Int.MaxValue): DataFrame = {
    // candidate generation runs exactly once; checkpoint strategy is
    // injectable (local by default, reliable dir at cluster scale —
    // see graft.Checkpoints) because THIS loop is the one place lineage
    // grows with iteration count
    val edges = graft.Checkpoints.checkpoint(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst"))))

    // Size-gated driver fast path: the pair graph is O(true duplicates)
    // — tiny relative to the corpus at every scale — and each
    // distributed propagation round costs a join + aggregate +
    // checkpoint + driver action. When the (already materialized) edge
    // set fits comfortably on the driver, a union-find computes the
    // identical min-label fixpoint in microseconds; past the bound the
    // iterative loop below takes over untouched. This is the standard
    // production CC shape (GraphFrames does the same): distribute the
    // EXPENSIVE part (candidate generation + verification), solve the
    // small residual graph locally. maxIter semantics are preserved by
    // routing explicit-round-bounded calls to the iterative loop.
    // maxIter first: explicit-round-bounded callers always take the
    // distributed loop, so they must not pay the eligibility count's
    // extra Spark action (ADVICE r7)
    if (maxIter == Int.MaxValue && edges.count() <= MaxLocalEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union by MIN root so the representative IS the component min
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      return parent.keys.toSeq.sorted
        .map(n => (n, find(n))).toDF("node", "label")
    }

    // seed with the 1-hop minimum (free first propagation round); every
    // node appears as src because edges are symmetric
    var labels = graft.Checkpoints.checkpoint(
      edges.groupBy(col("src").as("node"))
        .agg(least(min(col("dst")), col("src")).as("label")))
    // convergence via the label sum: labels only ever decrease, so the
    // sum is strictly monotone until the fixpoint — one tiny aggregate
    // per round instead of a join+count (exact decimal: no overflow at
    // any id scale). sum() over an EMPTY frame is null → None; an empty
    // graph (no verified pairs) is converged immediately.
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head()
        .getDecimal(0))
    var prevSum = labelSum(labels)
    var converged = prevSum.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val prop = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
      val updated = graft.Checkpoints.checkpoint(
        labels.union(prop)
          .groupBy("node").agg(min("label").as("label")))
      val newSum = labelSum(updated)
      converged = newSum == prevSum
      prevSum = newSum
      labels = updated
      iter += 1
    }
    labels.select(col("node"), col("label"))
  }

  /** End-to-end cluster dedup: drop every near-dup cluster member
    * except its representative, and report per-source survivor counts.
    * The removed set joins back anti-style on doc_id — Catalyst picks
    * broadcast vs shuffle by its size (at 100 TB a 40%-dup corpus
    * makes it a shuffle join, which is the correct plan). */
  def dedupByClusters(docs: DataFrame, threshold: Double): DataFrame = {
    val removed = nearDupClusters(docs, threshold)
      .where(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"))
    docs.join(removed, Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
      .orderBy("source")
  }

  /** Cluster dedup keeping the BEST member per cluster instead of the
    * min-id one: representative = the longest document (n_chars),
    * ties broken on smallest doc_id — the policy production pipelines
    * actually want (keep the most complete copy of boilerplate-
    * trimmed near-dups, not an arbitrary id). Same pair index, same
    * shared CC solve; the ranking is one window over the CLUSTERED
    * docs only (cluster-membership-sized, never corpus-sized), and
    * the removed set anti-joins back exactly as dedupByClusters. */
  def dedupByClustersKeepBest(docs: DataFrame, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val removed = nearDupClusters(docs, threshold)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") =!= 1)
      .select(col("doc_id"))
    docs.join(removed, Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
      .orderBy("source")
  }

  /** Near-dup cluster-size histogram: how many clusters have exactly k
    * members — the one-page dedup report a pipeline owner reads before
    * approving a drop (a fat tail of large clusters means boilerplate
    * or template content; all-pairs-of-two means true random near-dups).
    * Rides the session pair index + the shared CC loop; everything
    * after clustering is cluster-count-sized. */
  def clusterSizeHistogram(docs: DataFrame, threshold: Double): DataFrame =
    nearDupClusters(docs, threshold)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy("k")

  /** MinHash-estimate quality audit: for every VERIFIED near-dup pair,
    * the Jaccard the signatures would have estimated (fraction of the 8
    * minhash positions agreeing) next to the true shingle Jaccard — the
    * calibration report that justifies trusting signature agreement at
    * scales where exact verification is too expensive (same
    * audit-the-approximation stance as q38b/q39b). Reuses the
    * session-scoped pair index (pairs + true jaccard come from the one
    * materialized build); signatures are recomputed only for documents
    * that appear in a pair — the corpus is pruned with a broadcast
    * semi-join first, so audit CPU scales with true duplication, not
    * corpus size. mh_est = k/8 is exact binary arithmetic; abs_err
    * subtracts the already-rounded jaccard — both engines agree
    * bit-for-bit. */
  def minhashEstimateAudit(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = verifiedPairIndex(docs, threshold) // doc_a, doc_b, jaccard
    val ids = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val sigs = minhashCols(docs)
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
    val aSide = sigs.columns.filter(_.startsWith("mh"))
      .foldLeft(sigs)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val withA = aSide
      .join(broadcast(pairs), col("doc_id") === col("doc_a"))
      .drop("doc_id")
    val agree = (0 until NumHashes)
      .map(i => when(col(s"a_mh$i") === col(s"mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    sigs.join(broadcast(withA), col("doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        round(agree.cast("double") / NumHashes, 6).as("mh_est"),
        round(abs(col("jaccard") - agree.cast("double") / NumHashes), 6)
          .as("abs_err"))
      .orderBy("doc_a", "doc_b")
  }

  /** Cross-document shingle-share profile per source: what fraction of
    * each document's distinct 3-token shingles also occur in at least
    * one OTHER document — the corpus-level boilerplate/duplication
    * diagnostic read before choosing dedup thresholds (a source whose
    * docs share most of their shingles is template-heavy; near-dup
    * thresholds tuned on a low-share source will under-fire there).
    *
    * Join-free, one corpus-sized shuffle: per-(doc, shingle-hash) rows
    * aggregate once, the shingle's document frequency is a window count
    * over the hash partition (the q55/q57 decomposition), and
    * everything after is doc-level. Shingles travel as 60-bit hashes;
    * "shared" means document frequency > 1, so a shingle repeated only
    * WITHIN one doc does not count (distinct-per-doc by construction).
    * Integer counts, one final divide. */
  def crossDocShingleShare(docs: DataFrame, k: Int = 3): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val dg = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        explode(shingleHashes(col("text"), k, "xd")).as("g"))
    val perDoc = dg
      .withColumn("ddf", count(lit(1)).over(W.partitionBy(col("g"))))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("ddf") > 1, 1L).otherwise(0L)).as("n_shared"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_shared")).cast("double") / sum(col("n_shingles")), 6)
          .as("shared_shingle_frac"))
      .orderBy("source")
  }

  /** Bounded-evidence cap for the q138 eval detail: at most this many
    * train docs witnessed per shingle (lowest doc_ids). Referenced by
    * the oracle SQL so both engines move in lockstep. */
  val DeconEvidenceCap = 64

  /** Eval-suite stand-in modulus for the 13-gram tier (q134–q141):
    * hash64(doc_id, "eval") % this == 0 → eval. One site, rendered
    * into both the Spark defaults and the oracle texts (the
    * DeconEvidenceCap lockstep discipline, r15 VERDICT task 6). */
  val DeconEvalMod = 20L

  /** Banner-planting modulus for the planted twins (q135/q138/q141):
    * hash64(doc_id, "plant") % this == 0 gets [[DeconBanner]]
    * prepended on both sides of the split. */
  val DeconPlantMod = 4L

  /** The fixed 16-token contamination banner the PLANTED gate (q135)
    * prepends: 16 tokens guarantee at least one pure-banner 13-gram,
    * and planted train docs share it with planted eval docs. */
  val DeconBanner: String =
    "[[DeconBanner]] zero one two three four five six seven eight " +
      "nine ten eleven twelve thirteen fourteen"

  /** Benchmark decontamination at the PUBLISHED 13-gram convention —
    * the strict-tier complement to `Curation.decontaminationSummary`
    * (q44, 3-gram: a sensitive screen where any shared phrase flags)
    * and `Curation.contaminatedEvalDocs` (q74, the eval-side detail).
    * 3-gram overlap is mostly benign phrase collision; shipping
    * decisions key off long-n-gram overlap, so this tier reports what
    * actually blocks a training run: a TRAINING document is
    * contaminated if any of its distinct k-token shingles (k = 13)
    * also occurs in the held-out EVAL suite. Eval stand-in = docs with
    * hash64(doc_id, "eval") % evalMod == 0 — a HASH split where q44
    * keeps the raw modulo, because doc_id ranges correlate with source
    * and a 13-gram tier needs hits spread across sources. With
    * `plantBanner`, docs with hash64(doc_id, "plant") % 4 == 0 get
    * [[Dedup.DeconBanner]] prepended on BOTH sides of the split
    * (mirrored verbatim in the oracle), so the hit path is exercised
    * at strength on every source instead of riding the corpus's one
    * or two natural near-dup pairs.
    *
    * Returns per-source: train docs, contaminated docs, hit
    * (doc, shingle) pairs, contamination fraction — reported over a
    * per-source spine from the TRAIN split so a source with zero hits
    * still emits its row.
    *
    * Scale shape: shingles travel as 60-bit hashes, never text; the
    * contamination test is one LEFT SEMI join of train (doc, hash)
    * pairs against the eval suite's distinct hashes — in production
    * the eval side is a benchmark suite (thousands of docs), so AQE
    * broadcasts it and the train side never reshuffles; here the
    * stand-in eval is corpus/evalMod and the join degrades gracefully
    * to a shuffle of 8-byte keys. Nothing is all-pairs; doc-level
    * rollups happen after the semi-join prune. */
  def decontaminationReport(docs: DataFrame, k: Int = 13,
                            evalMod: Long = DeconEvalMod,
                            plantBanner: Boolean = false): DataFrame = {
    val base = deconBase(docs, evalMod, plantBanner)
    val evalHashes = base.where(col("is_eval"))
      .select(explode(shingleHashes(col("text"), k, "dc")).as("g"))
      .distinct()
    val trainPairs = base.where(!col("is_eval"))
      .select(col("doc_id"), col("source"),
        explode(shingleHashes(col("text"), k, "dc")).as("g"))
    val hits = trainPairs.join(evalHashes, Seq("g"), "left_semi")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_hit"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"),
        sum(col("n_hit")).as("n_hit_pairs"))
    base.where(!col("is_eval"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_train_docs"))
      .join(hits, Seq("source"), "left")
      .na.fill(0L, Seq("n_contaminated", "n_hit_pairs"))
      .select(col("source"), col("n_train_docs"), col("n_contaminated"),
        col("n_hit_pairs"),
        round(col("n_contaminated").cast("double") / col("n_train_docs"), 6)
          .as("contamination_frac"))
      .orderBy("source")
  }

  /** APPLY the 13-gram decontamination — the ship operator the
    * q134/q135 report (and the q138 eval detail) exist to inform:
    * drop every training document that shares at least one 13-gram
    * with the eval suite and emit the per-source ship digest, with a
    * content hash over the KEPT corpus so the gate certifies the
    * actual artifact a training run would read, not just its counts.
    * Same [[deconBase]] (split + planting) as the report, so
    * `n_dropped` here is definitionally the report's
    * `n_contaminated` — pinned as a spec invariant.
    *
    * Scale shape: the hit test is the report's LEFT SEMI join of
    * train (doc, hash) pairs vs the eval suite's distinct hashes
    * (eval side broadcast-sized in production), followed by ONE
    * LEFT ANTI join on doc_id — 8-byte keys, output sized by true
    * contamination. The kept-corpus hash folds per partition
    * (partial sum) so certifying the artifact adds no extra
    * exchange. Per-source spine from the full train split: a source
    * with everything kept (or everything dropped) still emits. */
  def decontaminateCorpus13(docs: DataFrame, k: Int = 13,
                            evalMod: Long = DeconEvalMod,
                            plantBanner: Boolean = false): DataFrame = {
    val base = deconBase(docs, evalMod, plantBanner)
    val evalHashes = base.where(col("is_eval"))
      .select(explode(shingleHashes(col("text"), k, "dc")).as("g"))
      .distinct()
    val train = base.where(!col("is_eval"))
    val hitDocs = train
      .select(col("doc_id"), explode(shingleHashes(col("text"), k, "dc")).as("g"))
      .join(evalHashes, Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()
    deconShipDigest(train, hitDocs)
  }

  /** The q141 ship-digest tail, shared with the STREAMING admission
    * path (q147) so the per-source digest and the '#ka' content-hash
    * construction cannot drift between the batch apply and the
    * quarantine-at-ingest composition: drop `hitDocs` from `train`
    * (ONE LEFT ANTI on doc_id), roll up per source over the full
    * train spine, certify the kept corpus by partial-summed content
    * hash. */
  private[graft] def deconShipDigest(train: DataFrame,
                                     hitDocs: DataFrame): DataFrame = {
    val kept = train.join(hitDocs, Seq("doc_id"), "left_anti")
    train.groupBy(col("source")).agg(count(lit(1)).as("n_train_docs"))
      .join(kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(hash64(col("text"), "ka") % 1000000000L).as("kept_hash_sum")),
        Seq("source"), "left")
      .na.fill(0L, Seq("n_kept", "kept_hash_sum"))
      .select(col("source"), col("n_train_docs"),
        (col("n_train_docs") - col("n_kept")).as("n_dropped"),
        col("n_kept"), col("kept_hash_sum"))
      .orderBy("source")
  }

  /** The q134/q135/q138 corpus prep, shared so the train/eval split
    * and the banner planting cannot drift between the per-source
    * rollup and the per-eval-doc detail: optional [[DeconBanner]]
    * prepend on hash64(doc_id, "plant") % 4 == 0, then the
    * hash64(doc_id, "eval") % evalMod eval flag. */
  private[graft] def deconBase(docs: DataFrame, evalMod: Long,
                               plantBanner: Boolean): DataFrame = {
    val planted =
      if (!plantBanner) docs.select(col("doc_id"), col("source"), col("text"))
      else docs.select(col("doc_id"), col("source"),
        when(hash64(col("doc_id").cast("string"), "plant") % DeconPlantMod === 0,
          concat(lit(DeconBanner + " "), col("text")))
          .otherwise(col("text")).as("text"))
    graft.sources.Corpus.fanOutSmallScan(planted)
      .withColumn("is_eval",
        hash64(col("doc_id").cast("string"), "eval") % evalMod === 0)
  }

  /** EVAL-side detail of the 13-gram tier (q138) — q74's treatment at
    * the published decontamination convention, completing the pair
    * r14 VERDICT task 6 asked for: [[decontaminationReport]] (q134/
    * q135) rolls contamination up per training SOURCE (how dirty is
    * the corpus); this reports per EVAL document (which benchmark
    * items are compromised, and how badly) — the view an eval owner
    * reads to decide whether an item must be dropped from the suite.
    * Same split, same planting, same "dc" shingle hashes as the
    * rollup, by construction (shared [[deconBase]]).
    *
    * Returns one row per CONTAMINATED eval doc (q74's convention —
    * clean items stay silent): `n_hit_shingles` (EXACT distinct
    * compromised 13-grams) and `n_train_docs` (distinct training docs
    * among the BOUNDED evidence — see below; a saturating lower
    * bound).
    *
    * Scale shape — the bounded-evidence discipline. The naive
    * eval×train join on the shingle hash is quadratic in any shingle
    * shared corpus-wide: a boilerplate 13-gram held by E eval and T
    * train docs materializes E×T rows, and a banner-grade shingle
    * (25 % of docs) turns the join into a billions-of-rows clique at
    * 100× (measured: the unbounded spelling spilled >37 GB at sf10
    * before being killed, r15). No per-eval-doc exact distinct-train
    * count can avoid those pairs — so the operator bounds them: the
    * train side keeps at most `maxEvidencePerShingle` docs per
    * shingle (deterministically the lowest doc_ids — one
    * row_number window over (g, train_doc), the same bounded-verifier
    * pattern as the dedup tier's all-pairs check). Join output is
    * then ≤ distinct-hit-shingles × L instead of E×T.
    * `n_hit_shingles` is UNAFFECTED (every hit shingle keeps ≥1
    * evidence row); `n_train_docs` saturates near L for
    * boilerplate-grade overlap — exactly the signal an eval owner
    * needs, since "≥64 distinct train docs" already means the item
    * must be dropped. The eval side stays broadcast-sized in
    * production (a benchmark suite); the evidence window shuffles
    * only the train (g, doc) pairs the semi-join tier already
    * shuffles. */
  def contaminatedEvalDocs13(docs: DataFrame, k: Int = 13,
                             evalMod: Long = DeconEvalMod,
                             plantBanner: Boolean = false,
                             maxEvidencePerShingle: Int = DeconEvidenceCap): DataFrame = {
    val base = deconBase(docs, evalMod, plantBanner)
    val evalPairs = base.where(col("is_eval"))
      .select(col("doc_id").as("eval_doc"), col("source"),
        explode(shingleHashes(col("text"), k, "dc")).as("g"))
    val wEv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("train_doc"))
    val trainEvidence = base.where(!col("is_eval"))
      .select(col("doc_id").as("train_doc"),
        explode(shingleHashes(col("text"), k, "dc")).as("g"))
      .withColumn("rn", row_number().over(wEv))
      .where(col("rn") <= maxEvidencePerShingle)
      .drop("rn")
    evalPairs.join(trainEvidence, Seq("g"))
      .groupBy(col("eval_doc"), col("source"))
      .agg(count_distinct(col("train_doc")).as("n_train_docs"),
        count_distinct(col("g")).as("n_hit_shingles"))
      .orderBy("eval_doc")
  }

  /** Incremental (delta-vs-base) dedup summary: the admission gate a
    * production pipeline runs on every NEW batch of documents against
    * the standing corpus — the asymmetric form of dedup that the
    * corpus-vs-itself tiers (q16–q21) do not cover. Documents with
    * `hash64(doc_id) % deltaMod == 0` stand in for the incoming batch;
    * the rest are the base corpus. A delta doc is dropped if its hash
    * already exists in the base (exact tier) or if it verifies as a
    * near-duplicate (shingle Jaccard ≥ threshold) of ANY base doc via
    * banded MinHash-LSH (near tier). Returns per-source counts:
    * delta docs, exact hits, near hits (exact hits excluded), admitted.
    * The stand-in batch is a HASH split (hash64(doc_id) % deltaMod),
    * not a raw modulo: the corpus assigns doc_id ranges per source, so
    * a modulo split would put the whole batch in 2 of 20 sources.
    *
    * Scale shape: the exact tier is a semi-join of delta hashes against
    * base hashes (base side streams; no text through the shuffle). The
    * near tier joins DELTA band keys against BASE band keys — an
    * equi-join on (band, bkey) where the delta side is one ingest batch:
    * AQE broadcasts it when genuinely small and shuffles both sides
    * otherwise, either way never all-pairs. Jaccard verification
    * re-attaches shingle sets only for candidate members on BOTH sides
    * (broadcast semi-join prune, same as lshNearDupPairs), so verify
    * CPU scales with candidate volume, not corpus size. */
  def incrementalDedupSummary(docs: DataFrame, deltaMod: Long,
                              threshold: Double): DataFrame = {
    val (base, delta) = deltaSplit(docs, deltaMod)
    // asymmetric LSH: delta bands ⋈ base bands on the bucket key
    val candRaw = bandedKeys(delta).as("d")
      .join(bandedKeys(base).as("b"), Seq("band", "bkey"))
      .select(col("d.doc_id").as("delta_id"), col("b.doc_id").as("base_id"))
      .distinct()
    incrementalSummaryFromCandidates(docs, base, delta, candRaw, threshold)
  }

  /** The q68 delta/base split, shared by every incremental tier. */
  private[graft] def deltaSplit(docs: DataFrame, deltaMod: Long)
      : (DataFrame, DataFrame) = {
    val isDelta = hash64(col("doc_id").cast("string"), "inc") % deltaMod === 0
    (docs.where(!isDelta), docs.where(isDelta))
  }

  /** Exact + verify + summary tail shared by the in-memory (q68) and
    * persisted-band-store (q99) incremental tiers — the candidate
    * source is the only difference between them, and the gate pins
    * that both produce identical output. */
  private def incrementalSummaryFromCandidates(
      docs: DataFrame, base: DataFrame, delta: DataFrame,
      candRaw: DataFrame, threshold: Double): DataFrame = {
    val baseH = base.select(sha2(col("text"), 256).as("h")).distinct()
    val exactHits = delta.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(baseH, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()

    val cand = candRaw
      .localCheckpoint(true) // feeds the id set + both verify joins once
    val candIds = cand
      .select(explode(array(col("delta_id"), col("base_id"))).as("doc_id"))
      .distinct()
    val shTbl = graft.sources.Corpus.fanOutSmallScan(docs)
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shinglesOf(col("text"), ShingleK).as("sh"))
    val withD = shTbl
      .join(broadcast(cand), col("doc_id") === col("delta_id"))
      .select(col("delta_id"), col("base_id"), col("sh").as("shd_"))
    val nearHits = shTbl
      .join(broadcast(withD), col("doc_id") === col("base_id"))
      .where(jaccard(col("shd_"), col("sh")) >= threshold)
      .select(col("delta_id").as("doc_id")).distinct()

    val flagged = delta
      .join(exactHits.withColumn("_ex", lit(1)), Seq("doc_id"), "left")
      .join(nearHits.withColumn("_nr", lit(1)), Seq("doc_id"), "left")
    flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_delta"),
        sum(coalesce(col("_ex"), lit(0))).cast("long").as("n_exact_dup"),
        sum(when(col("_ex").isNull && col("_nr") === 1, 1L).otherwise(0L))
          .as("n_near_dup"),
        sum(when(col("_ex").isNull && col("_nr").isNull, 1L).otherwise(0L))
          .as("n_admitted"))
      .orderBy("source")
  }

  /** Build the PERSISTED base band table (q99's store): `bandedKeys`
    * of the standing corpus written as a BUCKETED table on
    * (band, bkey) — the artifact a nightly compaction job produces so
    * each day's ingest batch joins against it WITHOUT re-hashing the
    * corpus and WITHOUT shuffling the base side (the bucketed scan
    * already has the join's partitioning; only the day's delta moves).
    * This executes SCALE.md's "precomputed and persisted
    * bucketed-by-(band, bkey)" claim rather than asserting it. */
  def buildBandStore(base: DataFrame, table: String, path: String,
                     nBuckets: Int = 16): Unit =
    bandedKeys(base).write.mode("overwrite")
      .bucketBy(nBuckets, "band", "bkey").sortBy("band", "bkey")
      .option("path", path)
      .saveAsTable(table)

  /** Fold an admitted batch INTO the standing band store — lifecycle
    * parity with [[Winnow.appendWinnowStore]] (r17 VERDICT task 2:
    * the nightly LSH-band artifact must absorb each day's admitted
    * batch, or tomorrow's ingest re-admits today's content). Bucketed
    * `insertInto` writes the batch's band keys into the table's own
    * ((band, bkey), 16) bucket spec, so the no-base-shuffle probe
    * property survives appends (spec-pinned: probe-after-append ==
    * probe-of-rebuilt-store). */
  def appendBandStore(batch: DataFrame, table: String): Unit =
    bandedKeys(batch).write.mode("append").insertInto(table)

  /** Compact the standing band store IN PLACE — [[appendBandStore]]
    * folds batches blindly, so a replayed batch duplicates
    * (doc_id, band, bkey) rows: candidate CORRECTNESS survives (the
    * candidate join ends in DISTINCT pairs) but store bytes and probe
    * scan cost grow monotonically, exactly the winnow-store hazard.
    * DISTINCT rewrite preserving the bucket spec, with the shared
    * crash-safety + single-writer contract
    * ([[StoreOps.compactBucketed]]). Spec-pinned: probe-before ==
    * probe-after, rows shrink to distinct, `Bucketed: true`
    * survives. */
  def compactBandStore(spark: org.apache.spark.sql.SparkSession,
                       table: String, path: String,
                       nBuckets: Int = 16): Unit =
    StoreOps.compactBucketed(spark, table, path, nBuckets,
      Seq("band", "bkey"), Seq("doc_id", "band", "bkey"))

  /** Candidate generation against the persisted band table — exposed
    * for the plan pin: with broadcast off, the base side must scan
    * bucketed (no Exchange); only the delta side shuffles. */
  private[graft] def bandStoreCandidates(delta: DataFrame,
                                         table: String): DataFrame =
    delta.sparkSession.table(table).as("b")
      .join(bandedKeys(delta).as("d"), Seq("band", "bkey"))
      .select(col("d.doc_id").as("delta_id"), col("b.doc_id").as("base_id"))
      .distinct()

  /** One store build per (process, table, base fingerprint) — the
    * nightly-artifact stance (build-once-probe-thereafter, the q78
    * IVF store stance), HARDENED exactly like the winnow store's memo
    * (r17, closing the ADVICE-r16 "same precedent" note): the memo
    * value carries an ID-SET-shaped base fingerprint (count + max +
    * id-hash sum — one narrow doc_id-column aggregate per probe call,
    * never the text), so a CHANGED base at the same table+path
    * rebuilds instead of silently probing yesterday's bands, and a
    * fresh SparkSession in the same JVM rebuilds too (the memo alone
    * would hit while the new session's catalog lacks the table).
    * The signature carries the same id-set shape + n_chars content
    * moment as the winnow store ([[Winnow.baseSignature]]); an
    * in-place TEXT mutation preserving both the doc_id set AND total
    * n_chars is the residual undetected case — rebuild explicitly via
    * [[buildBandStore]]. Builds serialize per location under a
    * per-key monitor ([[StoreOps.ensure]], ADVICE r17). */
  private[pipeline] def ensureBandStore(base: DataFrame, table: String,
                                        path: String): Unit = {
    val want = Winnow.baseSignature(base, "bs")
    StoreOps.ensure(s"$table@$path", want,
      base.sparkSession.catalog.tableExists(table)) {
      buildBandStore(base, table, path)
    }
  }

  /** Incremental dedup THROUGH the persisted band store (q99): same
    * delta/base split, exact tier, verification, and summary as q68 —
    * the only difference is that base candidates come from the
    * bucketed table instead of an in-session `bandedKeys(base)` — and
    * the gate shares q68's oracle verbatim, pinning store == memory. */
  def incrementalDedupViaBandStore(docs: DataFrame, deltaMod: Long,
                                   threshold: Double, table: String,
                                   path: String): DataFrame = {
    val (base, delta) = deltaSplit(docs, deltaMod)
    ensureBandStore(base, table, path)
    incrementalSummaryFromCandidates(docs, base, delta,
      bandStoreCandidates(delta, table), threshold)
  }

  /** Bloom-filter ingest admission (q97): the 100 TB spelling of the
    * q68 exact tier. The standing corpus's content-hash set becomes a
    * BROADCAST Bloom sketch (public `org.apache.spark.util.sketch`
    * API; built once per base version, the artifact a nightly
    * compaction persists next to the data). The delta then splits
    * scan-locally: Bloom-NEGATIVE rows are definitely new — admitted
    * with zero shuffle — and only Bloom-POSITIVE rows (true dups +
    * fpp of the new rows) reach the exact semi/anti join. The output
    * is therefore IDENTICAL to the plain anti-join at any fpp — false
    * positives get re-checked exactly — which is what makes this
    * hard-oracle gateable; fpp only dials how much of the delta pays
    * the shuffle. At fpp=1% a 99%-new daily batch shuffles ~1% of its
    * rows instead of all of them; the base side still streams through
    * the join but only against that sliver.
    *
    * Build and probe are the NATIVE expression pair Spark's own
    * runtime-filter injection uses: `BloomFilterAggregate` produces
    * the serialized sketch in one aggregation pass, and
    * `BloomFilterMightContain` — a codegen'd Predicate — probes it,
    * so the Bloom-negative path stays inside whole-stage codegen
    * (the earlier spelling probed via a Scala UDF over a broadcast
    * sketch, which cut codegen at that filter — VERDICT r10). Both
    * sides hash the content hash to a LONG with xxhash64, the one
    * value type putLong/mightContainLong agree on across the pair.
    * Filter sizing: self-sized here with one count over the base hash
    * projection; production passes the known base cardinality from
    * metadata instead. */
  def bloomAdmissionSummary(docs: DataFrame, baseMod: Long,
                            fpp: Double): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim
    val spark = docs.sparkSession
    val base = docs.where(col("doc_id") % baseMod === 0)
    val delta = docs.where(col("doc_id") % baseMod =!= 0)
    // Materialized ONCE PER SESSION (SessionCache, lineage-keyed): the
    // hash projection feeds the sizing count, the sketch-build
    // subquery plan, and both exact-recheck joins — left lazy each
    // would re-scan the base corpus, and a per-CALL checkpoint would
    // pin a fresh copy in the block manager on every bench invocation.
    // This pair IS the artifact a production deployment persists next
    // to the data (projection + sketch plan, rebuilt when the input
    // files' lineage fingerprint changes).
    val (baseH, bfPlan) = graft.SessionCache.getOrBuild(spark,
      ("bloom_admission_base",
        graft.SessionCache.lineageFingerprint(docs), baseMod, fpp)) {
      val h = base.select(sha2(col("text"), 256).as("h")).distinct()
        .localCheckpoint(true)
      val n = math.max(h.count(), 1L)
      val numBits = math.max(org.apache.spark.util.sketch.BloomFilter
        .optimalNumOfBits(n, fpp), 64L)
      val agg = new BloomFilterAggregate(
        graftshim.expression(xxhash64(col("h"))), Literal(n), Literal(numBits))
      val plan = h.agg(graftshim.column(agg.toAggregateExpression()).as("bf"))
        .queryExecution.analyzed
      (h, plan)
    }
    // The sketch reaches the probe side as a SCALAR SUBQUERY over the
    // checkpointed hash projection — the exact shape Spark's own
    // InjectRuntimeFilter uses — not as a plan Literal (r11 finding 2:
    // a GB-sized production sketch embedded in the plan text would be
    // serialized with every task binary). The subquery executes once
    // per query and its one-row result broadcasts to tasks; ReuseSubquery
    // collapses the neg/pos twins within a single execution.
    def mightContain = graftshim.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bfPlan),
      graftshim.expression(xxhash64(col("h")))))

    val dh = delta.select(col("doc_id"), col("source"),
      sha2(col("text"), 256).as("h"))
    val neg = dh.where(!mightContain)  // definitely new, no shuffle
    val pos = dh.where(mightContain)   // maybe seen: exact re-check
    val posDup = pos.join(baseH, Seq("h"), "left_semi")
    val posNew = pos.join(baseH, Seq("h"), "left_anti")

    val admitted = neg.unionByName(posNew)
      .groupBy("source").agg(count(lit(1)).as("n_admitted"))
    val dups = posDup.groupBy("source").agg(count(lit(1)).as("n_dup"))
    dh.groupBy("source").agg(count(lit(1)).as("n_delta"))
      .join(admitted, Seq("source"), "left")
      .join(dups, Seq("source"), "left")
      .select(col("source"), col("n_delta"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"))
      .orderBy("source")
  }

  /** Document novelty profile (q86): per source, the fraction of each
    * document's distinct shingles that FIRST appear in that document
    * (ingest order = doc_id). Boilerplate-heavy or near-duplicate
    * content scores low; genuinely new text scores high — the
    * contribution signal a curation pipeline uses to rank sources
    * beyond binary dedup. First occurrence = min(doc_id) per shingle
    * hash: one shuffle keyed by the 8-byte hash (the same vocabulary
    * shuffle as q49/q64), then integer counts with ONE divide, so the
    * gate hash is exact. At 100 TB the shingle→min(doc_id) table is
    * the corpus vocabulary — partial+final aggregation handles it; no
    * text crosses the shuffle. */
  def noveltyProfile(docs: DataFrame): DataFrame = {
    val sh = graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("doc_id"), col("source"),
        explode(shinglesOf(col("text"), ShingleK)).as("s"))
      .select(col("doc_id"), col("source"), hash64(col("s"), "nv").as("g"))
    val firstSeen = sh.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    val perDoc = sh.join(firstSeen, "g")
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .as("n_novel"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_novel")).cast("double") / sum(col("n_sh")), 6)
          .as("novel_shingle_frac"))
      .orderBy("source")
  }

  // ================ paragraph-level (intra-doc unit) dedup ================

  /** Boilerplate strings the q123 fixture plants corpus-wide (a site
    * banner in every doc_id%3==0 document, a footer in every
    * doc_id%5==0 one) — the duplicated-across-the-web unit the
    * paragraph pass exists to strip. */
  val ParaBanner = "subscribe to our newsletter today"
  val ParaFooter = "all rights reserved"

  /** The HOT boilerplate the q126 skew fixture plants into every
    * doc_id%2==0 document (50%+ of the corpus) — a single paragraph
    * key holding half of all occurrences, the adversarial shape for
    * the keeper-propagate join. */
  val ParaHot = "click here to accept cookies and continue"

  /** Deterministic paragraph structure planted over the documents
    * table (the corpus text is one line, so the gate constructs the
    * multi-paragraph shape both engines can recompute): each doc's
    * tokens split into three contiguous segments (boundaries at
    * ⌊n/3⌋ and ⌊2n/3⌋), with [[ParaBanner]] inserted at position 1
    * for doc_id%3==0 and [[ParaFooter]] appended for doc_id%5==0.
    * Output: one row per (doc_id, source, para_idx, para). */
  def plantedParagraphs(docs: DataFrame): DataFrame =
    planted(docs, hot = false)

  /** The q126 skew fixture: [[plantedParagraphs]]' structure with
    * [[ParaHot]] additionally PREPENDED to every doc_id%2==0 document
    * — one content key now holds ≥50% of the corpus's documents'
    * worth of occurrences, the planted-hot-key shape that proves the
    * keeper propagate does not serialize a boilerplate key into one
    * task. */
  def plantedParagraphsHot(docs: DataFrame): DataFrame =
    planted(docs, hot = true)

  private def planted(docs: DataFrame, hot: Boolean): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val b1 = (n / 3).cast("int")
    val b2 = (n * 2 / 3).cast("int")
    val segs = array(
      array_join(slice(toks, lit(1), b1), " "),
      array_join(slice(toks, b1 + 1, b2 - b1), " "),
      array_join(slice(toks, b2 + 1, n - b2), " "))
    val withBanner = when(col("doc_id") % 3 === 0,
      concat(slice(segs, 1, 1), array(lit(ParaBanner)), slice(segs, 2, 2)))
      .otherwise(segs)
    val withFooter = when(col("doc_id") % 5 === 0,
      concat(withBanner, array(lit(ParaFooter)))).otherwise(withBanner)
    val paras =
      if (!hot) withFooter
      else when(col("doc_id") % 2 === 0,
        concat(array(lit(ParaHot)), withFooter)).otherwise(withFooter)
    docs.select(col("doc_id"), col("source"),
        posexplode(paras).as(Seq("para_idx", "para")))
  }

  /** Floor on the hot-key cut: below this many occurrences a key
    * cannot meaningfully skew a task, whatever the corpus size, so
    * tiny corpora never pay the salting fan-out. Low enough that unit
    * tests and the sf0.01 gate exercise the hot path on the planted
    * boilerplate. */
  private[graft] val HotKeyFloor = 64L

  /** Static salt factor for the SQL spelling of the hot paragraph
    * tier (q130). The declarative tier cannot derive a factor from
    * the data the way [[saltedKeeperFlags]] does, and AQE's skew
    * split measurably never fires on the keeper join (the keeper
    * aggregate reuses the join's h-shuffle — PlanShapeSpec pins the
    * ceiling), so the SQL text replicates keepers over this many
    * salt values and joins on (h, salt). At cluster scale pick
    * ~parallelism; 8 keeps the test-scale replicate honest while
    * still spreading the planted 50% hot key over 8 tasks. */
  private[graft] val SqlSaltFactor = 8

  /** Keeper propagate with DERIVED hot-key handling — flags every
    * paragraph occurrence with whether it is the corpus-wide first
    * (min (doc_id, para_idx)) occurrence of its content key `h`.
    *
    * The naive `paras.join(keepers, "h")` routes every occurrence of
    * one hot boilerplate key to a single shuffle partition — at
    * billions of occurrences, the classic skew cliff the r12 design
    * left to AQE. This propagate removes the reliance structurally:
    *
    *  - the caller supplies the occurrence count `n` (a driver
    *    scalar — the corpus-sized-width discipline the embedding
    *    buckets use; the paragraph summaries derive it from the
    *    planting's closed form over a doc_id-only pruned scan, so the
    *    sizing pass costs milliseconds where a paras.count() would
    *    rebuild every paragraph string), and the hot cut becomes the
    *    literal `max(HotKeyFloor, n/parts)` (parts = the session's
    *    shuffle partitioning): a key is hot when it alone would fill
    *    an average shuffle partition. At most `n/cut ≤ parts` keys
    *    can qualify, so the hot set is broadcastable BY CONSTRUCTION
    *    at any corpus size (≤ parts rows of 64-byte keys), not by
    *    hope — an inexact `n` only nudges the cut, never correctness;
    *  - key stats (keeper + count) come from a partial+final
    *    aggregate (hot keys fold map-side, so the stats pass is
    *    itself skew-immune); the hot and cold branches project the
    *    SAME aggregate, so its shuffle is planned once and reused;
    *  - hot occurrences take their keeper from a BROADCAST left join
    *    (the keeper comes TO them; they never enter a shuffle), and
    *    get a salt `pmod(hash(doc_id, para_idx), width)` with
    *    `width = ceil(cnt·parts/n)` capped at parts — proportional
    *    to how many average partitions the key's occurrences amount
    *    to;
    *  - the ONE keeper join runs on (h, salt) against the COLD
    *    keepers (salt 0): cold occurrences match their keeper there,
    *    while already-flagged hot occurrences match nothing and
    *    spread across `width` ~average-sized partitions instead of
    *    serializing into one task.
    *
    * Results are exactly the unsalted join's (PipelineSpec pins
    * equality and the salt spread); unskewed corpora pay one count
    * pass and one tiny (usually empty) broadcast, nothing else. */
  private[graft] def saltedKeeperFlags(paras: DataFrame,
                                       totalRows: Long): DataFrame = {
    val parts = paras.sparkSession.sessionState.conf.numShufflePartitions
      .toLong
    val n = math.max(1L, totalRows)
    val cut = math.max(HotKeyFloor, n / parts)
    // integer ceiling via SQL `div` — Column `/` is double division and
    // could round the ceiling off by one at extreme cnt*parts magnitudes
    val width = least(lit(parts),
      expr(s"(cnt * ${parts}L + ${n - 1}L) div ${n}L")).cast("int")
    val keyStats = paras.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("para_idx"))).as("keeper"),
        count(lit(1)).as("cnt"))
    val hot = keyStats.where(col("cnt") >= cut)
      .select(col("h"), col("keeper").as("hot_keeper"), width.as("width"))
    // the cold salt is zero via a NON-FOLDABLE expression: a literal 0
    // would constant-propagate into a residual `paras.salt = 0` join
    // CONDITION, demoting the join's distribution key to h alone —
    // which would route every hot occurrence through the h partition
    // again, the exact cliff this operator removes
    val cold = keyStats.where(col("cnt") < cut)
      .select(col("h"), col("keeper"),
        pmod(hash(col("h")), lit(1)).as("salt"))
    paras
      .join(broadcast(hot), Seq("h"), "left")
      .withColumn("salt",
        when(col("width").isNotNull,
          pmod(hash(col("doc_id"), col("para_idx")), col("width")))
          .otherwise(lit(0)))
      .join(cold, Seq("h", "salt"), "left")
      .select(col("doc_id"), col("source"), col("para_idx"), col("para"),
        col("salt"),
        when(col("hot_keeper").isNotNull,
          col("hot_keeper.doc_id") === col("doc_id") &&
            col("hot_keeper.para_idx") === col("para_idx"))
          .otherwise(col("keeper.doc_id") === col("doc_id") &&
            col("keeper.para_idx") === col("para_idx")).as("kept"))
  }

  /** Corpus-wide PARAGRAPH-level exact dedup (q123) — the C4/
    * RefinedWeb-style cleanup no document-level pass can do: a
    * paragraph occurrence survives iff it is the corpus-wide FIRST
    * occurrence of its content (ordered by doc_id, then position), so
    * boilerplate repeated across millions of pages is stripped
    * everywhere but its first sighting while unique prose is
    * untouched. Docs are then REASSEMBLED from their surviving
    * paragraphs in original order.
    *
    * Scale shape, deliberately: paragraphs travel as sha256 CONTENT
    * KEYS (64 bytes regardless of paragraph size); the keeper per key
    * is a partial+final `min(struct(doc_id, idx))` aggregate — NOT a
    * row_number window, because a window partition on a boilerplate
    * key holds ONE ROW PER OCCURRENCE (billions at web scale, all in
    * one partition = the classic skew cliff), while the agg folds the
    * same hot key map-side on every input partition. Keeper
    * propagation runs through [[saltedKeeperFlags]] — hot keys
    * (derived cut, broadcast-bounded set) spread over a salted
    * (h, salt) join instead of relying on AQE to split the one
    * partition holding every occurrence of a boilerplate key.
    * Reassembly is one groupBy(doc) over bounded-size per-doc
    * paragraph lists. */
  def paragraphDedupSummary(docs: DataFrame): DataFrame =
    paragraphSummaryOf(docs, hot = false)

  /** Gate composition (q126): [[paragraphDedupSummary]]'s dataflow
    * over the HOT planting — [[ParaHot]] in 50%+ of documents — so
    * the oracle grades the keeper propagate under real skew and
    * PipelineSpec pins that the hot key's occurrences spread across
    * multiple salt partitions. */
  def paragraphDedupHotSummary(docs: DataFrame): DataFrame =
    paragraphSummaryOf(docs, hot = true)

  private def paragraphSummaryOf(docs: DataFrame, hot: Boolean): DataFrame = {
    // paragraph count from the planting's closed form: 3 segments per
    // doc + the planted residues — a doc_id-only pruned scan
    val parasPerDoc = lit(3L) +
      when(col("doc_id") % 3 === 0, 1L).otherwise(0L) +
      when(col("doc_id") % 5 === 0, 1L).otherwise(0L) +
      (if (hot) when(col("doc_id") % 2 === 0, 1L).otherwise(0L) else lit(0L))
    val total: Long = Option(docs.agg(sum(parasPerDoc)).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val paras = planted(docs, hot)
      .select(col("doc_id"), col("source"), col("para_idx"), col("para"),
        sha2(col("para"), 256).as("h"))
    val flagged = saltedKeeperFlags(paras, total)
    val perDoc = flagged.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          filter(array_sort(collect_list(
            struct(col("para_idx"), col("kept"), col("para")))),
            p => p.getField("kept")),
          p => p.getField("para")), "\n").as("cleaned"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_paras")).as("paras_total"),
        sum(col("n_kept")).as("paras_kept"),
        sum(when(col("n_kept") < col("n_paras"), 1L).otherwise(0L))
          .as("docs_changed"),
        sum(hash64Sql(col("cleaned"), "pd") % 1000000000L)
          .as("cleaned_hash_sum"))
      .orderBy("source")
  }

  /** Char-n-gram Jaccard pairs within a bounded id window — the
    * verification metric used to audit the LSH tier (all-pairs is
    * restricted to the window; the scale path IS lshNearDupPairs). */
  def ngramJaccardPairs(docs: DataFrame, n: Int, maxId: Long,
                        threshold: Double): DataFrame = {
    val g = graft.sources.Corpus.fanOutSmallScan(docs.where(col("doc_id") < maxId))
      .select(col("doc_id"), charNgrams(col("text"), n).as("g"))
    val a = g.as("a"); val b = g.as("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(jaccard(col("a.g"), col("b.g")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

}
