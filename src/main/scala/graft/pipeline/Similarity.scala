package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Approximate-nearest-neighbor search over an
  * `embeddings(vec_id, embedding ARRAY<FLOAT>, label)` table.
  *
  * Two tiers:
  *  - `cosineTopK` — exact brute force: one scan, broadcast query
  *    vector, TakeOrderedAndProject top-k. The correctness baseline,
  *    and at 100 TB still the right shape for a SINGLE query (linear
  *    scan, no shuffle, no state).
  *  - `bucketTopK` — LSH path: a deterministic sign-bit coarse
  *    quantizer assigns every vector to a bucket; search only the
  *    query's bucket. At scale the table is written bucket-partitioned
  *    (partitionBy(bucket)), so a query prunes to one partition —
  *    the IVF probe pattern expressed as partition pruning.
  *
  * Per-VECTOR work (double cast, norm) is hoisted into row columns
  * before any join: cosine between a pair is then a single dot product
  * over pre-cast arrays divided by two stored norms. The hoist is
  * bit-identical to inline recomputation (same ops, same order), so
  * the DuckDB oracles need no mirroring change. All scalar work is
  * built-in higher-order functions — no UDFs.
  */
object Similarity {

  /** Sizing rule for the sign-bucket quantizer: enough bits that the
    * EXPECTED bucket population stays at or below `targetPerBucket`.
    * nBits is a REQUIRED parameter on every bucketed operator precisely
    * because a constant cannot survive a 100× corpus: 4 bits = 16
    * global buckets means one task holds 1/16th of all vectors at any
    * scale. Callers size it from a corpus count (exact or estimated —
    * at 100 TB the row-group stats estimate is free):
    * ceil(log2(n / target)).
    *
    * BUFFER FORMULA — what bounds targetPerBucket: the bucket-collect
    * tiers aggregate one row of roughly `dim × bucketPop × 8 B`
    * (pre-cast double embeddings) per bucket. The 10⁴ default is sized
    * for the 64-dim corpus (≈5 MB per collected row); at 768 dims the
    * same target is a ~60 MB aggregation row — legal but heavy. For
    * wide vectors use `sizedNBitsForDim`, which derives the target
    * from a per-bucket byte budget instead of assuming the dimension. */
  def sizedNBits(corpusVectors: Long, targetPerBucket: Long = 10000L): Int = {
    require(corpusVectors > 0 && targetPerBucket > 0)
    // integer-exact ceil-log2 (== oracleSizedNBits, property-pinned):
    // the earlier ceil(log(x)/log(2)) spelling overshot by one at
    // 2^29/2^31/2^39 — libm's quotient lands a few ulp ABOVE the exact
    // integer and ceil rounds it up. Benign for a sizing dial (one
    // extra bit halves the expected population) but exactly the wobble
    // an oracle-mirrored width cannot afford.
    val m = (corpusVectors + targetPerBucket - 1) / targetPerBucket
    var b = 0
    while ((1L << b) < m) b += 1
    math.max(1, b)
  }

  /** Pair-WORK sizing for the kNN-join tiers: bucket count such that
    * the expected population keeps per-bucket pair generation
    * (≈ pop²/2) at `targetPairsPerBucket`. This is the dial that keeps
    * the bucketed join LINEAR under corpus growth — measured at the
    * sf1 checkpoint (SCALE.md): 10× vectors at a FIXED 16 buckets ran
    * the q71 shape 27× slower (population ×10 → pairs ×100), while
    * re-sizing to hold population constant restored ~linear time.
    * `sizedNBits` bounds per-bucket MEMORY (its documented contract);
    * it is necessary but not sufficient for the join tiers — use this
    * for pair work and recover the recall cost of finer buckets with
    * multi-probe (hammingBall below). */
  def pairSizedNBits(corpusVectors: Long,
                     targetPairsPerBucket: Long = 1L << 21): Int = {
    require(targetPairsPerBucket > 0)
    val targetPop = math.max(1L,
      math.round(math.sqrt(targetPairsPerBucket.toDouble * 2.0)))
    sizedNBits(corpusVectors, targetPop)
  }

  /** Dimension-aware sizing: targetPerBucket = budget / (dim × 8 B),
    * clamped to [256, 10⁴]. With the default 16 MiB per-bucket budget
    * a 64-dim corpus keeps the 10⁴ target (cap) while 768-dim lands at
    * ~2.7k vectors per bucket — the wide-vector default the constant
    * target could not express. The floor keeps pathological dims from
    * exploding the bucket count (recall cost) faster than the buffer
    * saves memory. */
  def sizedNBitsForDim(corpusVectors: Long, dim: Int,
                       bucketBudgetBytes: Long = 16L << 20): Int = {
    require(dim > 0 && bucketBudgetBytes > 0)
    val target = math.min(10000L,
      math.max(256L, bucketBudgetBytes / (dim.toLong * 8L)))
    sizedNBits(corpusVectors, target)
  }

  /** INTEGER-EXACT spelling of `sizedNBits` — same result for every
    * (n, target), proved in PipelineSpec — computed without floating
    * log2, so a DuckDB oracle can recompute the identical width from
    * `count(*)` with integer shifts and stay in lockstep at ANY scale.
    * This is what lets the q29/q58 gates size their buckets from the
    * corpus instead of pinning nBits: the sf1 oracle pass showed a
    * pinned width stops matching an uncapped oracle the moment bucket
    * populations cross `maxBucket` (at 10× the fallback degraded q29
    * to 0.1% recall). A float ceil(log2(…)) here would risk an
    * off-by-one against the oracle's libm at exact powers of two. */
  def oracleSizedNBits(corpusVectors: Long, targetPerBucket: Long): Int = {
    require(corpusVectors > 0 && targetPerBucket > 0)
    val m = (corpusVectors + targetPerBucket - 1) / targetPerBucket
    var b = 0
    while ((1L << b) < m) b += 1
    math.max(1, b)
  }

  /** vec as doubles + its norm (+ sign bucket when nBits > 0). Fans an
    * under-split scan out to all cores first: the per-vector cast/norm
    * work is CPU-bound and must not serialize on one file split. */
  private[graft] def withVectorCols(embeddings: DataFrame, nBits: Int): DataFrame = {
    val base = graft.sources.Corpus.fanOutSmallScan(embeddings).withColumn("ed",
      transform(col("embedding"), x => x.cast("double")))
    // norm via the native sequential-order dot kernel — bit-equal to
    // sqrt(aggregate(transform(ed, x -> x*x), 0.0, +)) (same multiplies
    // and fold order; parity pinned in PipelineSpec)
    val withNorm = base.withColumn("norm",
      sqrt(graft.functions.ArrayDot.column(col("ed"), col("ed"))))
    if (nBits > 0)
      withNorm.withColumn("bucket", signBucket(col("embedding"), nBits))
    else withNorm
  }

  /** Pair cosine on pre-cast arrays and pre-computed norms. The dot is
    * the native ArrayDot kernel: the interpreted zip_with+aggregate
    * fold was the dominant cost of the pair tiers (~780k 64-wide folds
    * for q29 at sf0.1). */
  private[graft] def pairCosine(edA: Column, edB: Column, normA: Column, normB: Column): Column =
    graft.functions.ArrayDot.column(edA, edB) / (normA * normB)

  /** Exact cosine top-k against the vector with id `queryId`. */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val v = withVectorCols(embeddings, 0)
    val q = v.where(col("vec_id") === queryId)
      .select(col("ed").as("q_ed"), col("norm").as("q_norm"))
    v.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(pairCosine(col("ed"), col("q_ed"), col("norm"), col("q_norm")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN top-k restricted to the query's sign-bucket (first `nBits`
    * dimension signs). Recall is traded for a bucket-local scan.
    *
    * The query side is ONE row by contract, so it is collected (the
    * documented query-row-sized collect, as in the PQ/multiprobe tier)
    * and inlined as literals. The previous broadcast self-join
    * (`join(broadcast(q), bucket === q_bucket)` over two branches of
    * one lambda-deriving scan) crashed any FRESH session with
    * INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND: InferFiltersFromConstraints
    * pushes a constraint referencing the pruned lambda attribute into
    * the probe side — the same rewrite class defused in
    * bucketKnnJoinUnsorted (bucket-collect) and semanticAdmitStream
    * (createDataFrame-from-rdd). The literal form removes the join AND
    * its broadcast exchange: one scan, a literal bucket filter, one
    * TakeOrdered — and gives the rewrite nothing to mis-infer. */
  def bucketTopK(embeddings: DataFrame, queryId: Long, k: Int,
                 nBits: Int): DataFrame = {
    val v = withVectorCols(embeddings, nBits)
    val qRows = v.where(col("vec_id") === queryId)
      .select(col("ed"), col("norm"), col("bucket")).collect()
    // 0 query rows: keep the old join semantics (empty result), loudly
    // distinguishable from >1 (a corrupt corpus — vec_id is a key)
    require(qRows.length <= 1,
      s"bucketTopK: query vec_id $queryId matched ${qRows.length} rows")
    val base = v.where(col("vec_id") =!= queryId)
    val matched = qRows.headOption.fold(
      base.where(lit(false)).withColumn("cos", lit(0.0))) { q =>
      base.where(col("bucket") === lit(q.getString(2)))
        .withColumn("cos", round(pairCosine(col("ed"),
          typedLit(q.getSeq[Double](0)), col("norm"),
          lit(q.getDouble(1))), 6))
    }
    matched
      .select(col("vec_id"), col("label"), col("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch k-NN join: for EVERY vector, its top-k neighbors within its
    * sign-bucket — the primitive an embedding-dedup or retrieval
    * pipeline runs over the whole corpus (vs the single-query topK).
    * One bucket-local pair generation + a rank window partitioned by
    * vector: the window shuffles on vec_id, already the pair output's
    * natural key. */
  def bucketKnnJoin(embeddings: DataFrame, k: Int, nBits: Int): DataFrame =
    // sorted on the public/gate surface only — downstream consumers
    // (the label audit) take the unsorted variant
    bucketKnnJoinUnsorted(embeddings, k, nBits).orderBy("vec_id", "rank")

  /** Corpus-sized kNN join — the same adaptive-width rule (and SQL
    * mirror) as the pair tier. This is what closes the q35/q71 scaling
    * outlier for real: round 10 shipped the sizing dial
    * (`pairSizedNBits`) but the GATE kept nBits pinned because the
    * oracle couldn't follow a data-dependent width; with the
    * integer-exact width recomputable in SQL, the gate runs the
    * production rule. Population target 125 keeps per-bucket pair work
    * ~constant under corpus growth (measured: 20.2 s → expected ~5 s
    * at sf1 for the q35 shape at nb=6). */
  def bucketKnnJoinAuto(embeddings: DataFrame, k: Int,
                        targetPerBucket: Long = 125L): DataFrame =
    bucketKnnJoin(embeddings, k,
      oracleSizedNBits(math.max(embeddings.count(), 1L), targetPerBucket))

  private def bucketKnnJoinUnsorted(embeddings: DataFrame, k: Int,
                                    nBits: Int): DataFrame = {
    // Bucket-collect instead of a self-join: members of each bucket are
    // gathered once and all ordered pairs are generated bucket-locally.
    // (A self-join formulation hits a Spark attribute-rebinding bug
    // here — lambda-captured references under a Window miss the
    // self-join dedup rewrite: INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at
    // task time. The collect form is also one shuffle cheaper.)
    val v = withVectorCols(embeddings, nBits)
      .select(col("vec_id"), col("ed"), col("norm"), col("bucket"))
    val pairs = v
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col("vec_id"), col("ed"), col("norm"))).as("ms"))
      .where(size(col("ms")) > 1)
      .select(explode(flatten(transform(col("ms"), x =>
        transform(
          filter(col("ms"), y => y.getField("vec_id") =!= x.getField("vec_id")),
          y => struct(
            x.getField("vec_id").as("vec_id"),
            y.getField("vec_id").as("neighbor"),
            round(pairCosine(x.getField("ed"), y.getField("ed"),
              x.getField("norm"), y.getField("norm")), 6).as("cos")))))).as("p"))
      .select(col("p.vec_id"), col("p.neighbor"), col("p.cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** kNN label-consistency audit: every vector is "classified" by the
    * majority label of its k bucket-local nearest neighbors and scored
    * against its own label — the standard embedding-quality eval (a
    * space where neighbors don't share labels won't retrieve or
    * cluster well either). Majority ties break on the lexicographically
    * smallest label, so the vote is deterministic in both engines.
    * Returns per-label: vectors, majority-correct count, accuracy
    * (int/int, one divide — exact parity).
    *
    * Scale shape: rides the bucketed kNN join (never all-pairs); the
    * vote is one (vec, label) count aggregate over ≤ k rows per vector
    * plus a WindowGroupLimit-style rank pick; the label attach is an
    * equi-join against the (vec_id, label) projection, which Catalyst
    * sizes — at audit scales the neighbor table is sample- or
    * corpus-linear, never quadratic. */
  /** Corpus-sized twin of `knnLabelAudit` — same width rule as
    * `bucketKnnJoinAuto`, same SQL mirror. */
  def knnLabelAuditAuto(embeddings: DataFrame, k: Int,
                        targetPerBucket: Long = 125L): DataFrame =
    knnLabelAudit(embeddings, k,
      oracleSizedNBits(math.max(embeddings.count(), 1L), targetPerBucket))

  def knnLabelAudit(embeddings: DataFrame, k: Int, nBits: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val labels = embeddings.select(col("vec_id"), col("label"))
    val knn = bucketKnnJoinUnsorted(embeddings, k, nBits)
      .join(labels.select(col("vec_id").as("neighbor"),
        col("label").as("n_label")), "neighbor")
    val votes = knn.groupBy(col("vec_id"), col("n_label"))
      .agg(count(lit(1)).as("v"))
    val top = votes
      .withColumn("rn", row_number().over(
        W.partitionBy(col("vec_id")).orderBy(col("v").desc, col("n_label"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("n_label").as("predicted"))
    top.join(labels, "vec_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("predicted") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n"), 6).as("accuracy"))
      .orderBy("label")
  }

  /** IVF ANN: a k-means-learned coarse quantizer (the classic inverted-
    * file index) as the data-adapted alternative to the deterministic
    * sign-bucket tier. The seeded model assigns every vector to its
    * nearest centroid cell; a query probes only the `nProbe` cells
    * whose centroids are most cosine-similar to it, with exact cosine
    * re-ranking inside. Probing ALL cells is exactly brute force
    * (pinned in PipelineSpec), so nProbe is a pure recall/cost dial.
    *
    * At 100 TB: train on a sample, persist the assigned table
    * `partitionBy(cell)`, and a probe prunes to nProbe partitions —
    * the same IVF-as-partition-pruning story as the sign-bucket tier
    * with cells shaped by the data. The query vector is a single-row
    * point lookup and the centroid ranking is over nClusters rows —
    * both driver-side by design. Not SQL-expressible (k-means), so the
    * gate records a rows-only check. */
  /** The trained IVF index — k-means model — memoized once per
    * (corpus, nClusters, seed) per session, the same
    * build-the-index-once pattern as Dedup.verifiedPairIndex: every
    * probe configuration (any nProbe, any query) shares one training
    * run, exactly as a production IVF index is trained once and probed
    * many times. Session-scoped (SessionCache — a model trained under a
    * stopped session must not leak into a new one), keyed on the corpus
    * frame's semantic plan hash + a (path, size, mtime) lineage
    * fingerprint so an in-place rewrite retrains instead of serving the
    * old cells. At 100 TB: train on a sample and persist the model +
    * `partitionBy(cell)` assignments; this cache is the in-session
    * stand-in for that persisted artifact. */

  /** Featurized frame + the session-cached k-means quantizer — the ONE
    * training site both the in-memory tier (ivfTopK) and the persisted
    * store (buildIvfStore) share, so the cache key and training params
    * can never de-sync between them. Bounded Lloyd iterations: cell
    * quality converges fast and only affects recall-per-probe, never
    * correctness (all-probes == exact regardless of the cells);
    * deterministic for a fixed seed. Random init (not k-means||): the
    * parallel-init's extra full passes buy marginally better cells, but
    * cells only shape recall-per-probe — Lloyd from a seeded random
    * start is the right training cost. Features are cached across the
    * Lloyd passes and released right after: fit() is the only
    * multi-pass consumer. */
  private def ivfModel(embeddings: DataFrame, nClusters: Int, seed: Long)
      : (DataFrame, org.apache.spark.ml.clustering.KMeansModel) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings.withColumn("features",
      array_to_vector(transform(col("embedding"), x => x.cast("double"))))
    val model = graft.SessionCache.getOrBuild(embeddings.sparkSession,
      ("Similarity.ivfIndex", embeddings.semanticHash(),
        graft.SessionCache.lineageFingerprint(embeddings), nClusters, seed)) {
      feat.cache()
      try new KMeans().setK(nClusters).setSeed(seed).setMaxIter(10)
        .setInitMode("random")
        .setFeaturesCol("features").setPredictionCol("cell")
        .fit(feat)
      finally feat.unpersist(false)
    }
    (feat, model)
  }

  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
              nClusters: Int, nProbe: Int, seed: Long = 42L): DataFrame = {
    val (feat, model) = ivfModel(embeddings, nClusters, seed)
    val assigned = model.transform(feat).drop("features")

    val v = withVectorCols(assigned, 0)
    // missing queryId → empty result, same contract as the other tiers
    val qRow = embeddings.where(col("vec_id") === queryId)
      .select(col("embedding")).take(1).headOption
    if (qRow.isEmpty)
      return v.where(lit(false))
        .select(col("vec_id"), col("label"), lit(0.0).as("cos"))
    val qv = qRow.get.getSeq[Float](0).map(_.toDouble).toArray
    val qNormSq = qv.map(x => x * x).sum // loop-invariant query norm
    def cosToQuery(c: Array[Double]): Double = {
      var d = 0.0; var nc = 0.0; var i = 0
      while (i < qv.length) { d += qv(i) * c(i); nc += c(i) * c(i); i += 1 }
      // a zero query or centroid norm ranks last, deterministically
      if (nc == 0.0 || qNormSq == 0.0) -1.0 else d / math.sqrt(qNormSq * nc)
    }
    val probes = model.clusterCenters.map(_.toArray).zipWithIndex
      .sortBy { case (c, i) => (-cosToQuery(c), i) }
      .take(nProbe).map(_._2)

    val q = v.where(col("vec_id") === queryId)
      .select(col("ed").as("q_ed"), col("norm").as("q_norm"))
    v.where(col("cell").isin(probes.toIndexedSeq: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(pairCosine(col("ed"), col("q_ed"), col("norm"), col("q_norm")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold, bucketed
    * by the sign quantizer so candidate generation is never all-pairs.
    *
    * Bucket-collect, not a self-join: the earlier formulation joined the
    * vector table to itself on bucket, carrying the 64-double `ed`
    * array + norm through BOTH shuffle sides (the anti-pattern
    * SCALE.md documents as measured-bad). Here each vector is shuffled
    * exactly once into its bucket and all (i<j) pairs are emitted
    * bucket-locally — half the shuffled bytes, one exchange, and the
    * no-wide-self-join property is pinned in PlanShapeSpec. Buckets
    * over `maxBucket` degrade to representative star pairs
    * (TextFunctions.boundedPairs). */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         nBits: Int, maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    // sorted on the public/gate surface only — see lshNearDupPairs
    cosineNearDupPairsUnsorted(embeddings, threshold, nBits, maxBucket)
      .orderBy("vec_a", "vec_b")

  /** Corpus-sized pair tier: bucket width from `oracleSizedNBits` over
    * the actual vector count, so expected population tracks
    * `targetPerBucket` at any scale and (with the observed ~1.1×
    * sign-bucket skew and an 8× margin: target 125 vs cap 1000) the
    * star-fallback never fires — the q29/q58 production spelling the
    * sf1 oracle pass forced. The count is one cheap scan; the pair
    * index it keys is session-cached anyway. */
  def cosineNearDupPairsAuto(embeddings: DataFrame, threshold: Double,
                             targetPerBucket: Long = 125L): DataFrame =
    cosineNearDupPairs(embeddings, threshold,
      oracleSizedNBits(math.max(embeddings.count(), 1L), targetPerBucket))

  private def cosineNearDupPairsUnsorted(
      embeddings: DataFrame, threshold: Double,
      nBits: Int, maxBucket: Int): DataFrame =
    // Session-scoped pair index, the embedding-space twin of
    // Dedup.verifiedPairIndex: the pair tier (q29) and the cluster-dedup
    // tier (q58) consume the SAME verified pair set, and bucket-collect
    // + pair cosine is the dominant cost of both — materialize once per
    // (corpus, threshold, nBits) per session. Same keying discipline:
    // semantic plan hash + (path, size, mtime) lineage fingerprint.
    graft.SessionCache.getOrBuild(embeddings.sparkSession,
      ("Similarity.cosinePairIndex", embeddings.semanticHash(),
        graft.SessionCache.lineageFingerprint(embeddings),
        threshold, nBits, maxBucket)) {
      val v = withVectorCols(embeddings, nBits)
        .select(col("vec_id"), col("ed"), col("norm"), col("bucket"))
      v.groupBy(col("bucket"))
        .agg(array_sort(collect_list(struct(col("vec_id"), col("ed"), col("norm")))).as("ms"))
        .where(size(col("ms")) > 1)
        .select(explode(boundedPairs(col("ms"), maxBucket,
          (a, b) => struct(
            a.getField("vec_id").as("vec_a"),
            b.getField("vec_id").as("vec_b"),
            round(pairCosine(a.getField("ed"), b.getField("ed"),
              a.getField("norm"), b.getField("norm")), 6).as("cos")))).as("p"))
        .select(col("p.vec_a"), col("p.vec_b"), col("p.cos"))
        .where(col("cos") >= threshold)
        .localCheckpoint(true)
    }

  /** Embedding-level cluster dedup: connected components over the
    * verified cosine near-dup pairs, keep one representative (smallest
    * vec_id) per cluster, report per-class-label survivor counts — the
    * embedding-space twin of Dedup.dedupByClusters, sharing the SAME
    * min-label component loop (Dedup.minLabelComponents), so the two
    * tiers cannot drift apart semantically. Candidate generation is the
    * sign-bucketed pair tier (never all-pairs); the removed set is
    * O(true near-dups) and Catalyst sizes the anti-join from it. */
  /** Corpus-sized twin of `dedupEmbeddingsByClusters` — same adaptive
    * width rule as `cosineNearDupPairsAuto`, and the SAME width, so the
    * two tiers keep consuming one session-cached pair index. */
  def dedupEmbeddingsByClustersAuto(embeddings: DataFrame,
                                    threshold: Double,
                                    targetPerBucket: Long = 125L): DataFrame =
    dedupEmbeddingsByClusters(embeddings, threshold,
      oracleSizedNBits(math.max(embeddings.count(), 1L), targetPerBucket))

  def dedupEmbeddingsByClusters(embeddings: DataFrame, threshold: Double,
                                nBits: Int): DataFrame = {
    val pairs = cosineNearDupPairsUnsorted(embeddings, threshold, nBits,
      maxBucket = Dedup.DefaultMaxBucket)
    val removed = Dedup.minLabelComponents(pairs, "vec_a", "vec_b")
      .where(col("node") =!= col("label"))
      .select(col("node"))
    embeddings.join(removed, embeddings("vec_id") === removed("node"),
        "left_anti")
      .groupBy(col("label")).agg(count(lit(1)).as("n_kept"))
      .orderBy("label")
  }

  // ----- semantic decontamination (q192/q193/q194) -----

  /** Gate-standard semantic-decon parameters: the q29 pair-tier
    * threshold (so the tiers share ONE session-cached pair index) and
    * a hash64 eval split at mod 4 (hash, not raw modulo — vec_id
    * ranges correlate with label, the q134 reasoning). */
  val SemDeconThreshold: Double = 0.4
  val SemDeconEvalMod: Long = 4L

  /** The ONE spelling of the '#sev' eval split — shared by the batch
    * tier and the streaming admission so the convention cannot drift. */
  private[graft] def semEvalFlag(v: Column,
                                 evalMod: Long = SemDeconEvalMod): Column =
    hash64(v.cast("string"), "sev") % evalMod === 0

  /** SEMANTIC decontamination — the embedding-space member of the
    * decontamination tier (q134/q141 catch verbatim 13-gram overlap,
    * q145/q149 sub-document copies; this catches PARAPHRASE-level
    * contamination that shares no n-gram: a train vector too close to
    * an eval vector in cosine). Eval stand-in = vectors with
    * hash64(vec_id, "sev") % evalMod == 0; a TRAIN vector is
    * contaminated when some eval vector sits at cos ≥ threshold.
    *
    * Candidate generation is the SAME session-cached sign-bucket pair
    * index as q29/q58 (same threshold, same adaptive width ⇒ the index
    * builds once and all three tiers read it); contamination = pairs
    * with exactly one eval side. Output per class label: n_train,
    * n_contaminated, n_kept, and the '#sd' kept-id hash sum certifying
    * the admitted train set (the q141 convention on vec_ids).
    *
    * Scale shape: inherited from the pair tier — sign-bucket blocking
    * with the adaptive width rule keeps expected bucket size at
    * targetPerBucket at ANY corpus size, pair work is
    * O(buckets · bucket²) never all-pairs, and the eval classification
    * is a scan-local hash. The rollup joins the O(true-pairs)
    * contaminated set back to the train spine per label. */
  def semanticDecontamination(embeddings: DataFrame,
                              threshold: Double = SemDeconThreshold,
                              evalMod: Long = SemDeconEvalMod,
                              targetPerBucket: Long = 125L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0 && evalMod >= 2L)
    val nBits = oracleSizedNBits(
      math.max(embeddings.count(), 1L), targetPerBucket)
    val pairs = cosineNearDupPairsUnsorted(embeddings, threshold, nBits,
      maxBucket = Dedup.DefaultMaxBucket)
    val evalOf = (c: Column) => semEvalFlag(c, evalMod)
    val contaminated = pairs
      .where(evalOf(col("vec_b")) && !evalOf(col("vec_a")))
      .select(col("vec_a").as("vec_id"))
      .union(pairs
        .where(evalOf(col("vec_a")) && !evalOf(col("vec_b")))
        .select(col("vec_b").as("vec_id")))
      .distinct()
    val train = embeddings.where(!evalOf(col("vec_id")))
      .select(col("vec_id"), col("label"),
        (hash64(col("vec_id").cast("string"), "sd") % 1000000000L).as("vh"))
    val hit = train.join(contaminated, Seq("vec_id"), "left_semi")
      .groupBy(col("label")).agg(count(lit(1)).as("n_contaminated"))
    val kept = train.join(contaminated, Seq("vec_id"), "left_anti")
      .groupBy(col("label")).agg(count(lit(1)).as("n_kept"),
        sum(col("vh")).as("kept_hash_sum"))
    train.groupBy(col("label")).agg(count(lit(1)).as("n_train"))
      .join(hit, Seq("label"), "left")
      .join(kept, Seq("label"), "left")
      .na.fill(0L, Seq("n_contaminated", "n_kept", "kept_hash_sum"))
      .select(col("label"), col("n_train"), col("n_contaminated"),
        col("n_kept"), col("kept_hash_sum"))
      .orderBy("label")
  }

  /** Persist the IVF index: train (or reuse the session-cached) k-means
    * quantizer, assign every vector to its cell, and write the assigned
    * table cell-partitioned (sources/PartitionedStore). This is the
    * index-BUILD job of a production deployment: run once (or per
    * compaction), then every probe is a partition-pruned read — no
    * Spark-side recomputation, no model in the serving path beyond the
    * centroid list, which is nClusters rows and lives wherever the
    * query router runs. Returns the centroids (cell → vector) the
    * prober needs for cell ranking. */
  def buildIvfStore(embeddings: DataFrame, dir: String,
                    nClusters: Int, seed: Long = 42L): Array[(Int, Array[Double])] = {
    val (feat, model) = ivfModel(embeddings, nClusters, seed)
    graft.sources.PartitionedStore.writeByCell(
      model.transform(feat).drop("features"), dir, "cell")
    model.clusterCenters.map(_.toArray).zipWithIndex.map(_.swap)
  }

  /** Probe a persisted IVF store: rank the (driver-side, config-sized)
    * centroid list against the query, read ONLY the nProbe best cells
    * (partition pruning — no other file is opened), exact-cosine
    * re-rank inside. Identical semantics to the in-memory ivfTopK for
    * the same corpus/model (pinned in PartitionedStoreSpec); the store
    * version is what actually serves queries at 100 TB. */
  def probeIvfStore(spark: org.apache.spark.sql.SparkSession, dir: String,
                    centroids: Array[(Int, Array[Double])],
                    queryVec: Array[Float], queryId: Long,
                    k: Int, nProbe: Int): DataFrame = {
    val qv = queryVec.map(_.toDouble)
    val qNormSq = qv.map(x => x * x).sum
    def cosToQuery(c: Array[Double]): Double = {
      var d = 0.0; var nc = 0.0; var i = 0
      while (i < qv.length) { d += qv(i) * c(i); nc += c(i) * c(i); i += 1 }
      if (nc == 0.0 || qNormSq == 0.0) -1.0 else d / math.sqrt(qNormSq * nc)
    }
    val probes = centroids
      .sortBy { case (i, c) => (-cosToQuery(c), i) }
      .take(nProbe).map(_._1.toString).toSeq
    val cells = graft.sources.PartitionedStore
      .probeCells(spark, dir, "cell", probes)
    val v = withVectorCols(cells, 0)
    val qn = math.sqrt(qNormSq)
    val qLit = array(qv.toIndexedSeq.map(lit): _*)
    v.where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        round(graft.functions.ArrayDot.column(col("ed"), qLit) /
          (col("norm") * lit(qn)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Gate composition (q78): the persisted-store serving path under
    * the all-probes hard gate. Builds the cell-partitioned store once
    * per (corpus, dir, nClusters, seed) per session — the index-build
    * job, sharing the session-cached k-means model with the in-memory
    * tier — then probes THROUGH the written store with nProbe ==
    * nClusters. All-probes is exactly brute force regardless of what
    * k-means learned, so the result must hash-match the q22 exact
    * oracle while exercising the real partition-pruned read path a
    * production deployment serves from (q38b proved the in-memory
    * tier; this proves the store). */
  def ivfStoreExactTopK(embeddings: DataFrame, dir: String, queryId: Long,
                        k: Int, nClusters: Int, seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = graft.SessionCache.getOrBuild(spark,
      ("Similarity.ivfStore", dir, embeddings.semanticHash(),
        graft.SessionCache.lineageFingerprint(embeddings), nClusters, seed)) {
      buildIvfStore(embeddings, dir, nClusters, seed)
    }
    embeddings.where(col("vec_id") === queryId)
      .select(col("embedding")).take(1).headOption match {
      case None => // missing queryId → empty result, same as the other tiers
        embeddings.where(lit(false))
          .select(col("vec_id"), col("label"), lit(0.0).as("cos"))
      case Some(r) =>
        probeIvfStore(spark, dir, centroids, r.getSeq[Float](0).toArray,
          queryId, k, nProbe = nClusters)
    }
  }

  /** Driver-side mirror of TextFunctions.signBucket (the column
    * expression): the bit string of the first nBits dimension signs.
    * Bit parity with the column spelling is pinned in PipelineSpec —
    * the router computing probe lists MUST agree with the writer that
    * partitioned the store. */
  def signBucketOf(vec: Array[Float], nBits: Int): String =
    (0 until nBits).map(i => if (vec(i) >= 0) '1' else '0').mkString

  /** All bucket bitstrings within hamming distance `radius` of
    * `bucket` — the multi-probe set: Σ_{i≤r} C(nBits, i) strings,
    * enumerated driver-side (config-sized: 4 bits/r=1 → 5, 7 bits/
    * r=2 → 29). Multi-probe is how finer bucketing (pairSizedNBits —
    * linear pair work) buys its recall back: a near neighbor that
    * fell one sign-flip across the boundary is in the radius-1 ball. */
  def hammingBall(bucket: String, radius: Int): Seq[String] = {
    val n = bucket.length
    def flips(start: Int, left: Int, cur: String): Seq[String] =
      if (left == 0) Seq(cur)
      else (start to n - left).flatMap { i =>
        flips(i + 1, left - 1,
          cur.updated(i, if (cur(i) == '1') '0' else '1'))
      }
    (0 to math.min(radius, n)).flatMap(r => flips(0, r, bucket))
  }

  /** Persist the sign-bucket index: bucket every vector and write the
    * table bucket-partitioned. The sign-bucket analogue of
    * buildIvfStore — no training step, so the index-build job is a
    * single scan + partitioned write; raw embeddings are stored (the
    * probe recomputes ed/norm over the few cells it reads) to keep
    * the store at input size. */
  def buildSignBucketStore(embeddings: DataFrame, dir: String,
                           nBits: Int): Unit =
    graft.sources.PartitionedStore.writeByCell(
      graft.sources.Corpus.fanOutSmallScan(embeddings)
        .withColumn("bucket",
          TextFunctions.signBucket(col("embedding"), nBits)),
      dir, "bucket")

  /** Probe a persisted sign-bucket store with MULTI-PROBE: enumerate
    * the hamming ball of the query's bucket driver-side, read ONLY
    * those cells (partition pruning — the bitstring cell column reads
    * back as the raw directory token, leading zeros intact), exact
    * cosine re-rank inside. radius is the recall dial: radius = nBits
    * probes every bucket and IS brute force (the q94 hard gate);
    * radius 1–2 at production bucket counts reads a vanishing
    * fraction of the corpus. */
  def multiProbeStoreTopK(spark: org.apache.spark.sql.SparkSession,
                          dir: String, queryVec: Array[Float], queryId: Long,
                          k: Int, nBits: Int, radius: Int): DataFrame = {
    val probes = hammingBall(signBucketOf(queryVec, nBits), radius)
    val cells = graft.sources.PartitionedStore
      .probeCells(spark, dir, "bucket", probes)
    val v = withVectorCols(cells, 0)
    val qv = queryVec.map(_.toDouble)
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val qLit = array(qv.toIndexedSeq.map(lit): _*)
    v.where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        round(graft.functions.ArrayDot.column(col("ed"), qLit) /
          (col("norm") * lit(qn)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Gate composition (q94): the multi-probe serving path under the
    * full-ball hard gate — build (once per session per corpus/dir/
    * nBits) the bucket-partitioned store, then probe THROUGH it with
    * radius = nBits. The full hamming ball is every bucket, so the
    * result must hash-match the q22 exact oracle regardless of how
    * vectors bucketed — while exercising the real router → ball
    * enumeration → pruned read → re-rank path (q78 proved this for
    * IVF; this proves the sign-bucket/multi-probe tier). */
  def multiProbeStoreExactTopK(embeddings: DataFrame, dir: String,
                               queryId: Long, k: Int, nBits: Int): DataFrame = {
    val spark = embeddings.sparkSession
    graft.SessionCache.getOrBuild(spark,
      ("Similarity.signBucketStore", dir, embeddings.semanticHash(),
        graft.SessionCache.lineageFingerprint(embeddings), nBits)) {
      buildSignBucketStore(embeddings, dir, nBits)
      java.lang.Boolean.TRUE
    }
    embeddings.where(col("vec_id") === queryId)
      .select(col("embedding")).take(1).headOption match {
      case None =>
        embeddings.where(lit(false))
          .select(col("vec_id"), col("label"), lit(0.0).as("cos"))
      case Some(r) =>
        multiProbeStoreTopK(spark, dir, r.getSeq[Float](0).toArray,
          queryId, k, nBits, radius = nBits)
    }
  }

  /** Recall@k audit of the sign-bucket ANN tier: for a SAMPLED query
    * set (vec_id % queryMod == 0), how many of the true (brute-force)
    * top-k cosine neighbors the bucket-local search returns. This is
    * the measurement that turns nBits from a guess into a dial — and
    * the production recipe verbatim: ground truth is exact by
    * construction ON THE SAMPLE, so the audit's all-pairs stage is
    * O(|sample| · corpus), not corpus², and the sample rides a
    * broadcast. ONE scored pass feeds both rankings (the bucketed
    * ranking filters it; Catalyst reuses the exchange), ranking is on
    * the ROUNDED cosine with vec_id tie-break so both engines rank
    * identically. recall = hits/k is exact (int/int, one divide).
    * Completes the audit-the-approximation family: LSH→q67, HLL→q39b,
    * IVF→q38b, sign-bucket→this. */
  def bucketRecallAudit(embeddings: DataFrame, k: Int, nBits: Int,
                        queryMod: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val v = withVectorCols(embeddings, nBits)
      .select(col("vec_id"), col("ed"), col("norm"), col("bucket"))
    val q = v.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("ed").as("q_ed"),
        col("norm").as("q_norm"), col("bucket").as("q_bucket"))
    val scored = v.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("bucket"), col("q_bucket"),
        round(pairCosine(col("ed"), col("q_ed"), col("norm"), col("q_norm")), 6)
          .as("cos"))
    val w = W.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact = scored
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
    val bucketed = scored.where(col("bucket") === col("q_bucket"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("qid").as("bqid"), col("vec_id").as("bvec"))
    // both sides are ≤ k·|sample| rows; the hit-check join broadcasts
    // the bucketed side by construction (never corpus-sized)
    exact
      .join(broadcast(bucketed),
        col("qid") === col("bqid") && col("vec_id") === col("bvec"),
        "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k_eff"),
        sum(when(col("bvec").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("qid"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k_eff"), 6).as("recall"))
      .orderBy("qid")
  }

  /** Recall@k audit of the IVF tier across a LADDER of nProbe values
    * (q128) — q70's treatment for the data-adapted quantizer, closing
    * the one ungraded knob: q38's nProbe dial had only the all-probes
    * endpoint (q38b) pinned, with no recall measurement in between.
    * For a sampled query set (vec_id % queryMod == 0), the audit
    * scores every (query, vector) cosine ONCE, ranks cells per query
    * by centroid cosine (the exact probe order ivfTopK uses), and
    * derives the approx top-k for EVERY rung of the ladder from one
    * shared window pass: a row is in approx(p)'s top-k iff its cell's
    * probe rank ≤ p and fewer than k better-ranked rows also probe
    * within p — four conditional running counts over one window sort,
    * not four re-scored passes.
    *
    * The k-means-shaped recall VALUES cannot cross engines, so the
    * gate follows the q85 pattern — exact columns + TRUE-expected
    * invariants: per-query hits must be MONOTONE up the ladder
    * (candidate sets nest, and a true top-k hit can only be displaced
    * by a better candidate that is itself a hit — provable, so a
    * violation is an implementation bug, never data), and the full
    * ladder rung (nProbe = nClusters) must recover the exact top-k
    * (the q38b endpoint through the probe-rank plumbing). The recall
    * CURVE itself is asserted and printed in PipelineSpec.
    *
    * Scale shape: ground truth is exact on the sample only (the q70
    * discipline — O(|sample|·corpus) with the sample on a broadcast,
    * never corpus²); the centroid ranking is nClusters rows per
    * query; ONE window shuffle on qid. Prefer [[ivfRecallAuditSized]]
    * for corpus-facing callers — a caller-pinned queryMod makes the
    * broadcast sample grow linearly with the corpus. */
  def ivfRecallAudit(embeddings: DataFrame, k: Int, nClusters: Int,
                     queryMod: Long, probes: Seq[Int],
                     seed: Long = 42L): DataFrame = {
    val base = ivfRecallPerQuery(embeddings, k, nClusters, queryMod,
      probes, seed)
    val monoViol = probes.indices.init.map(i =>
      col(s"hit_$i") > col(s"hit_${i + 1}")).reduce(_ || _)
    val summary = base.agg(count(lit(1)).as("n_queries"),
      sum(when(monoViol, 1L).otherwise(0L)).as("mono_viol"),
      sum(when(col(s"hit_${probes.size - 1}") =!= col("k_eff"), 1L)
        .otherwise(0L)).as("full_viol"))
    summary.select(
        explode(array(probes.map(lit): _*)).as("nprobe"),
        col("n_queries"),
        (col("mono_viol") === 0L).as("monotone_ok"),
        (col("full_viol") === 0L).as("exact_at_full_probe"))
      .orderBy("nprobe")
  }

  /** Audit-sample sizing: the smallest queryMod that keeps the
    * sampled query set (vec_id % mod == 0 over dense 0..n-1 ids) at
    * or under `targetQueries` — ceil(n / target), integer-exact so a
    * DuckDB oracle recomputes the identical mod from count(*) (the
    * oracleSizedNBits discipline applied to the audit's broadcast:
    * sample ≤ target by construction at ANY corpus size, where a
    * caller-pinned mod grows the broadcast linearly; r13 VERDICT
    * task 5). Bound proof: mod·target ≥ n ⇒ ceil(n/mod) ≤ target. */
  def sizedQueryMod(corpusVectors: Long, targetQueries: Long = 512L): Long = {
    require(corpusVectors > 0 && targetQueries > 0)
    math.max(1L, (corpusVectors + targetQueries - 1) / targetQueries)
  }

  /** [[ivfRecallAudit]] with the queryMod DERIVED from the corpus via
    * [[sizedQueryMod]] — one partial+final count (a driver scalar by
    * design, the corpus-sized-width discipline), so the query-sample
    * broadcast is bounded by construction at every scale. */
  def ivfRecallAuditSized(embeddings: DataFrame, k: Int, nClusters: Int,
                          probes: Seq[Int], targetQueries: Long = 512L,
                          seed: Long = 42L): DataFrame = {
    val n = embeddings.select(count(lit(1))).head().getLong(0)
    ivfRecallAudit(embeddings, k, nClusters,
      sizedQueryMod(n, targetQueries), probes, seed)
  }

  /** Per-query (k_eff, hit_i per ladder rung) frame shared by the
    * gate aggregate and the spec's recall curve. */
  private def ivfRecallPerQuery(embeddings: DataFrame, k: Int,
      nClusters: Int, queryMod: Long, probes: Seq[Int],
      seed: Long): DataFrame = {
    require(probes.nonEmpty && probes == probes.sorted &&
      probes.last == nClusters,
      "probe ladder must be ascending and end at nClusters (the exact endpoint)")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val (feat, model) = ivfModel(embeddings, nClusters, seed)
    val v = withVectorCols(model.transform(feat).drop("features"), 0)
      .select(col("vec_id"), col("ed"), col("norm"), col("cell"))
    val q = v.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("ed").as("q_ed"),
        col("norm").as("q_norm"))
    // per-query probe order of every cell — the same (-cos, index)
    // ranking ivfTopK applies, over the model's nClusters centroids
    val centDf = model.clusterCenters.toSeq.map(_.toArray).zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "c_ed")
      .withColumn("c_norm",
        sqrt(graft.functions.ArrayDot.column(col("c_ed"), col("c_ed"))))
    val probeRank = q.crossJoin(broadcast(centDf))
      .select(col("qid"), col("cell"),
        when(col("c_norm") === 0.0 || col("q_norm") === 0.0, lit(-1.0))
          .otherwise(graft.functions.ArrayDot
            .column(col("q_ed"), col("c_ed")) /
            (col("q_norm") * col("c_norm"))).as("ccos"))
      .withColumn("probe_rank", row_number().over(
        W.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cell"))))
      .select(col("qid"), col("cell"), col("probe_rank"))
    val scored = v.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        round(pairCosine(col("ed"), col("q_ed"), col("norm"),
          col("q_norm")), 6).as("cos"))
      .join(broadcast(probeRank), Seq("qid", "cell"))
    // ONE window sort serves the exact rank and every ladder rung
    val w = W.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wr = W.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    // The aggregate below reads `hits` only at rows of the TRUE top-k
    // (rn ≤ k) — a PREFIX of the (cos desc, vec_id) ordering — and a
    // running count at prefix row j depends only on rows ranked ≤ j,
    // so filtering the prefix BEFORE the running-count window is
    // hash-identical. Spelled that way, the rank filter compiles to
    // partial+final WindowGroupLimit (pinned in PlanShapeSpec): each
    // map task ships at most k rows per query into the qid shuffle
    // instead of its whole corpus slice, and the second window's sort
    // is elided (the filter preserves the first window's ordering).
    val ranked = scored
      .withColumn("rn", row_number().over(wr))
      .where(col("rn") <= k)
      .withColumn("hits", array(probes.map(p =>
        (col("probe_rank") <= p &&
          sum(when(col("probe_rank") <= p, 1L).otherwise(0L)).over(w) <= k)
          .cast("long")): _*))
    val perQid = ranked.groupBy(col("qid"))
      .agg(count(lit(1)).as("k_eff"),
        probes.indices.map(i =>
          sum(element_at(col("hits"), i + 1)).as(s"hit_$i")): _*)
    // every sampled query must appear even with zero candidates
    q.select(col("qid"))
      .join(perQid, Seq("qid"), "left")
      .na.fill(0L)
  }

  /** Per-probe recall curve for the spec's eyes (not gated — the
    * values are k-means-shaped): average hits/k_eff per ladder rung. */
  private[graft] def ivfRecallCurve(embeddings: DataFrame, k: Int,
      nClusters: Int, queryMod: Long, probes: Seq[Int],
      seed: Long = 42L): Seq[(Int, Double)] = {
    val perQ = ivfRecallPerQuery(embeddings, k, nClusters, queryMod,
      probes, seed)
    // ONE action for every rung — per-rung .head() calls would re-run
    // the whole scored cross-join + window pass once per probe value
    val aggs = probes.indices.map(i =>
      avg(when(col("k_eff") > 0,
        col(s"hit_$i").cast("double") / col("k_eff"))).as(s"r_$i"))
    val row = perQ.agg(aggs.head, aggs.tail: _*).head()
    probes.indices.map(i =>
      (probes(i), if (row.isNullAt(i)) 1.0 else row.getDouble(i)))
  }

  /** Int8 scalar-quantization error profile per label — the compression
    * audit run before shipping vectors to an ANN index (4× smaller than
    * float32; is the recall cost acceptable?). Each vector is quantized
    * with its own scale s = 127 / max|v| (symmetric per-vector scalar
    * quantization, the faiss SQ8-style baseline), reconstructed, and
    * scored by RELATIVE L2 error ‖v − q/s‖ / ‖v‖. Per-label stats are
    * order-independent (min/max/sort-median), and both error norms fold
    * sequentially (same trick as normProfile), so the gate hash is
    * exact. Scan-local until the final per-label reduce — no shuffle
    * carries an array. round() at the quantization point is half-away-
    * from-zero in both engines; a zero vector quantizes to itself
    * (error 0) by the maxAbs guard. */
  def quantizationErrorProfile(embeddings: DataFrame): DataFrame = {
    val ed = transform(col("embedding"), x => x.cast("double"))
    val maxAbs = array_max(transform(ed, x => abs(x)))
    val s = lit(127.0) / maxAbs
    // Σ(v − round(v·s)/s)² in array order — matches the oracle's
    // sequential list_reduce fold bit-for-bit. Squaring is spelled d·d,
    // not pow(d, 2): Math.pow's y=2 path is not contractually x·x
    val err2 = aggregate(ed, lit(0.0), (acc, v) => {
      val d = v - round(v * s, 0) / s
      acc + d * d
    })
    val norm = sqrt(graft.functions.ArrayDot.column(ed, ed))
    val relErr = when(maxAbs === 0.0 || norm === 0.0, lit(0.0))
      .otherwise(sqrt(err2) / norm)
    graft.sources.Corpus.fanOutSmallScan(embeddings)
      .select(col("label"), relErr.as("qerr"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(min(col("qerr")), 6).as("min_qerr"),
        round(max(col("qerr")), 6).as("max_qerr"),
        round(percentile(col("qerr"), lit(0.5)), 6).as("p50_qerr"))
      .orderBy("label")
  }

  /** Recall@k audit of int8 scalar-quantized SEARCH — the memory lever
    * of the ANN tier (4× smaller vectors = 4× more corpus per executor
    * before the scan spills), measured the q70 way: for a sampled
    * query set, the exact float top-k is ground truth and the top-k
    * ranked by the QUANTIZED score is the candidate. Scoring is
    * asymmetric (the SQ8/ADC convention): stored vectors are quantized
    * per-vector to the int8 lattice (q63's round(v·127/maxAbs) rule)
    * and reconstructed, queries stay float — so this audit reports the
    * no-rescore floor; a production tier rescores its top-R exactly
    * and recall can only improve from here.
    *
    * Exactness across engines: the quantization round is half-away-
    * from-zero in both (the q63 identity), reconstruction and both
    * dot folds are sequential-order double arithmetic (ArrayDot ==
    * list_reduce), and both rankings order by (rounded score desc,
    * vec_id) — so recall VALUES hash-match, not just invariants.
    *
    * Scale shape: the q70 discipline — ground truth exact on the
    * sample only, sample rides a broadcast sized by [[sizedQueryMod]]
    * (never caller-pinned); both top-k sides are ≤ k·|sample| rows so
    * the hit-check join broadcasts by construction. The scored
    * cross-join — the audit's dominant cost (O(corpus·|sample|)
    * reconstruction + two dim-length dot folds per pair) — computes
    * ONCE: it persists memory-with-spill for the two ranking passes
    * instead of re-executing per branch (r14 VERDICT task 3). The
    * cached entry is narrow — (qid, vec_id, two rounded doubles),
    * ~32 B/row over corpus × ≤256 rows — and CacheManager de-dupes
    * identical plans, so a session holds one entry per corpus shape;
    * each ranking's rank filter still compiles to partial+final
    * WindowGroupLimit above the cache read (pinned in
    * PlanShapeSpec), so no branch ever sorts corpus-sized groups.
    *
    * The cache is RELEASED before returning (r15 VERDICT task 3 /
    * ADVICE): the audit result is per-query-sized (≤ |sample| rows),
    * so the public entry materializes it eagerly, unpersists the
    * scored table in a finally, and hands back a local frame —
    * callers can no longer accumulate a session-lifetime cache entry
    * per corpus shape. The lazy two-frame form stays reachable
    * (package-private) for the plan-shape pin. */
  def int8RecallAudit(embeddings: DataFrame, k: Int,
                      queryMod: Long): DataFrame = {
    val (res, scored) = int8RecallAuditFrames(embeddings, k, queryMod)
    try {
      val rows = res.collect()
      res.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), res.schema)
    } finally scored.unpersist(false)
  }

  /** The lazy (result, scored-cache-handle) pair behind
    * [[int8RecallAudit]] — exposed so PlanShapeSpec can pin the
    * one-cached-pass / WindowGroupLimit shape on the REAL plan and
    * release the handle itself. */
  private[graft] def int8RecallAuditFrames(embeddings: DataFrame, k: Int,
                                           queryMod: Long): (DataFrame, DataFrame) = {
    val W = org.apache.spark.sql.expressions.Window
    val maxAbs = array_max(transform(col("ed"), x => abs(x)))
    val s = lit(127.0) / maxAbs
    // zero vector: quantizes to itself (the q63 guard) — scale would
    // be infinite and round(0·inf) NaN-poisons the fold otherwise
    val rec = when(maxAbs === 0.0, col("ed"))
      .otherwise(transform(col("ed"), x => round(x * s, 0) / s))
    val v = withVectorCols(embeddings, 0)
      .select(col("vec_id"), col("ed"), col("norm"), rec.as("rec"))
      .withColumn("rec_norm",
        sqrt(graft.functions.ArrayDot.column(col("rec"), col("rec"))))
    val q = v.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("ed").as("q_ed"),
        col("norm").as("q_norm"))
    val scored = v.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(pairCosine(col("ed"), col("q_ed"), col("norm"),
          col("q_norm")), 6).as("cos"),
        round(pairCosine(col("rec"), col("q_ed"), col("rec_norm"),
          col("q_norm")), 6).as("qcos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wx = W.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val wq = W.partitionBy(col("qid")).orderBy(col("qcos").desc, col("vec_id"))
    val exact = scored
      .withColumn("rn", row_number().over(wx)).where(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
    val quant = scored
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= k)
      .select(col("qid").as("bqid"), col("vec_id").as("bvec"))
    val res = exact
      .join(broadcast(quant),
        col("qid") === col("bqid") && col("vec_id") === col("bvec"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k_eff"),
        sum(when(col("bvec").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("qid"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k_eff"), 6).as("recall"))
      .orderBy("qid")
    (res, scored)
  }

  /** [[int8RecallAudit]] with the queryMod derived from the corpus —
    * the [[ivfRecallAuditSized]] discipline. */
  def int8RecallAuditSized(embeddings: DataFrame, k: Int,
                           targetQueries: Long = 256L): DataFrame = {
    val n = embeddings.select(count(lit(1))).head().getLong(0)
    int8RecallAudit(embeddings, k, sizedQueryMod(n, targetQueries))
  }

  /** Embedding-norm profile per label: count, min/max and exact median
    * of the L2 norm — the sanity report run before any cosine tier
    * (un-normalized or zero vectors surface here first). Per-row norms
    * use the native sequential dot kernel (bit-equal to the oracle's
    * list_reduce fold); every aggregate is ORDER-INDEPENDENT (min, max,
    * sort-based percentile), so the gate hash is exact with no
    * cross-row float summation anywhere. Scan-local until the final
    * per-label reduce. */
  def normProfile(embeddings: DataFrame): DataFrame =
    withVectorCols(embeddings, 0)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(min(col("norm")), 6).as("min_norm"),
        round(max(col("norm")), 6).as("max_norm"),
        round(percentile(col("norm"), lit(0.5)), 6).as("p50_norm"))
      .orderBy("label")

  // ----- product quantization (PQ) — the codebook member of the
  // quantized-search family (q63/q136 are SCALAR int8; PQ compresses
  // with per-subspace VECTOR codebooks: M sub-codes per vector, here
  // M=8 × 16 codes = 8×4 bits, the faiss PQ8x4 "fast-scan" layout,
  // 4 B/vector vs 256 B float32) -----

  /** Subspaces and codebook size (dim 64 → 8-dim subvectors). */
  val PqM = 8
  val PqC = 16

  /** Shortlist size for the rescored recall column (the production
    * configuration: PQ ranks a candidate shortlist, exact distance
    * re-ranks it — recall@k after rescoring R is what a deployed tier
    * ships). */
  val PqRescoreR = 100

  /** Deterministic codebook: the C corpus vectors with the smallest
    * (hash64(vec_id,'#pq'), vec_id) — sampling-as-codebook, the same
    * construction k-means++ seeds from, made CLOSED-FORM so the
    * codebook (and therefore every code, reconstruction, and recall
    * value) is bit-identical across engines — the property that lets
    * this tier gate on VALUES where the k-means IVF ladder (q128) can
    * only gate on invariants. Collect is config-sized (C rows) via
    * TakeOrdered — the ivfTopK query-row discipline, not a data-path
    * collect. */
  private[graft] def pqCodebook(embeddings: DataFrame, c: Int): Seq[Seq[Double]] = {
    val rows = graft.sources.Corpus.fanOutSmallScan(embeddings)
      .select(col("embedding"),
        TextFunctions.hash64(col("vec_id").cast("string"), "pq").as("h"),
        col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(c)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    require(rows.size == c,
      s"PQ codebook needs $c vectors, corpus has ${rows.size}")
    rows
  }

  /** Codebook reshaped [m][c][j] (subspace-major) as a nested literal. */
  private def pqCbLit(cb: Seq[Seq[Double]], m: Int): Column = {
    val dim = cb.head.size
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val sub = dim / m
    typedlit((0 until m).map(mi =>
      cb.map(v => v.slice(mi * sub, (mi + 1) * sub))))
  }

  /** Sequential-order squared-L2 fold between two double arrays —
    * pure IEEE arithmetic (no libm), so bit-identical to the oracle's
    * list_reduce spelling at any dimension. */
  private def d2Fold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** PQ codes for the `ed` column: per subspace, the index of the
    * nearest centroid (ties to the smallest index —
    * array_position(min) is first-match, the oracle's ORDER BY d2, c
    * twin). Scan-local: M·C subDim-length folds per row. */
  private def pqCodes(cbLit: Column, m: Int, sub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), mi => {
      val cbm = element_at(cbLit, mi + 1)
      val dists = transform(cbm, cv =>
        d2Fold(slice(col("ed"), mi * sub + 1, lit(sub)), cv))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })

  /** PQ reconstruction error per label — the q63 audit for the
    * codebook quantizer: each vector is encoded (M nearest-centroid
    * codes) and scored by relative L2 error ‖v − v̂‖ / ‖v‖ where v̂
    * concatenates the assigned centroids. err² folds per subspace
    * then across subspaces in m-order — the oracle mirrors both fold
    * levels, so the hash is exact. Scan-local until the per-label
    * reduce; the codebook rides the closure as a literal. */
  def pqErrorProfile(embeddings: DataFrame, m: Int = PqM,
                     c: Int = PqC): DataFrame = {
    val cb = pqCodebook(embeddings, c)
    val sub = cb.head.size / m
    val cbLit = pqCbLit(cb, m)
    val v = withVectorCols(embeddings, 0)
      .withColumn("codes", pqCodes(cbLit, m, sub))
    val err2 = aggregate(
      transform(sequence(lit(0), lit(m - 1)), mi =>
        d2Fold(slice(col("ed"), mi * sub + 1, lit(sub)),
          element_at(element_at(cbLit, mi + 1),
            element_at(col("codes"), mi + 1) + 1))),
      lit(0.0), (acc, x) => acc + x)
    val relErr = when(col("norm") === 0.0, lit(0.0))
      .otherwise(sqrt(err2) / col("norm"))
    v.select(col("label"), relErr.as("pqerr"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(min(col("pqerr")), 6).as("min_pqerr"),
        round(max(col("pqerr")), 6).as("max_pqerr"),
        round(percentile(col("pqerr"), lit(0.5)), 6).as("p50_pqerr"))
      .orderBy("label")
  }

  /** Recall@k of PQ-ADC search vs exact L2 — the q136 audit for the
    * codebook quantizer. Ground truth: exact squared-L2 top-k
    * (‖v‖² + ‖q‖² − 2⟨v,q⟩, native dot kernels). Candidate: top-k by
    * the ADC score Σ_m lut[m][code_m], where each query precomputes
    * its M×C lookup table scan-local — the faiss ADC convention — so
    * the pair stage does M array lookups per pair, never a
    * per-pair fold against the codebook. Everything is pure IEEE
    * arithmetic (no libm anywhere), all rankings break ties on
    * vec_id: recall VALUES hash-match across engines exactly.
    *
    * Two recall columns: `recall` is the raw ADC floor, `recall_r`
    * re-ranks the PQ top-[[PqRescoreR]] shortlist by exact distance —
    * the deployed shortlist-rescore configuration. On clusterable
    * corpora both approach 1; on near-random vectors (this corpus)
    * the audit HONESTLY reports the codebook as too coarse — which is
    * the audit's job (the q63 error profile shows the same story).
    *
    * Scale shape == q136: sample rides a sizedQueryMod broadcast, the
    * scored table computes ONCE (persist + release in the public
    * entry), both rank filters compile to partial+final
    * WindowGroupLimit. */
  def pqRecallAudit(embeddings: DataFrame, k: Int,
                    queryMod: Long, m: Int = PqM, c: Int = PqC): DataFrame = {
    val (res, scored) = pqRecallAuditFrames(embeddings, k, queryMod, m, c)
    try {
      val rows = res.collect()
      res.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), res.schema)
    } finally scored.unpersist(false)
  }

  private[graft] def pqRecallAuditFrames(
      embeddings: DataFrame, k: Int, queryMod: Long,
      m: Int = PqM, c: Int = PqC): (DataFrame, DataFrame) = {
    val W = org.apache.spark.sql.expressions.Window
    val cb = pqCodebook(embeddings, c)
    val sub = cb.head.size / m
    val cbLit = pqCbLit(cb, m)
    val v = withVectorCols(embeddings, 0)
      .withColumn("codes", pqCodes(cbLit, m, sub))
      .withColumn("nv", graft.functions.ArrayDot.column(col("ed"), col("ed")))
      .select(col("vec_id"), col("ed"), col("codes"), col("nv"))
    // per-query ADC lookup table [m][c], computed scan-local on the
    // C-sized sample side
    val lut = transform(sequence(lit(0), lit(m - 1)), mi =>
      transform(element_at(cbLit, mi + 1), cv =>
        d2Fold(slice(col("ed"), mi * sub + 1, lit(sub)), cv)))
    val q = withVectorCols(embeddings, 0)
      .where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("ed").as("q_ed"),
        graft.functions.ArrayDot.column(col("ed"), col("ed")).as("nq"),
        lut.as("lut"))
    val adist = aggregate(
      transform(sequence(lit(0), lit(m - 1)), mi =>
        element_at(element_at(col("lut"), mi + 1),
          element_at(col("codes"), mi + 1) + 1)),
      lit(0.0), (acc, x) => acc + x)
    val scored = v.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        ((col("nv") + col("nq")) -
          (lit(2.0) * graft.functions.ArrayDot.column(col("ed"), col("q_ed"))))
          .as("l2"),
        adist.as("adist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wx = W.partitionBy(col("qid")).orderBy(col("l2"), col("vec_id"))
    val wp = W.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    val exact = scored
      .withColumn("rn", row_number().over(wx)).where(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
    val short = scored
      .withColumn("rn", row_number().over(wp))
      .where(col("rn") <= PqRescoreR)
    val pq = short.where(col("rn") <= k)
      .select(col("qid").as("bqid"), col("vec_id").as("bvec"))
    // exact re-rank of the PQ shortlist — the deployed configuration
    val resc = short
      .withColumn("rr", row_number().over(
        W.partitionBy(col("qid")).orderBy(col("l2"), col("vec_id"))))
      .where(col("rr") <= k)
      .select(col("qid").as("rqid"), col("vec_id").as("rvec"))
    val res = exact
      .join(broadcast(pq),
        col("qid") === col("bqid") && col("vec_id") === col("bvec"), "left")
      .join(broadcast(resc),
        col("qid") === col("rqid") && col("vec_id") === col("rvec"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k_eff"),
        sum(when(col("bvec").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        sum(when(col("rvec").isNotNull, 1L).otherwise(0L)).as("n_hit_r"))
      .select(col("qid"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k_eff"), 6).as("recall"),
        col("n_hit_r"),
        round(col("n_hit_r").cast("double") / col("k_eff"), 6)
          .as("recall_r"))
      .orderBy("qid")
    (res, scored)
  }

  /** [[pqRecallAudit]] with the queryMod derived from the corpus —
    * the sizedQueryMod discipline. */
  def pqRecallAuditSized(embeddings: DataFrame, k: Int,
                         targetQueries: Long = 256L): DataFrame = {
    val n = embeddings.select(count(lit(1))).head().getLong(0)
    pqRecallAudit(embeddings, k, sizedQueryMod(n, targetQueries))
  }

  /** Gate-standard multi-probe radius for the composite serving query. */
  val PqProbeRadius = 1

  /** The COMPOSITE ANN serving query (q195) — the faiss IVF-PQ
    * deployment shape assembled from the two audited tiers: a coarse
    * quantizer prunes the candidate read (here the sign-bucket family
    * with a hamming-ball multi-probe — the closed-form coarse
    * quantizer, so unlike the k-means IVF cells the whole pipeline is
    * bit-reproducible cross-engine and the gate hashes VALUES, not
    * invariants), PQ-ADC scores the survivors with a per-query M×C
    * lookup table (M array lookups per candidate, never a fold
    * against the codebook), and the top-[[PqRescoreR]] shortlist is
    * re-ranked by exact cosine — the deployed shortlist-rescore
    * configuration q171 audits.
    *
    * Scale shape: the bucket IN-list prunes the scan to the
    * hamming-ball's buckets (with a bucketed/partitioned store this
    * is partition pruning — the q94 path); ADC is scan-local (codes +
    * the broadcast-literal LUT); the shortlist is a
    * TakeOrderedAndProject (per-partition heaps, rescoreR rows
    * total); re-rank touches rescoreR vectors. Query cost is
    * O(ball-bucket candidates), independent of corpus size at fixed
    * bucket population — the adaptive width rule keeps that fixed. */
  def pqProbeTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10,
                  radius: Int = PqProbeRadius,
                  targetPerBucket: Long = 125L, m: Int = PqM,
                  c: Int = PqC, rescoreR: Int = PqRescoreR): DataFrame = {
    require(k >= 1 && radius >= 0 && rescoreR >= k)
    val nBits = oracleSizedNBits(
      math.max(embeddings.count(), 1L), targetPerBucket)
    val qRow = embeddings.where(col("vec_id") === queryId)
      .select(col("embedding")).take(1)
    if (qRow.isEmpty)
      return embeddings.where(lit(false))
        .select(lit(0L).as("rank"), col("vec_id"), col("label"),
          lit(0.0).as("cos"))
    val qf = qRow.head.getSeq[Float](0).toArray
    val qv = qf.map(_.toDouble)
    val cb = pqCodebook(embeddings, c)
    val sub = cb.head.size / m
    // driver-side ADC lookup table [m][c] — the same ascending-j
    // left fold as d2Fold / the oracle's list_reduce, so the doubles
    // are bit-identical on every engine
    val lut: Seq[Seq[Double]] = (0 until m).map { mi =>
      cb.map { cv =>
        var acc = 0.0
        var j = 0
        while (j < sub) {
          val d = qv(mi * sub + j) - cv(mi * sub + j)
          acc += d * d
          j += 1
        }
        acc
      }
    }
    val probes = hammingBall(signBucketOf(qf, nBits), radius)
    val cbLit = pqCbLit(cb, m)
    val cand = withVectorCols(embeddings, nBits)
      .where(col("bucket").isin(probes: _*) && col("vec_id") =!= queryId)
      .withColumn("codes", pqCodes(cbLit, m, sub))
    val lutLit = typedlit(lut)
    val adist = (0 until m).map { mi =>
      element_at(element_at(lutLit, mi + 1),
        element_at(col("codes"), mi + 1) + 1)
    }.reduce(_ + _) // explicit m-ascending adds — the oracle's spelling
    val qn = {
      var acc = 0.0; var i = 0
      while (i < qv.length) { acc += qv(i) * qv(i); i += 1 }
      math.sqrt(acc)
    }
    val qLit = array(qv.toIndexedSeq.map(lit): _*)
    val short = cand
      .select(col("vec_id"), col("label"), col("ed"), col("norm"),
        adist.as("adist"))
      .orderBy(col("adist"), col("vec_id")).limit(rescoreR)
    val top = short
      .select(col("vec_id"), col("label"),
        round(graft.functions.ArrayDot.column(col("ed"), qLit) /
          (col("norm") * lit(qn)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
    top.select(
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id"))).cast("long").as("rank"),
      col("vec_id"), col("label"), col("cos"))
      .orderBy("rank")
  }
}
