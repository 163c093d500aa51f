package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Unit suite for the LLM-pipeline operators (the cross-engine value
  * parity is covered by the q16–q28 oracle gate; these tests pin the
  * operator-level semantics and edge cases). */
class PipelineSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark
  private def docs = sources.Corpus.table(spark, "/root/testdata/sf0.001", "documents")
  private def embs = sources.Corpus.table(spark, "/root/testdata/sf0.001", "embeddings")

  test("native Sha256Prefix60 is bit-equal to the portable SQL construction") {
    val mismatches = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .select(TextFunctions.hash64(col("t"), "mh").as("native"),
        TextFunctions.hash64Sql(col("t"), "mh").as("sql"))
      .where(col("native") =!= col("sql"))
      .count()
    assert(mismatches == 0L)
  }

  test("shingles guard: short docs yield empty sets, not backward sequences") {
    val s = spark
    import s.implicits._
    val df = Seq("a b", "a b c", "a b c d").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
    val sizes = df.collect().map(_.getSeq[String](0).size).toSeq
    assert(sizes == Seq(0, 1, 2))
  }

  test("LSH finds the 28 planted near-dup pairs with zero band misses") {
    // ground truth at sf0.001: 28 pairs with jaccard >= 0.8 (computed by
    // brute-force all-pairs in DuckDB over the frozen corpus)
    val pairs = Dedup.lshNearDupPairs(docs, 0.8).collect()
    assert(pairs.length == 28)
    assert(pairs.forall(_.getDouble(2) >= 0.8))
  }

  test("near-dup clusters: representative is the component min and a member") {
    val pairs = Dedup.lshNearDupPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.nearDupClusters(docs, 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every paired doc is labeled; both ends of a pair share a label
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b))
    }
    // the label is the smallest member of its component, and labels itself
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
      assert(clusters(label) == label)
    }
    // end-to-end dedup removes exactly the non-representatives
    val kept = Dedup.dedupByClusters(docs, 0.8)
      .agg(sum(col("n_kept"))).head.getLong(0)
    val removed = clusters.count { case (doc, label) => doc != label }
    assert(kept == docs.count() - removed)
  }

  test("approx dedup summary tracks exact distinct counts within HLL rsd") {
    val exact = Dedup.exactDedupSummary(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = Dedup.dedupSummaryApprox(docs, 0.05).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, n) =>
      assert(math.abs(approx(src) - n) <= math.max(2L, (n * 0.15).toLong),
        s"$src: approx ${approx(src)} vs exact $n")
    }
  }

  test("degenerate inputs: empty pair graph and missing query id return empty, not crash") {
    // threshold above 1.0 → no verified pairs → empty cluster table
    val clusters = Dedup.nearDupClusters(docs, 1.01).collect()
    assert(clusters.isEmpty)
    val kept = Dedup.dedupByClusters(docs, 1.01)
      .agg(sum(col("n_kept"))).head.getLong(0)
    assert(kept == docs.count()) // nothing removed on a clean corpus
    // missing query id → empty top-k, same contract as the other tiers
    assert(Similarity.ivfTopK(embs, 999999L, 5, 4, 2).collect().isEmpty)
  }

  test("exact dedup: keep-first count equals distinct text count") {
    val kept = Dedup.dedupKeepFirst(docs).head.getLong(0)
    val distinct = docs.select(countDistinct(col("text"))).head.getLong(0)
    assert(kept == distinct)
  }

  test("simhash of near-dup docs differ in few bits; distinct docs in many") {
    val sim = Dedup.simhashAll(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    // (474, 498) is a planted near-dup pair at sf0.001
    assert(hamming(sim(474L), sim(498L)) <= 8)
    assert(hamming(sim(0L), sim(1L)) > 12)
  }

  test("native token/shingle/minhash kernels are bit-equal to the HOF spellings") {
    val t = col("text")
    val mismatches = docs.select(
        TextFunctions.tokenHashes(t, "sim").as("n_th"),
        TextFunctions.baseHashes(TextFunctions.tokens(t), "sim").as("h_th"),
        TextFunctions.shinglesOf(t, 3).as("n_sh"),
        TextFunctions.shingles(TextFunctions.tokens(t), 3).as("h_sh"),
        TextFunctions.shingleHashes(t, 3, "mh").as("n_hs"),
        TextFunctions.baseHashes(
          TextFunctions.shingles(TextFunctions.tokens(t), 3), "mh").as("h_hs"))
      .withColumn("n_mh", TextFunctions.minhashesAll(col("n_hs"), 8))
      .withColumn("h_mh", array((0 until 8).map(i =>
        TextFunctions.minhash(col("h_hs"), i)): _*))
      .where(col("n_th") =!= col("h_th") || col("n_sh") =!= col("h_sh") ||
        col("n_hs") =!= col("h_hs") || col("n_mh") =!= col("h_mh"))
      .count()
    assert(mismatches == 0L)
  }

  test("native kernel edge cases: empty text, short docs, repeated tokens") {
    val s = spark
    import s.implicits._
    val edge = Seq("", "a", "a b", "a b c", "a a a a", "x  y").toDF("text")
    val rows = edge.select(
        TextFunctions.shinglesOf(col("text"), 3).as("n"),
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("h"),
        TextFunctions.tokenHashes(col("text"), "sim").as("nt"),
        TextFunctions.baseHashes(TextFunctions.tokens(col("text")), "sim").as("ht"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("fanOutSmallScan spreads an under-split scan to default parallelism") {
    val fanned = sources.Corpus.fanOutSmallScan(docs)
    assert(fanned.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(fanned.count() == docs.count())
  }

  test("native SimHash64 is bit-equal to the portable HOF spelling") {
    val th = TextFunctions.baseHashes(TextFunctions.tokens(col("text")), "sim")
    val mismatches = docs
      .select(TextFunctions.simhashFromHashes(th).as("native"),
        TextFunctions.simhashFromHashesSql(th).as("hof"))
      .where(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0L)
  }

  test("native ArrayDot is bit-equal to the zip_with+aggregate fold") {
    val ed = transform(col("embedding"), x => x.cast("double"))
    val mismatches = embs.select(ed.as("a")).crossJoin(
        embs.limit(20).select(ed.as("b")))
      .where(graft.functions.ArrayDot.column(col("a"), col("b")) =!=
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (s, v) => s + v))
      .count()
    assert(mismatches == 0L)
    // the portable HOF cosine (the DuckDB oracle's spelling) equals the
    // native dot/norm composition on raw float vectors
    val na = sqrt(graft.functions.ArrayDot.column(col("a"), col("a")))
    val nb = sqrt(graft.functions.ArrayDot.column(col("b"), col("b")))
    val cosMismatch = embs.select(col("embedding").as("ra"), ed.as("a"))
      .crossJoin(embs.limit(20).select(col("embedding").as("rb"), ed.as("b")))
      .where(TextFunctions.cosine(col("ra"), col("rb")) =!=
        graft.functions.ArrayDot.column(col("a"), col("b")) / (na * nb))
      .count()
    assert(cosMismatch == 0L)
    // null parity: a null element (and a length mismatch) poisons both
    // spellings to NULL
    val s = spark
    import s.implicits._
    val withNull = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0))
    ).toDF("a", "b")
    val nulls = withNull.select(
        graft.functions.ArrayDot.column(col("a"), col("b")).as("n"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (sm, v) => sm + v).as("h"))
      .collect()
    nulls.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("native hamming64 matches the zip_with spelling on all simhash pairs") {
    val sims = Dedup.simhashAll(docs).limit(40)
    val a = sims.toDF("ida", "sa"); val b = sims.toDF("idb", "sb")
    val mismatches = a.crossJoin(b)
      .where(TextFunctions.hamming64(col("sa"), col("sb")) =!=
        TextFunctions.hammingSql(col("sa"), col("sb")))
      .count()
    assert(mismatches == 0L)
  }

  test("boundedPairs skew guard: an over-cap bucket emits k-1 star pairs, not k(k-1)/2") {
    val s = spark
    import s.implicits._
    // 12 identical docs — every LSH band bucket holds all 12 ids
    val dup = (0L until 12L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val capped = Dedup.lshNearDupPairs(dup, 0.5, maxBucket = 5).collect()
    assert(capped.length == 11) // star: representative (id 0) × others
    assert(capped.forall(r => r.getLong(0) == 0L && r.getDouble(2) == 1.0))
    val uncapped = Dedup.lshNearDupPairs(dup, 0.5).collect()
    assert(uncapped.length == 66) // below the default cap: all pairs
  }

  test("sizedNBits targets ≤ targetPerBucket expected vectors per bucket") {
    assert(Similarity.sizedNBits(5000L) == 1) // tiny corpus still buckets
    assert(Similarity.sizedNBits(10000000L) == 10) // 1e7/1e4 → 2^10 buckets
    assert(Similarity.sizedNBits(1600000000L, 100000L) == 14)
    // monotone: more vectors never means fewer buckets
    val bits = Seq(1e4, 1e5, 1e6, 1e7, 1e8, 1e9).map(n => Similarity.sizedNBits(n.toLong))
    assert(bits == bits.sorted)
  }

  test("PROPERTY: oracleSizedNBits == sizedNBits for every (n, target) — the integer spelling is exact") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // the q29/q58 gates derive bucket width through the INTEGER-exact
    // spelling (mirrorable in DuckDB with shifts); it must agree with
    // the float ceil-log2 definition at every magnitude, including the
    // exact-power-of-two corpus sizes where a libm round could slip
    val gen = for {
      e <- Gen.choose(0.0, 12.0)
      n <- Gen.choose(1L, 9L).map(m => math.max(1L, (m * math.pow(10, e)).toLong))
      t <- Gen.oneOf(1L, 100L, 500L, 1000L, 10000L)
    } yield (n, t)
    val prop = Prop.forAll(gen) { case (n, t) =>
      Similarity.oracleSizedNBits(n, t) == Similarity.sizedNBits(n, t)
    }
    val exact = (0 to 40).forall { b =>
      val n = 1L << b
      Similarity.oracleSizedNBits(n, 1L) == Similarity.sizedNBits(n, 1L)
    }
    assert(exact, "power-of-two corpus sizes must agree")
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(r.passed, r.status.toString)
  }

  test("sizedNBitsForDim: per-bucket collected-row bytes stay within budget") {
    val budget = 16L << 20
    for (dim <- Seq(8, 64, 384, 768, 1536, 4096); n <- Seq(1e5, 1e7, 1e9)) {
      val bits = Similarity.sizedNBitsForDim(n.toLong, dim, budget)
      val expectedPop = n / math.pow(2, bits)
      val rowBytes = expectedPop * dim * 8
      // the 256-vector floor deliberately trades buffer for recall on
      // pathological dims; above it the budget must hold
      val floorBytes = 256.0 * dim * 8
      assert(rowBytes <= math.max(budget.toDouble, floorBytes),
        s"dim=$dim n=$n bits=$bits rowBytes=$rowBytes")
    }
    // 64-dim keeps the classic 10⁴ target; 768-dim tightens to ~2.7k
    assert(Similarity.sizedNBitsForDim(10000000L, 64) ==
      Similarity.sizedNBits(10000000L))
    assert(Similarity.sizedNBitsForDim(10000000L, 768) ==
      Similarity.sizedNBits(10000000L, (16L << 20) / (768L * 8L)))
  }

  test("PROPERTY: sizedNBits bounds expected bucket population ≤ target from 10^3 to 10^12 vectors") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // the scale dial itself, not just its documentation: for ANY corpus
    // size (exponentially distributed so every magnitude is exercised)
    // and any sane per-bucket target, the expected population
    // n / 2^nBits never exceeds the target, and nBits stays a usable
    // sign-prefix width (≥1, ≤62)
    val magnitude = Gen.choose(3.0, 12.0).map(e => math.pow(10.0, e).toLong)
    val prop = Prop.forAll(magnitude,
      Gen.oneOf(100L, 1000L, 10000L, 100000L)) { (n, target) =>
      val bits = Similarity.sizedNBits(n, target)
      bits >= 1 && bits <= 62 &&
        n.toDouble / math.pow(2.0, bits) <= target.toDouble
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("cosine top-k: exact scan dominates bucket-restricted recall") {
    val exact = Similarity.cosineTopK(embs, 0L, 10).collect()
    assert(exact.length == 10)
    val cs = exact.map(_.getDouble(2)).toSeq
    assert(cs == cs.sorted.reverse) // descending
    val bucketed = Similarity.bucketTopK(embs, 0L, 10, 4).collect()
    // ANN results are a subset of the bucket, each no better than exact max
    assert(bucketed.forall(_.getDouble(2) <= cs.head))
  }

  test("bucketTopK runs on a FRESH session and matches the suite session (r19 q23 fix)") {
    // The pre-r19 broadcast-self-join spelling crashed any fresh
    // session at task time (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND via
    // InferFiltersFromConstraints over the pruned lambda attribute) —
    // its green q23 gate row was an artifact of suite execution order
    // (VERDICT r18). Pin: a session with NO prior embeddings queries
    // executes it and agrees with the warmed suite session.
    val fresh = spark.newSession()
    val freshRows = Similarity.bucketTopK(
      sources.Corpus.table(fresh, "/root/testdata/sf0.001", "embeddings"),
      0L, 10, 4).collect().map(r =>
        (r.getLong(0), String.valueOf(r.get(1)), r.getDouble(2))).toSeq
    val suiteRows = Similarity.bucketTopK(embs, 0L, 10, 4).collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)), r.getDouble(2))).toSeq
    assert(freshRows.nonEmpty && freshRows == suiteRows)
  }

  test("IVF: probing all cells equals brute force; fewer probes trade recall") {
    val exact = Similarity.cosineTopK(embs, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val allCells = Similarity.ivfTopK(embs, 0L, 10, 8, 8).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(allCells == exact) // nProbe = nClusters ⇒ exact search
    val probed = Similarity.ivfTopK(embs, 0L, 10, 8, 2).collect()
    assert(probed.nonEmpty && probed.length <= 10)
    assert(probed.forall(_.getDouble(2) <= exact.head._2))
  }

  test("multi-probe kernels: driver bucket == column bucket; hamming ball exact; pair sizing bounds") {
    // router/writer agreement: the driver-side bucket of every vector
    // equals the column expression that partitioned the store
    val rows = embs.select(col("vec_id"),
        TextFunctions.signBucket(col("embedding"), 5).as("b"),
        col("embedding"))
      .collect()
    rows.foreach { r =>
      assert(Similarity.signBucketOf(r.getSeq[Float](2).toArray, 5)
        == r.getString(1))
    }
    // ball sizes are the binomial sums; all members within radius
    def dist(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    val b0 = "0101"
    assert(Similarity.hammingBall(b0, 0) == Seq(b0))
    assert(Similarity.hammingBall(b0, 1).size == 5)  // 1 + C(4,1)
    assert(Similarity.hammingBall(b0, 2).size == 11) // + C(4,2)
    assert(Similarity.hammingBall(b0, 4).size == 16) // full space
    assert(Similarity.hammingBall(b0, 4).distinct.size == 16)
    Similarity.hammingBall(b0, 2).foreach(b => assert(dist(b0, b) <= 2))
    // pair sizing: expected per-bucket pair work stays ≤ target from
    // 10^3 to 10^12 vectors (the dial the sf1 checkpoint measured)
    for (exp <- 3 to 12; n = math.pow(10, exp).toLong) {
      val nBits = Similarity.pairSizedNBits(n)
      val pop = n.toDouble / (1L << nBits)
      assert(pop * pop / 2 <= (1L << 21).toDouble * 1.01,
        s"n=$n nBits=$nBits pop=$pop")
    }
  }

  test("bucketKnnJoin composes with corpus-sized nBits") {
    val bits = Similarity.sizedNBits(embs.count()) // 500 vecs → 1 bit
    val res = Similarity.bucketKnnJoin(embs, 3, bits)
      .groupBy("vec_id").count().collect()
    assert(res.forall(_.getLong(1) <= 3)) // at most k neighbors each
    assert(res.length == 500) // 2 buckets of 250 — everyone has mates
  }

  test("multimodal plumbing: schema, batch path, deterministic stub features") {
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "payload", "source"))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.feature.length == 8))
    // determinism: same payload bytes → same feature vector
    val f0 = feats.find(_.media_id == 0L).get
    val again = Multimodal.extractFeatures(media)
      .filter(col("media_id") === 0L).collect().head
    assert(f0.feature.toSeq == again.feature.toSeq)
    // n_bytes metadata matches actual payload length
    val doc0len = docs.where(col("doc_id") === 0)
      .select(length(encode(col("text"), "utf-8"))).head.getInt(0)
    assert(f0.n_bytes == doc0len.toLong)
  }

  test("TextScrub: PII presets find planted strings; scrub leaves zero residual matches") {
    val s = spark
    import s.implicits._
    val planted = Seq(
      (0L, "contact alice@example.com or bob.smith@corp.co.uk today", "s0"),
      (1L, "server at 10.0.42.7 answered, backup at 192.168.1.255", "s0"),
      (2L, "call +1 555 123 4567 or 020-7946-0958 now", "s1"),
      (3L, "perfectly clean text with no identifiers at all", "s1"))
      .toDF("doc_id", "text", "source")
    val audit = TextScrub.patternScanSummary(planted, TextScrub.PiiPresets)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(audit(("s0", "email")) == (1L, 2L))
    assert(audit(("s0", "ipv4")) == (1L, 2L))
    assert(audit(("s1", "phone")) == (1L, 2L))
    assert(audit(("s1", "email")) == (0L, 0L))
    // scrub removes every match the audit counted
    assert(TextScrub.residualMatches(planted, TextScrub.PiiPresets) == 0L)
    // untouched text survives scrubbing byte-identical
    val clean = TextScrub.scrub(planted, TextScrub.PiiPresets)
      .where(col("doc_id") === 3L).select("text").head().getString(0)
    assert(clean == "perfectly clean text with no identifiers at all")
  }

  test("keep-best cluster dedup keeps the longest member, same survivor count as keep-min") {
    // both policies drop (clusterSize - 1) docs per cluster, so the
    // per-source totals can differ but the corpus total cannot
    val keepMin = Dedup.dedupByClusters(docs, 0.8)
      .agg(sum(col("n_kept"))).head().getLong(0)
    val keepBest = Dedup.dedupByClustersKeepBest(docs, 0.8)
      .agg(sum(col("n_kept"))).head().getLong(0)
    assert(keepMin == keepBest)
    // the representative is the longest member of every cluster
    val clusters = Dedup.nearDupClusters(docs, 0.8)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val best = clusters.groupBy(_._2).map { case (_, ms) =>
      ms.minBy(m => (-m._3, m._1))._1
    }.toSet
    val removedIds = clusters.map(_._1).toSet -- best
    val kept = Dedup.dedupByClustersKeepBest(docs, 0.8)
    val keptTotal = docs.count() - removedIds.size
    assert(kept.agg(sum(col("n_kept"))).head().getLong(0) == keptTotal)
  }

  test("media feature top-k: features match closed form; self excluded; ranks deterministic") {
    // the q119 composition at unit scale: decoded features must equal
    // the closed-form [w, h, 3, m, m, m, m, 0] (m = pixel-sum / n,
    // float-exact — the cross-engine contract the oracle leans on)
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticPngs(docs, 10L)).collect()
      .map(f => f.media_id -> f.feature).toMap
    (0L until 10L).foreach { id =>
      val w = (id % 7 + 8).toInt; val h = (id % 5 + 4).toInt
      val s = (for (x <- 0 until w; y <- 0 until h)
        yield (x * 31 + y * 17 + id) % 256).sum
      val m = s.toFloat / (w * h)
      assert(feats(id).toSeq ==
        Seq(w.toFloat, h.toFloat, 3f, m, m, m, m, 0f), s"id $id")
    }
    val top = Multimodal.mediaFeatureTopK(docs, 10L, 0L, 5).collect()
    assert(top.length == 5)
    assert(!top.exists(_.getLong(0) == 0L)) // query excluded
    val cosines = top.map(_.getDouble(1))
    assert(cosines.sorted(Ordering[Double].reverse).toSeq == cosines.toSeq)
    assert(cosines.forall(c => c > 0.9 && c <= 1.0)) // near-collinear family
  }

  test("multimodal real codec: PNG round-trip decodes exact pixels, stub only for non-images") {
    // encode→decode must reproduce the closed-form pixel sums (PNG is
    // lossless) — the q76 gate contract, pinned here at unit scale
    val metas = Multimodal.decodeImageMeta(
      Multimodal.syntheticPngs(docs, 10L)).collect()
    assert(metas.length == 10)
    metas.foreach { m =>
      assert(m.width == m.media_id % 7 + 8)
      assert(m.height == m.media_id % 5 + 4)
      assert(m.n_channels == 3L)
      val expected = (for {
        x <- 0L until m.width; y <- 0L until m.height
      } yield (x * 31 + y * 17 + m.media_id) % 256).sum
      assert(m.red_sum == expected)
    }
    // dispatch: an image payload takes the real decode path (feature
    // leads with decoded dims), a text payload falls back to the stub
    val png = Multimodal.syntheticPngs(docs, 1L).collect().head.payload
    val imgFeat = Multimodal.imageOrStubDecoder(png)
    assert(imgFeat(0) == 8f && imgFeat(1) == 4f && imgFeat(2) == 3f)
    val textBytes = "not an image".getBytes("UTF-8")
    assert(Multimodal.imageOrStubDecoder(textBytes).toSeq ==
      Multimodal.stubDecoder(textBytes).toSeq)
    // undecodable payloads are quarantined (skipped), not failed —
    // including a TRUNCATED image (valid PNG magic, corrupt body),
    // which makes ImageIO readers throw rather than return null
    val s = spark
    import s.implicits._
    val junk = Seq(
      MediaRecord(99L, "application/octet-stream", textBytes, "junk"),
      MediaRecord(98L, "image/png", png.take(24), "junk")).toDS()
    assert(Multimodal.decodeImageMeta(junk).collect().isEmpty)
  }

  test("pixel resize: nearest-neighbor rule is exact both directions, stub only for non-images") {
    // decode → resample → re-encode → decode must land exactly on the
    // pinned integer sampling rule (the q91 gate contract): resized
    // pixel (x', y') = source pixel (x'·w / tw, y'·h / th)
    val (tw, th) = (9, 6) // up-samples w∈[8,14] rows, down-samples h∈[4,8]
    val metas = Multimodal.decodeImageMeta(
      Multimodal.resizeImages(Multimodal.syntheticPngs(docs, 10L), tw, th)
        .map(r => MediaRecord(r.media_id, r.media_type, r.payload, "t"))(
          org.apache.spark.sql.Encoders.product[MediaRecord])).collect()
    assert(metas.length == 10)
    metas.foreach { m =>
      assert(m.width == tw && m.height == th && m.n_channels == 3L)
      val (w, h) = (m.media_id % 7 + 8, m.media_id % 5 + 4)
      val expected = (for { x <- 0 until tw; y <- 0 until th } yield
        ((x * w / tw) * 31 + (y * h / th) * 17 + m.media_id) % 256).sum
      assert(m.red_sum == expected)
    }
    // non-image payloads fall through to the stride stub seam
    val textBytes = "definitely not a png".getBytes("UTF-8")
    assert(Multimodal.imageResizer(4, 4)(textBytes).toSeq ==
      Multimodal.stubResizer(16)(textBytes).toSeq)
  }

  test("multimodal resize and frame-sample: shapes, determinism, bounds") {
    val media = Multimodal.fromDocuments(docs.limit(50))
    val resized = Multimodal.resize(media, 64).collect()
    assert(resized.length == 50)
    resized.foreach { r =>
      assert(r.resized_bytes <= 64 && r.resized_bytes <= r.orig_bytes)
      assert(r.payload.length.toLong == r.resized_bytes)
    }
    // determinism: same payload → same resized bytes
    val again = Multimodal.resize(media, 64).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    resized.foreach(r => assert(again(r.media_id) == r.payload.toSeq))

    val frames = Multimodal.sampleFrames(media, maxFrames = 4, frameBytes = 100)
      .collect()
    val byDoc = frames.groupBy(_.media_id)
    assert(byDoc.keySet.size == 50)
    byDoc.values.foreach { fs =>
      val n = fs.head.n_frames
      assert(fs.length == n && n >= 1 && n <= 4)
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until n))
      fs.foreach(f => assert(f.frame.length <= 100))
    }
  }

  test("real frame sampling: animated-GIF round-trip decodes exact frames, quarantines junk") {
    // encode n frames → real reader counts them → sample ≤3 under the
    // pinned rule → decoded gray sums must equal the closed form (the
    // q95 gate contract at unit scale)
    val metas = Multimodal.sampleImageFrameMeta(
      Multimodal.syntheticAnimatedGifs(docs, 10L), 3).collect()
    val byDoc = metas.groupBy(_.media_id)
    assert(byDoc.keySet == (0L until 10L).toSet)
    byDoc.foreach { case (id, fs) =>
      val n = id % 4 + 2
      val kk = math.min(3L, n)
      assert(fs.head.n_frames == n && fs.length == kk)
      assert(fs.map(_.frame_idx).sorted.toSeq == (0L until kk))
      fs.foreach { m =>
        assert(m.src_frame == m.frame_idx * n / kk)
        assert(m.width == id % 5 + 6 && m.height == id % 3 + 4)
        val expected = (for {
          x <- 0L until m.width; y <- 0L until m.height
        } yield (x * 31 + y * 17 + m.src_frame * 29 + id) % 256).sum
        assert(m.gray_sum == expected)
      }
    }
    // quarantine: unrecognized and truncated payloads skip, not fail
    val s = spark
    import s.implicits._
    val gif = Multimodal.syntheticAnimatedGifs(docs, 1L).collect().head.payload
    val junk = Seq(
      MediaRecord(99L, "application/octet-stream",
        "not media".getBytes("UTF-8"), "junk"),
      MediaRecord(98L, "image/gif", gif.take(16), "junk")).toDS()
    assert(Multimodal.sampleImageFrameMeta(junk, 3).collect().isEmpty)
  }

  test("real frame sampling: multi-page TIFF round-trip decodes exact pages") {
    // the q108 gate contract at unit scale: same sampler, second real
    // container — page counts, floor-rule sampled indices, dims, and
    // gray sums must all equal the TIFF closed form
    val metas = Multimodal.sampleImageFrameMeta(
      Multimodal.syntheticMultiPageTiffs(docs, 10L), 3).collect()
    val byDoc = metas.groupBy(_.media_id)
    assert(byDoc.keySet == (0L until 10L).toSet)
    byDoc.foreach { case (id, fs) =>
      val n = id % 5 + 2
      val kk = math.min(3L, n)
      assert(fs.head.n_frames == n && fs.length == kk)
      assert(fs.map(_.frame_idx).sorted.toSeq == (0L until kk))
      fs.foreach { m =>
        assert(m.src_frame == m.frame_idx * n / kk)
        assert(m.width == id % 6 + 5 && m.height == id % 4 + 3)
        val expected = (for {
          x <- 0L until m.width; y <- 0L until m.height
        } yield (x * 19 + y * 23 + m.src_frame * 41 + id) % 256).sum
        assert(m.gray_sum == expected)
      }
    }
  }

  test("real audio decode: WAV round-trip reconstructs exact samples, quarantines junk") {
    // PCM data + real JDK container writer → real parser → sample sums
    // must equal the closed form (the q96 gate contract at unit scale)
    val metas = Multimodal.decodeAudioMeta(
      Multimodal.syntheticWavs(docs, 10L)).collect()
    assert(metas.length == 10)
    metas.foreach { m =>
      assert(m.sample_rate == 8000L && m.n_channels == 1L && m.bits == 16L)
      assert(m.n_samples == m.media_id % 50 + 100)
      val expected = (0L until m.n_samples)
        .map(i => (i * 37 + m.media_id * 11) % 2003 - 1001).sum
      assert(m.sample_sum == expected)
    }
    // quarantine: non-audio and truncated containers skip, not fail
    val s = spark
    import s.implicits._
    val wav = Multimodal.syntheticWavs(docs, 1L).collect().head.payload
    val junk = Seq(
      MediaRecord(99L, "text/plain", "not audio".getBytes("UTF-8"), "junk"),
      MediaRecord(98L, "audio/wav", wav.take(12), "junk")).toDS()
    assert(Multimodal.decodeAudioMeta(junk).collect().isEmpty)
  }

  test("real audio decode: AU round-trip through the shared decoder (the trio completer)") {
    val metas = Multimodal.decodeAudioMeta(
      Multimodal.syntheticAus(docs, 10L)).collect()
    assert(metas.length == 10)
    metas.foreach { m =>
      assert(m.sample_rate == 8000L && m.n_channels == 1L && m.bits == 16L)
      assert(m.n_samples == m.media_id % 30 + 60)
      val expected = (0L until m.n_samples)
        .map(i => (i * 71 + m.media_id * 43) % 1913 - 956).sum
      assert(m.sample_sum == expected)
    }
  }

  test("real audio decode: AIFF (big-endian) round-trip through the shared decoder") {
    // the q111 gate contract at unit scale: the SAME decodeAudioMeta
    // path must reconstruct big-endian AIFF PCM exactly — this is the
    // endianness branch a WAV-only gate never executes with a real
    // container
    val metas = Multimodal.decodeAudioMeta(
      Multimodal.syntheticAiffs(docs, 10L)).collect()
    assert(metas.length == 10)
    metas.foreach { m =>
      assert(m.sample_rate == 8000L && m.n_channels == 1L && m.bits == 16L)
      assert(m.n_samples == m.media_id % 40 + 80)
      val expected = (0L until m.n_samples)
        .map(i => (i * 53 + m.media_id * 29) % 1987 - 993).sum
      assert(m.sample_sum == expected)
    }
  }

  test("real compressed-audio decode: G.711 ulaw/alaw expand bit-exactly; oracle formula == JDK table") {
    // the oracle-side closed forms must equal the JDK's G.711
    // decompressor for EVERY code byte — pin the full 256-entry table
    // for both companding laws against the real converter
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    import AudioFormat.Encoding
    def jdkExpand(enc: AudioFormat.Encoding): Array[Int] = {
      val code = Array.tabulate[Byte](256)(_.toByte)
      val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dst = new AudioFormat(Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
      val pcm = AudioSystem.getAudioInputStream(dst,
        new AudioInputStream(new java.io.ByteArrayInputStream(code), src, 256))
      val out = pcm.readAllBytes()
      Array.tabulate(256)(b => (out(2 * b + 1).toInt << 8) | (out(2 * b) & 0xff))
    }
    def ulawForm(b: Int): Int = {
      val x = 255 - b
      (if (b < 128) -1 else 1) * (((((x & 15) * 2 + 33) << ((x >> 4) & 7)) - 33) * 4)
    }
    def alawForm(b: Int): Int = {
      val x = b ^ 0x55
      val (e, m) = ((x >> 4) & 7, x & 15)
      val mag = if (e == 0) 2 * m + 1 else (2 * m + 33) << (e - 1)
      (if (b >= 128) 1 else -1) * (mag * 8)
    }
    val (ju, ja) = (jdkExpand(Encoding.ULAW), jdkExpand(Encoding.ALAW))
    (0 until 256).foreach { b =>
      assert(ju(b) == ulawForm(b), s"ulaw code $b")
      assert(ja(b) == alawForm(b), s"alaw code $b")
    }
    // the q121/q122 gate contracts at unit scale: compressed WAV
    // containers through the SHARED decodeAudioMeta path — container
    // parsed (bits=8 proves the parse saw the companded format),
    // samples really decompressed (sums equal the expanded closed form)
    val um = Multimodal.decodeAudioMeta(
      Multimodal.syntheticUlawWavs(docs, 10L)).collect()
    assert(um.length == 10)
    um.foreach { m =>
      assert(m.sample_rate == 8000L && m.n_channels == 1L && m.bits == 8L)
      assert(m.n_samples == m.media_id % 45 + 90)
      val expected = (0L until m.n_samples)
        .map(i => ulawForm(((i * 13 + m.media_id * 7) % 256).toInt).toLong).sum
      assert(m.sample_sum == expected)
    }
    val am = Multimodal.decodeAudioMeta(
      Multimodal.syntheticAlawWavs(docs, 10L)).collect()
    assert(am.length == 10)
    am.foreach { m =>
      assert(m.bits == 8L && m.n_samples == m.media_id % 35 + 70)
      val expected = (0L until m.n_samples)
        .map(i => alawForm(((i * 17 + m.media_id * 23) % 256).toInt).toLong).sum
      assert(m.sample_sum == expected)
    }
  }

  test("real video demux: uncompressed-DIB AVI frames decode exactly; compressed/corrupt quarantine") {
    // the q120 gate contract at unit scale: the RIFF walker must
    // recover frame counts from chunk structure and rasters from
    // bottom-up B-G-R stride-padded rows — the closed form is on the
    // RED channel, so byte-order or row-order bugs cannot pass
    val metas = Multimodal.sampleAviFrameMeta(
      Multimodal.syntheticDibAvis(docs, 10L), 3).collect()
    val byId = metas.groupBy(_.media_id)
    assert(byId.keySet == (0L until 10L).toSet)
    byId.foreach { case (id, fs) =>
      val (w, h, n) = (id % 7 + 6, id % 3 + 3, id % 4 + 2)
      assert(fs.length == math.min(3L, n))
      fs.sortBy(_.frame_idx).zipWithIndex.foreach { case (m, j) =>
        assert(m.n_frames == n && m.width == w && m.height == h)
        assert(m.src_frame == j * n / math.min(3L, n))
        val expected = (for (x <- 0L until w; y <- 0L until h)
          yield (x * 29 + y * 13 + m.src_frame * 37 + id) % 256).sum
        assert(m.gray_sum == expected, s"avi $id frame $j")
      }
    }
    val s = spark
    import s.implicits._
    val valid = Multimodal.syntheticDibAvis(docs, 1L).collect().head.payload
    // a compressed-frame AVI ('00dc' chunks) needs a codec no bare JVM
    // has: flip the frame fourccs and the demux must quarantine
    val compressed = valid.clone()
    var i = 0
    while (i + 4 <= compressed.length) {
      if (compressed(i) == '0' && compressed(i + 1) == '0' &&
          compressed(i + 2) == 'd' && compressed(i + 3) == 'b')
        compressed(i + 3) = 'c'
      i += 1
    }
    val junk = Seq(
      MediaRecord(97L, "video/x-msvideo", compressed, "junk"),
      MediaRecord(98L, "video/x-msvideo", valid.take(40), "junk"),
      MediaRecord(99L, "video/x-msvideo", "RIFFjunk".getBytes("UTF-8"), "junk")).toDS()
    assert(Multimodal.sampleAviFrameMeta(junk, 3).collect().isEmpty)
    // the quarantine audit's video branch runs the SAME demux attempt:
    // a valid AVI lands DECODED with an all-frames red-sum checksum,
    // the hostile ones land quarantined
    val mixed = Seq(MediaRecord(0L, "video/x-msvideo", valid, "ok")).toDS()
      .union(junk)
    val audited = Multimodal.quarantineAudit(mixed).collect()
    assert(audited.length == 1)
    assert(audited.head.getLong(2) == 1L && audited.head.getLong(3) == 3L)
    val allFrames = (for (f <- 0L until 2L; x <- 0L until 6L; y <- 0L until 3L)
      yield (x * 29 + y * 13 + f * 37) % 256).sum // id=0: w=6,h=3,n=2
    assert(audited.head.getLong(5) == allFrames)
  }

  test("AVI demux is a real RIFF walker: JUNK chunks, idx1, and rec-grouped movi all demux identically") {
    // another writer's AVI differs structurally (padding JUNK chunks,
    // an idx1 index, frames wrapped in 'rec ' LISTs) — rebuild our
    // fixture into that layout and the walker must produce the SAME
    // frames; an offset-matcher tuned to our own writer would not
    val s = spark
    import s.implicits._
    val plain = Multimodal.syntheticDibAvis(docs, 3L).collect().sortBy(_.media_id)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def restructure(p: Array[Byte]): Array[Byte] = {
      // locate hdrl LIST and movi LIST in the original
      def u32(off: Int): Int =
        (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
          ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
      val hdrlSz = u32(16) // first LIST after RIFF header
      val hdrl = java.util.Arrays.copyOfRange(p, 12, 20 + hdrlSz)
      val moviOff = 20 + hdrlSz
      val moviSz = u32(moviOff + 4)
      // frame chunks of the original movi body (after its 'movi' tag)
      val frames = java.util.Arrays.copyOfRange(
        p, moviOff + 12, moviOff + 8 + moviSz)
      val junk = cc("JUNK") ++ le32(12) ++ Array.fill[Byte](12)(0x55)
      // wrap the frame run in a 'rec ' LIST inside movi
      val rec = cc("LIST") ++ le32(4 + frames.length) ++ cc("rec ") ++ frames
      val movi = cc("LIST") ++ le32(4 + rec.length) ++ cc("movi") ++ rec
      val idx1 = cc("idx1") ++ le32(16) ++ cc("00db") ++ le32(16) ++
        le32(4) ++ le32(0)
      val body = cc("AVI ") ++ junk ++ hdrl ++ movi ++ idx1
      cc("RIFF") ++ le32(body.length) ++ body
    }
    val restructured = plain
      .map(r => MediaRecord(r.media_id, r.media_type,
        restructure(r.payload), "foreign-writer"))
      .toSeq.toDS()
    val a = Multimodal.sampleAviFrameMeta(
      Multimodal.syntheticDibAvis(docs, 3L), 3).collect()
      .sortBy(m => (m.media_id, m.frame_idx))
    val b = Multimodal.sampleAviFrameMeta(restructured, 3).collect()
      .sortBy(m => (m.media_id, m.frame_idx))
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("codec quarantine contract: every row decoded or quarantined, never crashed, never passed") {
    // the q114 gate contract at unit scale: the audit must account for
    // EVERY planted row (n_decoded + n_quarantined == n_total per
    // type), quarantine exactly the undecodable classes with their
    // byte counts, and carry post-decode checksums for survivors
    val report = Multimodal.quarantineAuditReport(docs, 20L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(report.keySet == Set(
      "image/png", "audio/wav", "audio/mpeg", "video/mp4"))
    report.values.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"${r.getString(0)}: total != decoded + quarantined")
    }
    val ids = docs.where(col("doc_id") < 20).select("doc_id")
      .collect().map(_.getLong(0))
    def n(c: Int) = ids.count(_ % 5 == c).toLong
    val png = report("image/png")
    assert(png.getLong(2) == n(0) && png.getLong(3) == n(1))
    assert(png.getLong(4) == 16L * n(1)) // truncated PNGs: 16 bytes each
    assert(png.getLong(5) > 0L) // decode really happened (red sums)
    val wav = report("audio/wav")
    assert(wav.getLong(3) == 0L && wav.getLong(2) == n(2))
    val mp3 = report("audio/mpeg")
    assert(mp3.getLong(2) == 0L && mp3.getLong(3) == n(3))
    assert(mp3.getLong(4) == ids.filter(_ % 5 == 3).map(_ % 20 + 30).sum)
    val mp4 = report("video/mp4")
    assert(mp4.getLong(2) == 0L && mp4.getLong(3) == n(4) &&
      mp4.getLong(5) == 0L)
    // hostile payloads through the audit never crash the job: a
    // declared image that is pure garbage and a declared wav that is
    // a truncated real container both land in quarantine
    val s = spark
    import s.implicits._
    val realWav = Multimodal.syntheticWavs(docs, 1L).collect().head.payload
    val hostile = Seq(
      MediaRecord(1L, "image/png", Array[Byte](1, 2, 3), "junk"),
      MediaRecord(2L, "audio/wav", realWav.take(12), "junk"),
      MediaRecord(3L, "video/mp4", Array.empty[Byte], "junk")).toDS()
    val audited = Multimodal.quarantineAudit(hostile).collect()
    assert(audited.map(_.getLong(3)).sum == 3L) // all quarantined
    assert(audited.map(_.getLong(2)).sum == 0L)
  }

  test("bloom admission == plain anti-join at any fpp, and the fast path actually fires") {
    // the q97 contract: Bloom false positives are re-checked exactly,
    // so the admission result is fpp-independent — pin tight (0.001)
    // and pathological (0.5, most of the delta forced through the
    // exact join) against the plain set arithmetic
    import org.apache.spark.sql.functions.{col, sha2, sum => ssum}
    val baseH = docs.where(col("doc_id") % 10 === 0)
      .select(sha2(col("text"), 256).as("h")).distinct()
    val expected = docs.where(col("doc_id") % 10 =!= 0)
      .select(col("source"), sha2(col("text"), 256).as("h"))
      .join(baseH.withColumn("_dup", org.apache.spark.sql.functions.lit(1)),
        Seq("h"), "left")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.count(
             org.apache.spark.sql.functions.lit(1)).as("n_delta"),
           ssum(org.apache.spark.sql.functions.coalesce(col("_dup"),
             org.apache.spark.sql.functions.lit(0))).cast("long").as("n_dup"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq(0.001, 0.5).foreach { fpp =>
      val got = Dedup.bloomAdmissionSummary(docs, 10L, fpp).collect()
      assert(got.map(_.getString(0)).toSet == expected.keySet)
      got.foreach { r =>
        val (nDelta, nDup) = expected(r.getString(0))
        assert(r.getLong(1) == nDelta, s"n_delta fpp=$fpp")
        assert(r.getLong(2) == nDup, s"n_dup fpp=$fpp")
        assert(r.getLong(3) == nDelta - nDup, s"n_admitted fpp=$fpp")
      }
    }
  }

  test("compression signal: real deflate, LZ invariants hold, repetition compresses harder") {
    import org.apache.spark.sql.functions.col
    val sig = TextStats.compressionSignal(docs.limit(100)).collect()
    assert(sig.length == 100)
    sig.foreach { r =>
      val (nBytes, dBytes) = (r.getLong(2), r.getLong(3))
      assert(dBytes > 0 && dBytes <= nBytes + 64)
    }
    // determinism: same doc → same deflate size
    val again = TextStats.compressionSignal(docs.limit(100)).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    sig.foreach(r => assert(again(r.getLong(0)) == r.getLong(3)))
    // the guard's invariant columns are all TRUE on the corpus
    val guard = TextStats.compressionGuard(docs).collect()
    assert(guard.nonEmpty)
    guard.foreach { r =>
      assert(r.getBoolean(3), s"double_copy_compresses ${r.getString(0)}")
      assert(r.getBoolean(4), s"bounds_ok ${r.getString(0)}")
    }
    // the signal discriminates: a highly repetitive text compresses to
    // a smaller fraction than heterogeneous text of the same length
    val s = spark
    import s.implicits._
    val rep = ("abc " * 250).trim
    val het = (0 until 250).map(i => (i * 2654435761L).toHexString).mkString(" ").take(rep.length)
    val planted = Seq((1L, "x", rep), (2L, "x", het))
      .toDF("doc_id", "source", "text")
    val ratios = TextStats.compressionSignal(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(3).toDouble / r.getLong(2)).toMap
    assert(ratios(1L) < ratios(2L))
  }

  test("heavy-hitter audit: sketch covers every exact heavy hitter; planted hitter detected") {
    val row = TextStats.heavyHitterAudit(docs, 0.02).collect().head
    assert(row.getLong(0) > 0L)       // tokens counted
    assert(row.getLong(1) > 0L)       // corpus has true heavy hitters at 2%
    assert(row.getBoolean(2))         // superset guarantee held
    // planted corpus: one term at 50% frequency must be the sole
    // heavy hitter at support 0.25, and the sketch must report it
    val s = spark
    import s.implicits._
    val planted = (0 until 200).map(i =>
      (i.toLong, "x", if (i % 2 == 0) "hot filler" else s"cold$i filler"))
      .toDF("doc_id", "source", "text")
    val r = TextStats.heavyHitterAudit(planted, 0.25).collect().head
    assert(r.getLong(0) == 400L)
    // 'filler' is 50% — heavy; 'hot' is exactly 25%, which is NOT
    // strictly greater than support·N, so the true heavy set is
    // {filler} alone (the strict-inequality boundary, pinned)
    assert(r.getLong(1) == 1L)
    assert(r.getBoolean(2))
  }

  test("nfc normalize: kernel composes exactly, idempotent, SQL-registered, report counts planted split") {
    import graft.functions.TokenKernel
    import org.apache.spark.unsafe.types.UTF8String
    val dec = UTF8String.fromString("Cafe\u0301") // e + combining acute
    val comp = UTF8String.fromString("Caf\u00e9") // precomposed
    assert(dec != comp) // genuinely different bytes before NFC
    assert(TokenKernel.nfcNormalize(dec) == comp)
    assert(TokenKernel.nfcNormalize(comp) eq comp) // fast path: same ref
    // SQL registration (GraftExtensions surface)
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT nfc_normalize('Cafe\u0301')")
      .head().getString(0)
    assert(viaSql == "Caf\u00e9")
    // report: n_changed counts exactly the decomposed-planted docs
    val rows = graft.pipeline.TextScrub.nfcNormalizationReport(docs).collect()
    import org.apache.spark.sql.functions.col
    val expected = docs.where(col("doc_id") % 3 === 0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == expected.getOrElse(r.getString(0), 0L))
    }
  }

  test("corpus diff classifies added/removed/modified/unchanged exactly") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, "x", "same"), (2L, "x", "will change"),
      (3L, "y", "goes away")).toDF("doc_id", "source", "text")
    val v2 = Seq((1L, "x", "same"), (2L, "x", "changed!"),
      (4L, "y", "brand new")).toDF("doc_id", "source", "text")
    val got = Curation.corpusDiff(v1, v2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("x", "unchanged") -> 1L, ("x", "modified") -> 1L,
      ("y", "removed") -> 1L, ("y", "added") -> 1L))
  }

  test("language ID argmax is deterministic and covers all docs") {
    val n = TextStats.langIdSummary(docs).agg(sum(col("n"))).head.getLong(0)
    assert(n == 500L)
  }

  test("decontamination flags exactly the train docs sharing a shingle with the eval split") {
    val s = spark
    import s.implicits._
    // eval split = doc_id % 10 == 0 → doc 0 ("x y z w"); doc 11 shares
    // shingle "x y z", doc 12 shares "y z w", doc 13 shares nothing
    // (fewer than k tokens never match), doc 14 shares nothing
    val df = Seq(
      (0L, "e", "x y z w"),
      (11L, "a", "p q x y z"),
      (12L, "a", "y z w k m"),
      (13L, "b", "x y"),
      (14L, "b", "totally different text here")).toDF("doc_id", "source", "text")
    val out = Curation.decontaminationSummary(df, 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", 2L, 2L), ("b", 2L, 0L)))
  }

  test("sequence packing: token totals preserved, seq ids contiguous per stratum") {
    val out = Curation.packSequences(docs, 512L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalPacked = out.map(_._4).sum
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(totalPacked == totalTokens) // nothing dropped, nothing doubled
    out.groupBy(_._1).foreach { case (_, seqs) =>
      val ids = seqs.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length)) // contiguous from 0
      assert(seqs.forall(_._3 >= 1))
    }
  }

  test("repetition signals: hand-checked fractions, sub-2-token docs kept") {
    val s = spark
    import s.implicits._
    // "a a a b": 4 toks, 2 distinct -> dup 2/4; bigrams (a a, a a, a b)
    // -> top 2 of 3. "x": 1 tok, no bigrams -> 0/1 dup, 0/1 top (the
    // greatest(n-1,1) floor keeps the denominator sane).
    val df = Seq((0L, "s1", "a a a b"), (1L, "s2", "x"))
      .toDF("doc_id", "source", "text")
    val out = TextStats.repetitionSignals(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("s1", 1L, 0.5, 0.666667), ("s2", 1L, 0.0, 0.0)))
  }

  test("repetition admission: hand-checked flags, pure-integer decision") {
    val s = spark
    import s.implicits._
    // doc 0: 10 identical tokens — dup-token 9/10 > 0.65, top-bigram
    // ("a a" ×9 = 27 chars of 19) and dup-5-gram (6×9 = 54 chars) all
    // fire. doc 1: 30 distinct 3-char tokens — nothing fires.
    val clean = (0 until 30).map(i => f"w$i%02d").mkString(" ")
    val df = Seq((0L, "s1", ("a " * 10).trim), (1L, "s1", clean))
      .toDF("doc_id", "source", "text")
    val out = TextStats.repetitionAdmission(df, plantRep = false).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L)  // n_in
    assert(r.getLong(2) == 1L)  // n_flag_dup_tok
    assert(r.getLong(3) == 1L)  // n_flag_top_gram
    assert(r.getLong(4) == 1L)  // n_flag_dup_gram
    assert(r.getLong(5) == 1L)  // n_dropped
    assert(r.getLong(6) == 1L)  // n_kept
  }

  test("repetition admission: the stutter plant fires the long-n-gram path; non-degenerate split") {
    val out = TextStats.repetitionAdmission(docs).collect()
    val dupGram = out.map(_.getLong(4)).sum
    val kept = out.map(_.getLong(6)).sum
    val dropped = out.map(_.getLong(5)).sum
    assert(dupGram > 0L, "planted stutter must fire the dup-gram flag")
    assert(kept > 0L && dropped > 0L, s"degenerate split: kept=$kept dropped=$dropped")
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(5) + r.getLong(6)) // n_in = dropped + kept
    }
    val again = TextStats.repetitionAdmission(docs).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("DSIR: a target-like raw doc outweighs junk; k bound and determinism hold") {
    val s = spark
    import s.implicits._
    // target (even ids) speaks alpha/beta; raw doc 1 mimics it, raw
    // doc 3 is out-of-distribution junk — importance weighting must
    // rank 1 above 3
    val df = Seq(
      (0L, "s1", "alpha beta alpha beta alpha beta"),
      (2L, "s1", "alpha beta gamma alpha beta"),
      (1L, "s1", "alpha beta alpha beta"),
      (3L, "s1", "zeta eta theta iota kappa"))
      .toDF("doc_id", "source", "text")
    val out = Curation.dsirResample(df, k = 2).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 3L)) // only raw (odd) docs sampled
    assert(out(1L) > out(3L),
      s"target-like doc must carry the larger importance weight: $out")
    // corpus-level: k per source, ranks contiguous, deterministic
    val full = Curation.dsirResample(docs).collect()
    val bySrc = full.groupBy(_.getString(0))
    bySrc.values.foreach { rs =>
      assert(rs.length <= Curation.DsirK)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    val again = Curation.dsirResample(docs).collect()
    assert(full.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("semantic decon: planted paraphrase is quarantined, orthogonal vec kept") {
    val s = spark
    import s.implicits._
    // classify candidate ids with the operator's own eval flag
    val flags = s.range(0L, 40L)
      .select(col("id"), (TextFunctions.hash64(col("id").cast("string"),
        "sev") % Similarity.SemDeconEvalMod === 0).as("ev"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val evalId = flags.find(_._2).get._1
    val Seq(hitId, cleanId) = flags.filter(!_._2).take(2).map(_._1).toSeq
    // hit duplicates the eval vector exactly (cos 1); clean is
    // orthogonal (cos 0 — same sign bucket, below threshold)
    val mk = (id: Long, lab: Int, v: Seq[Float]) => (id, v, lab)
    val df = Seq(
      mk(evalId, 9, Seq(1f, 0f, 0f, 0f)),
      mk(hitId, 0, Seq(1f, 0f, 0f, 0f)),
      mk(cleanId, 1, Seq(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDecontamination(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0, 1L, 1L, 0L), (1, 1L, 0L, 1L)),
      out.mkString(","))
    // corpus invariants + determinism
    val full = Similarity.semanticDecontamination(embs).collect()
    full.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
    val again = Similarity.semanticDecontamination(embs).collect()
    assert(full.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("stratified sampling is deterministic, keyed, and respects a 0% stratum") {
    val s = spark
    import s.implicits._
    val df = (0L until 400L).map(i => (i, s"src${i % 4}", s"doc $i")).toSeq
      .toDF("doc_id", "source", "text")
    val run = () => Curation.stratifiedSampleSummary(
        df, Map("src1" -> 0, "src2" -> 100), 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run(); val b = run()
    assert(a == b) // pure function of the key — no RNG state
    val bySrc = a.map { case (k, _, kept) => k -> kept }.toMap
    assert(a.forall(_._2 == 100L))
    assert(bySrc("src1") == 0L)   // 0% stratum keeps nothing
    assert(bySrc("src2") == 100L) // 100% stratum keeps everything
    // default 10% stratum: hash-uniform ⇒ binomial(100, 0.1); allow wide slack
    assert(bySrc("src0") > 0L && bySrc("src0") < 30L)
    assert(bySrc("src3") > 0L && bySrc("src3") < 30L)
  }

  test("chunking: coverage, overlap, and boundary arithmetic are exact") {
    val s = spark
    import s.implicits._
    // 10 tokens, chunk 4, overlap 1 (stride 3): starts 0,3,6,9 →
    // lengths 4,4,4,1; consecutive chunks share exactly one token
    val df = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Curation.chunkDocuments(df, 4, 1).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L, 1L))
    val texts = rows.map(_.getString(3))
    assert(texts(0) == "t0 t1 t2 t3" && texts(3) == "t9")
    // overlap invariant: chunk i's last token == chunk i+1's first
    texts.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a.split(" ").last == b.split(" ").head)
    }
    // every token of the corpus appears in some chunk (coverage)
    val covered = texts.flatMap(_.split(" ")).toSet
    assert(covered == (0 until 10).map(i => s"t$i").toSet)
  }

  test("mixture weights: normalized, monotone, epochs·tokens sums to total") {
    val rows = Curation.mixtureWeights(docs).collect()
    val wSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(wSum - 1.0) < 1e-4) // rounded weights still ~normalize
    // α = 0.5 damps the head: weight ratio grows slower than token ratio
    val byTok = rows.sortBy(_.getLong(2))
    val (lo, hi) = (byTok.head, byTok.last)
    assert(hi.getDouble(3) / lo.getDouble(3) <=
      hi.getLong(2).toDouble / lo.getLong(2) + 1e-6)
    // epochs · n_tokens ≈ mix_weight · total_tokens for every source
    val total = rows.map(_.getLong(2)).sum.toDouble
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) * r.getLong(2) -
        r.getDouble(3) * total) < total * 1e-4)
    }
  }

  test("fixed-k sample: exactly k per stratum, deterministic, superset-stable") {
    val s = spark
    import s.implicits._
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toSeq
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val a = Curation.fixedKSample(df, 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a.groupBy(_._1).forall(_._2.length == 7))
    assert(a == Curation.fixedKSample(df, 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    // superset stability: the k smallest hashes of a GROWN corpus can
    // only swap members in, never reorder survivors — every doc kept
    // from the small corpus that survives in the big one keeps rank ≤ k
    val grown = (0L until 600L).map(i => (i, s"src${i % 3}")).toSeq
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val b = Curation.fixedKSample(grown, 7).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val survivors = a.map(t => (t._1, t._2)).toSet.intersect(b)
    assert(survivors.nonEmpty) // hash-uniform: some of 7 survive a 2× grow
  }

  test("quantization error: int8 SQ relative error is small, nonneg, zero-vector-safe") {
    val s = spark
    import s.implicits._
    val rows = Similarity.quantizationErrorProfile(embs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx) = (r.getDouble(2), r.getDouble(3))
      assert(mn >= 0.0 && mx >= mn)
      // int8 symmetric SQ on 64-dim unit-ish vectors: worst-case rel
      // error is ~(1/254)·sqrt(d)·(maxAbs/norm) — comfortably < 0.1
      assert(mx < 0.1, s"label ${r.get(0)}: max_qerr $mx")
    }
    // a zero vector must report error 0, not NaN
    val z = Seq((1L, Array.fill(4)(0.0f), "z")).toDF("vec_id", "embedding", "label")
    val zr = Similarity.quantizationErrorProfile(z).collect()
    assert(zr.head.getDouble(2) == 0.0 && zr.head.getDouble(3) == 0.0)
  }

  test("int8 search recall: lattice vectors recover exact top-k; corpus recall sane") {
    val s = spark
    import s.implicits._
    // vectors with INTEGER components and maxAbs exactly 127: the
    // scale is 127.0/127.0 == 1.0 exactly, so round(v·1)/1 == v and
    // the quantized ranking IS the exact ranking — recall must be 1.0
    // for every query (provable, not probabilistic)
    val rnd = new scala.util.Random(0x1BADB002)
    val lattice = (0L until 40L).map { i =>
      val v = Array.fill(8)((rnd.nextInt(231) - 115).toFloat)
      v(rnd.nextInt(8)) = if (rnd.nextBoolean()) 127f else -127f
      (i, v, "l")
    }.toDF("vec_id", "embedding", "label")
    val perfect = Similarity.int8RecallAudit(lattice, 5, 4L).collect()
    assert(perfect.nonEmpty)
    perfect.foreach { r =>
      assert(r.getDouble(2) == 1.0, s"qid ${r.getLong(0)}: ${r.getDouble(2)}")
    }
    // the real corpus: sized sample nonempty, recall in [0,1], and the
    // no-rescore floor is useful (mean well above chance: k/corpus)
    val rows = Similarity.int8RecallAuditSized(embs, 10).collect()
    assert(rows.nonEmpty)
    val recalls = rows.map(_.getDouble(2))
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    val mean = recalls.sum / recalls.length
    info(f"int8 SQ recall@10 mean over ${rows.length} queries: $mean%.4f")
    assert(mean > 0.5, f"no-rescore floor collapsed: $mean%.4f")
  }

  test("paragraph dedup: keep-first across corpus, within-doc dups stripped, hash pins cleaned text") {
    val s = spark
    import s.implicits._
    // d0: %3 and %5 both plant; d1: byte-identical text, no plants —
    // every organic paragraph is a later occurrence of d0's; d2:
    // within-doc duplicate segment; d3: planted banner is a later
    // occurrence of d0's banner, organic paras unique
    val crafted = Seq(
      (0L, "s", "a b c d e f g h i"),
      (1L, "s", "a b c d e f g h i"),
      (2L, "s", "p q r p q r x y z"),
      (3L, "s", "u v w m n o j k l")).toDF("doc_id", "source", "text")
    val row = Dedup.paragraphDedupSummary(crafted).collect().head
    assert(row.getString(0) == "s")
    assert(row.getLong(1) == 4L)  // n_docs
    assert(row.getLong(2) == 15L) // paras: 5 (d0) + 3 + 3 + 4 (d3+banner)
    assert(row.getLong(3) == 10L) // kept: 5 + 0 + 2 + 3
    assert(row.getLong(4) == 3L)  // d1, d2, d3 changed
    // the hash sum pins the REASSEMBLED texts, not just counts —
    // recompute the portable 60-bit hash over the expected cleaned
    // docs (d1 collapses to empty; d2 loses its middle segment)
    val expectedCleaned = Seq(
      Seq("a b c", Dedup.ParaBanner, "d e f", "g h i", Dedup.ParaFooter)
        .mkString("\n"),
      "",
      "p q r\nx y z",
      "u v w\nm n o\nj k l")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expectedSum = expectedCleaned.map { c =>
      val hex = md.digest((c + "#pd").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000000L
    }.sum
    assert(row.getLong(5) == expectedSum)
    // corpus sanity: totals bound the kept count, all sources present
    val corpus = Dedup.paragraphDedupSummary(docs).collect()
    assert(corpus.map(_.getLong(1)).sum == docs.count())
    corpus.foreach(r => assert(r.getLong(3) <= r.getLong(2)))
  }

  test("q126 salted keeper propagate: flags == unsalted reference; hot key spreads over multiple salts") {
    val s = spark
    import s.implicits._
    // hot planting over the real corpus: ParaHot lands in 50% of docs,
    // far past the derived hot cut at this corpus size
    val paras = Dedup.plantedParagraphsHot(docs)
      .select(col("doc_id"), col("source"), col("para_idx"), col("para"),
        sha2(col("para"), 256).as("h"))
    val flagged = Dedup.saltedKeeperFlags(paras, paras.count())
      .select(col("doc_id"), col("para_idx"), col("kept"))
    // reference: the plain (skew-cliff) keeper join the salting replaced
    val keepers = paras.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("para_idx"))).as("keeper"))
    val ref = paras.join(keepers, "h")
      .select(col("doc_id"), col("para_idx"),
        (col("keeper.doc_id") === col("doc_id") &&
         col("keeper.para_idx") === col("para_idx")).as("kept"))
    assert(flagged.except(ref).isEmpty && ref.except(flagged).isEmpty)
    // the skew pin needs GENUINE skew relative to this session's 4
    // shuffle partitions (the cut is avg-partition fill, so the 12%
    // corpus plant is correctly NOT hot here — it is at the 32-part
    // gate sessions): craft a frame where one key holds >90% of rows
    val hotParas = ((0 until 600).map(i =>
        (i.toLong, "s", 0, Dedup.ParaHot)) ++
      (0 until 50).map(i => (1000L + i, "s", 1, s"unique paragraph $i")))
      .toDF("doc_id", "source", "para_idx", "para")
      .withColumn("h", sha2(col("para"), 256))
    val skew = Dedup.saltedKeeperFlags(hotParas, 650L)
    val spread = skew.where(col("para") === Dedup.ParaHot)
      .agg(countDistinct(col("salt")).as("n_salts"),
        count(lit(1)).as("n_occ"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .collect().head
    assert(spread.getLong(1) == 600L)
    // the hot key's occurrences ride MULTIPLE salt values (multiple
    // shuffle partitions of the (h, salt) keeper join) — the claim
    // that a boilerplate key does not serialize into one task
    assert(spread.getLong(0) > 1L,
      s"hot key rode ${spread.getLong(0)} salt(s) over ${spread.getLong(1)} occurrences")
    assert(spread.getLong(2) == 1L, "exactly one keeper survives per key")
    // cold keys (the unique paragraphs) pay no fan-out: salt 0 only,
    // and every one of them is its own keeper
    val coldRows = skew.where(col("para") =!= Dedup.ParaHot).collect()
    assert(coldRows.length == 50 && coldRows.forall(_.getAs[Int]("salt") == 0)
      && coldRows.forall(_.getAs[Boolean]("kept")))
  }

  test("normalized dedup subsumes raw exact dup groups") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, " hello   world "),
      (4L, "unique doc"), (5L, "unique doc")).toDF("doc_id", "text")
    val groups = Dedup.normalizedDupGroups(df).collect()
    assert(groups.length == 2)
    val byKeep = groups.map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(byKeep(1L) == 3L) // case/whitespace variants collapse together
    assert(byKeep(4L) == 2L) // raw exact dups still found
  }

  test("train split partitions every source; assignment is key-deterministic") {
    val splits = Curation.trainSplitSummary(docs).collect()
    assert(splits.forall(r => Set("train", "val", "test")(r.getString(1))))
    val total = splits.map(_.getLong(2)).sum
    assert(total == docs.count()) // every doc lands in exactly one split
    // same keys → same assignment on a re-read of the same table
    val again = Curation.trainSplitSummary(docs).collect()
    assert(splits.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("hash shards: ids in range, doc totals partition the corpus") {
    val shards = Curation.hashShardBalance(docs, 16).collect()
    assert(shards.forall { r => val id = r.getLong(0); id >= 0 && id < 16 })
    assert(shards.map(_.getLong(1)).sum == docs.count())
    shards.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4)) // min_doc_toks <= max_doc_toks
    }
  }

  test("cross-doc shingle share: identical docs share all, unique doc shares none") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e f", "s1"), (2L, "a b c d e f", "s1"),
      (3L, "q w e r t y", "s2")).toDF("doc_id", "text", "source")
    val rows = Dedup.crossDocShingleShare(df).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("s1") == 1.0) // every shingle of each twin occurs in the other
    assert(rows("s2") == 0.0) // disjoint vocabulary shares nothing
  }

  test("decontamination: a train doc sharing a 13-gram with an eval doc is flagged") {
    val s = spark
    import s.implicits._
    // recover the deterministic '#eval' hash split for ids 0..59 so the
    // crafted corpus can place the shared text on a known eval/train pair
    val ids = (0L until 60L).toDF("doc_id")
    val evalIds = ids.where(
      TextFunctions.hash64($"doc_id".cast("string"), "eval") % 20 === 0)
      .as[Long].collect().toSet
    assert(evalIds.nonEmpty && evalIds.size < 60)
    val evalId = evalIds.min
    val trainId = (0L until 60L).find(!evalIds.contains(_)).get
    val shared =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    assert(shared.split(" ").length == 13)
    val df = (0L until 60L).map { i =>
      val text = if (i == evalId || i == trainId) shared
      else (0 to 12).map(j => s"u${i}t$j").mkString(" ") // unique 13-gram
      (i, text, s"s${i % 3}")
    }.toDF("doc_id", "text", "source")
    val rows = Dedup.decontaminationReport(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per-source spine complete even where nothing hit
    assert(rows.map(_._1).toSeq == Seq("s0", "s1", "s2"))
    assert(rows.map(_._2).sum == 60L - evalIds.size)
    // exactly the one crafted train doc is contaminated, via one shingle
    assert(rows.map(_._3).sum == 1L && rows.map(_._4).sum == 1L)
    val hitSource = s"s${trainId % 3}"
    assert(rows.find(_._1 == hitSource).get._3 == 1L)
  }

  test("decontamination: planting is monotone — banner adds hits, never removes") {
    // prepending the banner preserves every original shingle on both
    // sides, so each source's contaminated count can only grow
    val nat = Dedup.decontaminationReport(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pl = Dedup.decontaminationReport(docs, plantBanner = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(nat.keySet == pl.keySet)
    nat.foreach { case (src, (nTrain, nCont)) =>
      assert(pl(src)._1 == nTrain, s"$src train split changed")
      assert(pl(src)._2 >= nCont, s"$src lost hits under planting")
    }
    // the planting must actually bite: strictly more contamination overall
    assert(pl.values.map(_._2).sum > nat.values.map(_._2).sum)
  }

  test("q138 eval detail: planted banner compromises every planted eval doc at full strength") {
    val s = spark
    import s.implicits._
    // recover the deterministic '#plant'/'#eval' splits from the same
    // hash the dataflow uses
    val flags = docs.select($"doc_id",
        (TextFunctions.hash64($"doc_id".cast("string"), "plant") % 4 === 0)
          .as("pl"),
        (TextFunctions.hash64($"doc_id".cast("string"), "eval") % 20 === 0)
          .as("ev"))
      .as[(Long, Boolean, Boolean)].collect()
    val plantedEval = flags.filter(f => f._2 && f._3).map(_._1).toSet
    val plantedTrain = flags.count(f => f._2 && !f._3).toLong
    assert(plantedEval.nonEmpty && plantedTrain > 0L)
    val out = Dedup.contaminatedEvalDocs13(docs, plantBanner = true)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val byDoc = out.map(r => r._1 -> r).toMap
    // every planted eval doc must be reported, compromised by at least
    // every planted train doc (all carry the banner's four pure
    // 13-grams) through at least those four shingles — saturating at
    // the bounded-evidence cap (64 train docs per shingle), which the
    // banner clique exists precisely to hit
    val floor = math.min(plantedTrain, Dedup.DeconEvidenceCap.toLong)
    plantedEval.foreach { id =>
      val r = byDoc.get(id)
      assert(r.isDefined, s"planted eval doc $id missing from the detail")
      assert(r.get._2 >= floor, s"doc $id: ${r.get._2} < $floor")
      assert(r.get._3 >= 4L)
    }
    // planting preserves every original shingle on both sides, so the
    // natural detail's doc set can only be a subset of the planted one
    val nat = Dedup.contaminatedEvalDocs13(docs).collect()
      .map(_.getLong(0)).toSet
    assert(nat.subsetOf(out.map(_._1).toSet))
  }

  test("CC local fast path == distributed min-label loop on the same graph") {
    // explicit maxIter routes to the iterative distributed loop; the
    // default takes the union-find fast path — both must agree exactly
    val local = Dedup.nearDupClusters(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = Dedup.nearDupClusters(docs, 0.8, maxIter = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("incremental dedup: counts partition the delta; planted dup is caught") {
    val s = spark
    import s.implicits._
    val rows = Dedup.incrementalDedupSummary(docs, 10L, 0.8).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"${r.getString(0)}: delta != exact + near + admitted")
    }
    // exact tier on a crafted corpus: with deltaMod = 5, the 'inc' hash
    // puts docs {6, 7} in the delta (precomputed); doc 7 is an exact
    // copy of base doc 3 → one exact hit, doc 6 unique → admitted
    val crafted = (1L to 8L)
      .map(i => (i,
        if (i == 7L || i == 3L) "a b c d e f" else s"uniq$i text nr$i here",
        "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.incrementalDedupSummary(crafted, 5L, 0.8).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L) // docs 6 and 7 are the delta
    assert(r.getLong(2) == 1L) // doc 7 == doc 3 exactly
    assert(r.getLong(4) == 1L) // doc 6 admitted
  }

  test("collocation head: lift over-represents adjacent pairs, support floor holds") {
    val rows = TextStats.collocationHead(docs, 10L, 25).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getLong(2) >= 10L) // n_pair >= minCount
      assert(r.getDouble(5) > 0.0)
    }
    // descending by rounded lift
    val lifts = rows.map(_.getDouble(5)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  test("bucket recall audit: recall in [0,1]; 0 bits would be exact (sanity via all-probes analogue)") {
    val rows = Similarity.bucketRecallAudit(embs, 10, 4, 100L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val recall = r.getDouble(2)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getLong(1) <= 10L)
    }
    // 1-bit buckets search half the corpus → recall must not decrease
    // when the bucket gets coarser for the same query set
    val coarse = Similarity.bucketRecallAudit(embs, 10, 1, 100L).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val fine = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    fine.foreach { case (qid, rFine) =>
      assert(coarse(qid) >= rFine,
        s"qid $qid: coarser bucket lowered recall ${coarse(qid)} < $rFine")
    }
  }

  test("q129 quarantine-rate guard: eight families, every rate flag TRUE, decodable families nonempty") {
    val rows = Multimodal.quarantineRateGuard(docs).collect()
    val byFamily = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(byFamily.keySet == Set("avi_dib", "g711_alaw_wav",
      "g711_ulaw_wav", "mp4_codecless", "mpeg_codecless", "png_corrupt",
      "png_valid", "wav_pcm"))
    byFamily.foreach { case (f, (total, dec, quar, ok)) =>
      assert(total > 0L, s"$f planted nothing")
      assert(dec + quar == total, f)
      assert(ok, s"$f rate flag flipped: decoded $dec of $total")
    }
    // the flag is computed from OBSERVED outcomes, so the all-or-
    // nothing split must be real: decodable families fully decoded,
    // codec-less ones fully quarantined
    assert(byFamily("avi_dib")._2 == byFamily("avi_dib")._1)
    assert(byFamily("mp4_codecless")._3 == byFamily("mp4_codecless")._1)
  }

  test("q128 IVF recall ladder: per-query monotone, exact at the full-probe endpoint, curve in bounds") {
    val probes = Seq(1, 2, 4, 8)
    val audit = Similarity.ivfRecallAudit(embs, 10, 8, 5L, probes).collect()
    assert(audit.length == probes.length)
    assert(audit.map(_.getInt(0)).toSeq == probes)
    audit.foreach { r =>
      assert(r.getLong(1) > 0L, "no sampled queries")
      assert(r.getBoolean(2), "per-query monotonicity violated")
      assert(r.getBoolean(3), "full-probe rung != exact top-k")
    }
    // the curve the gate cannot carry (k-means-shaped): nondecreasing
    // up the ladder, exactly 1.0 at the all-probes endpoint
    val curve = Similarity.ivfRecallCurve(embs, 10, 8, 5L, probes)
    info(s"IVF recall@10 curve: ${curve.map { case (p, r) => s"nProbe=$p:${"%.3f".format(r)}" }.mkString(", ")}")
    curve.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b >= a, s"average recall decreased up the ladder: $curve")
    }
    assert(curve.last._2 == 1.0, s"endpoint recall ${curve.last._2} != 1.0")
  }

  test("sizedQueryMod: sample bounded by target at any corpus size; oracle-identity arithmetic") {
    // the bound that makes the audit broadcast safe by construction:
    // for dense 0..n-1 ids, |{i : i % mod == 0}| = ceil(n/mod) ≤ target
    def sample(n: Long, mod: Long): Long = (n + mod - 1) / mod
    for (n <- Seq(1L, 7L, 511L, 512L, 513L, 2000L, 20000L, 200000L,
        1L << 40); t <- Seq(1L, 100L, 512L, 2048L)) {
      val mod = Similarity.sizedQueryMod(n, t)
      assert(sample(n, mod) <= t, s"n=$n t=$t mod=$mod")
      // and never over-thins: one step finer would break the bound
      // (mod is the SMALLEST such value), except at the mod=1 floor
      if (mod > 1L) assert(sample(n, mod - 1) > t, s"n=$n t=$t mod=$mod")
    }
    // the exact values the q128 oracle recomputes as (n + 511) // 512
    assert(Similarity.sizedQueryMod(2000L) == 4L)
    assert(Similarity.sizedQueryMod(200000L) == 391L)
    assert(Similarity.sizedQueryMod(100L) == 1L)
  }

  test("knn label audit: accuracy bounds hold; perfect clusters score 1.0") {
    val s = spark
    import s.implicits._
    val rows = Similarity.knnLabelAudit(embs, 5, 4).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
    }
    // two tight, well-separated label clusters → every majority vote
    // is the own label → accuracy 1.0 for both
    val crafted = (
      (1L to 4L).map(i => (i, Array(1.0f, 0.0f, 0.01f * i, 0.0f), "a")) ++
      (5L to 8L).map(i => (i, Array(-1.0f, 0.0f, 0.0f, 0.01f * i), "b"))
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelAudit(crafted, 3, 1).collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getDouble(3) == 1.0,
      s"label ${r.getString(0)}: accuracy ${r.getDouble(3)}"))
  }

  test("cluster histogram: sizes >= 2, total members == clustered docs") {
    val hist = Dedup.clusterSizeHistogram(docs, 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(hist.nonEmpty)
    assert(hist.forall(_._1 >= 2)) // a cluster needs at least two members
    val members = hist.map { case (k, n) => k * n }.sum
    assert(members == Dedup.nearDupClusters(docs, 0.8).count())
  }

  test("contamination detail: eval docs only, hit counts positive") {
    val rows = Curation.contaminatedEvalDocs(docs, 10L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 0) // eval side of the split
      assert(r.getLong(1) >= 1L)
    }
    // the hot-shingle dial prunes: a df cap of 1 removes every SHARED
    // shingle by definition, so no contamination evidence survives
    assert(Curation.contaminatedEvalDocs(docs, 10L, maxShingleDf = 1L)
      .count() == 0L)
    // and a cap above the max df is a no-op (exact semantics preserved)
    val capped = Curation.contaminatedEvalDocs(docs, 10L,
      maxShingleDf = 1000000L).collect().map(_.toSeq).toSeq
    assert(capped == rows.map(_.toSeq).toSeq)
  }

  test("minhash estimate audit: one row per verified pair, estimates in [0,1]") {
    val audit = Dedup.minhashEstimateAudit(docs, 0.8).collect()
    val pairs = Dedup.lshNearDupPairs(docs, 0.8).count()
    assert(audit.length.toLong == pairs)
    audit.foreach { r =>
      val (j, est, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(math.abs(j - est) - err) < 1e-6)
      // 8 hashes → estimates quantized to eighths
      assert(math.abs(est * 8 - math.round(est * 8)) < 1e-9)
    }
  }

  test("decontaminate apply: planting is monotone — it only ADDS contamination") {
    // the banner prepend only adds shingles (natural shingles survive
    // on both sides of the split), so every naturally-dropped source
    // count can only grow under planting
    val natural = Dedup.decontaminateCorpus13(docs, plantBanner = false)
      .select("source", "n_dropped").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val planted = Dedup.decontaminateCorpus13(docs, plantBanner = true)
      .select("source", "n_dropped").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(natural.keySet == planted.keySet)
    natural.foreach { case (src, n) =>
      assert(planted(src) >= n, s"$src: planted ${planted(src)} < natural $n")
    }
    // the planted run actually exercises the drop path
    assert(planted.values.sum > 0L)
  }

  test("decontaminate apply: n_dropped == the report's n_contaminated; kept+dropped == train") {
    // both sides share deconBase, so the apply's drop set is
    // DEFINITIONALLY the report's contaminated set — pinned here so a
    // refactor of either can't silently de-sync the pair
    val report = Dedup.decontaminationReport(docs, plantBanner = true)
      .select("source", "n_train_docs", "n_contaminated").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val apply = Dedup.decontaminateCorpus13(docs, plantBanner = true).collect()
    assert(apply.nonEmpty)
    apply.foreach { r =>
      val (src, nTrain, nDropped, nKept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (repTrain, repCont) = report(src)
      assert(nTrain == repTrain, s"$src: train count drift")
      assert(nDropped == repCont, s"$src: $nDropped dropped != $repCont contaminated")
      assert(nKept + nDropped == nTrain)
    }
  }

  test("winnow neighbors: rank orders by shared-fingerprint count, rows are symmetric") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    def words(n: Int) = Seq.fill(n)("n" + rng.nextInt(9000)).mkString(" ")
    // A shares a LONG run with B (more fps) and a shorter one with C:
    // A's rank-1 neighbor must be B, rank-2 C; B and C rank A first
    val big = words(60); val small = words(16)
    val corpus = Seq(
      (1L, words(10) + " " + big + " " + small),
      (2L, big + " " + words(30)),
      (3L, words(25) + " " + small)).toDF("doc_id", "text")
    val out = Winnow.winnowTopNeighbors(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val a = out.filter(_._1 == 1L).sortBy(_._4)
    assert(a.map(t => (t._2, t._4)).toSeq == Seq((2L, 1), (3L, 2)))
    assert(a(0)._3 > a(1)._3) // strictly more evidence toward B
    // symmetry: B and C each report A as their top neighbor
    assert(out.filter(_._1 == 2L).minBy(_._4)._2 == 1L)
    assert(out.filter(_._1 == 3L).minBy(_._4)._2 == 1L)
  }

  // ----- winnowing fingerprints (q139/q140) -----

  test("posShingleHashes kernel: bit-equal to the HOF spelling, duplicates kept") {
    val s = spark
    import s.implicits._
    val k = Winnow.WinnowK
    val toks = TextFunctions.tokens(col("text"))
    val hof = when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => TextFunctions.hash64Sql(concat_ws(" ", slice(toks, i, lit(k))), "wn")))
      .otherwise(array().cast("array<bigint>"))
    val mism = docs.limit(100)
      .select(TextFunctions.posShingleHashes(col("text"), k, "wn").as("native"),
        hof.as("sql"))
      .where(not(col("native") <=> col("sql"))).count()
    assert(mism == 0L)
    // NON-distinct by design: a repeated gram appears at every position
    val rep = Seq((1L, "x y x y x y x y")).toDF("doc_id", "text")
      .select(TextFunctions.posShingleHashes(col("text"), 2, "wn").as("g"))
      .head.getSeq[Long](0)
    assert(rep.length == 7 && rep.distinct.length == 2)
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens always yields a shared fingerprint") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    def words(n: Int) = Seq.fill(n)("w" + rng.nextInt(5000)).mkString(" ")
    // t = w + k - 1 = 8: one full gram window fits wholly inside the
    // shared run on both sides, so its min is selected in both docs
    (0 until 10).foreach { trial =>
      val shared = words(Winnow.WinnowW + Winnow.WinnowK - 1)
      val a = words(30) + " " + shared + " " + words(25)
      val b = words(17) + " " + shared + " " + words(40)
      val fps = Winnow.winnowedFingerprints(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
        .select("doc_id", "fp_hash").collect()
      val fa = fps.filter(_.getLong(0) == 1L).map(_.getLong(1)).toSet
      val fb = fps.filter(_.getLong(0) == 2L).map(_.getLong(1)).toSet
      assert((fa & fb).nonEmpty, s"trial $trial: no shared fingerprint")
    }
  }

  test("winnowing density bounds and the leftmost tie-break") {
    val s = spark
    import s.implicits._
    val one = docs.orderBy("doc_id").limit(1).cache()
    val nGrams = one.select(size(
      TextFunctions.posShingleHashes(col("text"), Winnow.WinnowK, "wn"))).head.getInt(0)
    val nWin = nGrams - Winnow.WinnowW + 1
    val nFp = Winnow.winnowedFingerprints(one).count()
    one.unpersist()
    // every window selects exactly one fp; one fp covers <= w windows
    assert(nFp <= nWin)
    assert(nFp >= (nWin + Winnow.WinnowW - 1) / Winnow.WinnowW)
    // all-identical tokens: every gram hash equal, so the leftmost
    // tie-break selects every full-window start — 20 tokens, k=5 ->
    // 16 grams, w=4 -> 13 windows, starts 0..12
    val sel = Winnow.winnowedFingerprints(
        Seq((7L, Seq.fill(20)("z").mkString(" "))).toDF("doc_id", "text"))
      .select("fp_pos").collect().map(_.getLong(0)).sorted.toSeq
    assert(sel == (0L to 12L))
  }

  test("winnow overlap: df cap silences boilerplate; true copies pair with bounded evidence") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    def words(n: Int) = Seq.fill(n)("v" + rng.nextInt(9000)).mkString(" ")
    // 10 docs of IDENTICAL boilerplate: every fingerprint has df=10 >
    // maxDf=8, so the evidence filter drops all of it — zero pairs
    // even at minShared=1 (boilerplate is not copy evidence)
    val boiler = words(40)
    val silent = Winnow.winnowOverlapPairs(
      (0 until 10).map(i => (i.toLong, boiler)).toDF("doc_id", "text"),
      minShared = 1L)
    assert(silent.count() == 0L)
    // a 40-token run shared by exactly two docs: df=2 evidence, ~33
    // fully-contained windows -> >= ceil(33/w) ~ 9 shared fps >= 5
    val run = words(40)
    val pairs = Winnow.winnowOverlapPairs(
      Seq((100L, words(30) + " " + run), (200L, run + " " + words(35)))
        .toDF("doc_id", "text")).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 100L && pairs(0).getLong(1) == 200L)
    assert(pairs(0).getLong(2) >= Winnow.WinnowMinShared)
  }

  test("winnow apply: keep-best over the pair graph; kept+dropped == corpus; the shared-run doc drops") {
    val s = spark
    import s.implicits._
    // corpus invariants at the gate parameters: the digest partitions
    // the corpus exactly, and only flagged docs can drop
    Winnow.winnowDedupCorpus(docs).collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_docs"), r.toString)
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_flagged"), r.toString)
    }
    // the 40-token shared-run fixture (the q140 spec shape): two docs
    // sharing the run, one unrelated doc in its own source. Keep-best
    // must keep the LONGER pair member, drop the other, leave the
    // unrelated doc untouched — and the kept-corpus content hash must
    // certify exactly the survivors.
    val rng = new scala.util.Random(11)
    def words(n: Int) = Seq.fill(n)("w" + rng.nextInt(9000)).mkString(" ")
    val run = words(40)
    val a = words(30) + " " + run
    val b = run + " " + words(35)
    val c = words(50)
    val fix = Seq((100L, "s1", a), (200L, "s1", b), (300L, "s2", c))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length($"text"))
    val out = Winnow.winnowDedupCorpus(fix).collect()
    val s1 = out.find(_.getString(0) == "s1").get
    val s2 = out.find(_.getString(0) == "s2").get
    assert(s1.getAs[Long]("n_flagged") == 2L && s1.getAs[Long]("n_dropped") == 1L
      && s1.getAs[Long]("n_kept") == 1L, s1.toString)
    assert(s2.getAs[Long]("n_flagged") == 0L && s2.getAs[Long]("n_dropped") == 0L
      && s2.getAs[Long]("n_kept") == 1L, s2.toString)
    // which doc survived: longest n_chars wins (tie → smaller id)
    val keptText = if (b.length > a.length) b else a
    def wkHash(t: String): Long = Seq(Tuple1(t)).toDF("text")
      .select(graft.pipeline.TextFunctions.hash64(col("text"), "wk") % 1000000000L)
      .head.getLong(0)
    assert(s1.getAs[Long]("kept_hash_sum") == wkHash(keptText))
    assert(s2.getAs[Long]("kept_hash_sum") == wkHash(c))
  }

  test("winnow store: planted cross-split copy found through the persisted store; store round-trips") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_store_spec").toString
    // find one delta id and one base id under the gate's '#inc' split
    val isDeltaCol = graft.pipeline.TextFunctions
      .hash64(col("doc_id").cast("string"), "inc") % Winnow.WinnowDeltaMod === 0
    val ids = (0L until 64L).toDF("doc_id")
      .select($"doc_id", isDeltaCol.as("d")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val deltaId = ids.find(_._2).get._1
    val baseId = ids.filter(!_._2).head._1
    val rng = new scala.util.Random(3)
    def words(n: Int) = Seq.fill(n)("u" + rng.nextInt(9000)).mkString(" ")
    val run = words(40)
    val fix = Seq((deltaId, words(25) + " " + run),
        (baseId, run + " " + words(30)))
      .toDF("doc_id", "text")
    Winnow.buildWinnowStore(fix.where(!isDeltaCol),
      "winnow_store_spec_tbl", dir)
    try {
      val out = Winnow.winnowStorePairs(fix.where(isDeltaCol),
        "winnow_store_spec_tbl", Winnow.WinnowK, Winnow.WinnowW,
        Winnow.WinnowMaxDf, Winnow.WinnowMinShared).collect()
      assert(out.length == 1, out.mkString(";"))
      assert(out(0).getLong(0) == deltaId && out(0).getLong(1) == baseId)
      assert(out(0).getLong(2) >= Winnow.WinnowMinShared)
      // round-trip: the store holds exactly the base fingerprint table
      assert(s.table("winnow_store_spec_tbl").count() ==
        Winnow.winnowedFingerprints(fix.where(!isDeltaCol)).count())
    } finally s.sql("DROP TABLE IF EXISTS winnow_store_spec_tbl")
  }

  test("winnow store admission: the cross-split copy is rejected, the clean doc admitted, hash certifies") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_admit_spec").toString
    val isDeltaCol = graft.pipeline.TextFunctions
      .hash64(col("doc_id").cast("string"), "inc") % Winnow.WinnowDeltaMod === 0
    val ids = (0L until 64L).toDF("doc_id")
      .select($"doc_id", isDeltaCol.as("d")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val deltaIds = ids.filter(_._2).map(_._1)
    val baseId = ids.filter(!_._2).head._1
    val rng = new scala.util.Random(5)
    def words(n: Int) = Seq.fill(n)("a" + rng.nextInt(9000)).mkString(" ")
    val run = words(40)
    val copyText = words(20) + " " + run // delta near-copy of base
    val cleanText = words(45)
    val fix = Seq(
        (deltaIds(0), "sA", copyText),
        (deltaIds(1), "sA", cleanText),
        (baseId, "sB", run + " " + words(25)))
      .toDF("doc_id", "source", "text")
    Winnow.buildWinnowStore(fix.where(!isDeltaCol),
      "winnow_admit_spec_tbl", dir)
    try {
      val flaggedPairs = Winnow.winnowStorePairs(fix.where(isDeltaCol),
        "winnow_admit_spec_tbl", Winnow.WinnowK, Winnow.WinnowW,
        Winnow.WinnowMaxDf, Winnow.WinnowMinShared)
      // digest tail computed exactly as winnowStoreAdmit (which would
      // rebuild the store under its own name; probe the spec's table)
      val flagged = flaggedPairs.select($"delta_doc".as("doc_id")).distinct()
      val delta = fix.where(isDeltaCol)
      val admitted = delta.join(flagged, Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == Set(deltaIds(1)),
        s"expected only the clean doc admitted, got $admitted")
      // the '#wa' hash certifies the admitted TEXT, not just counts
      def waHash(t: String): Long = Seq(Tuple1(t)).toDF("text")
        .select(graft.pipeline.TextFunctions.hash64(col("text"), "wa")
          % 1000000000L).head.getLong(0)
      val hs = delta.join(flagged, Seq("doc_id"), "left_anti")
        .agg(sum(graft.pipeline.TextFunctions.hash64(col("text"), "wa")
          % 1000000000L)).head.getLong(0)
      assert(hs == waHash(cleanText))
    } finally s.sql("DROP TABLE IF EXISTS winnow_admit_spec_tbl")
  }

  test("winnow store append: probe after a bucketed append == probe of the store rebuilt whole") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(9)
    def words(n: Int) = Seq.fill(n)("b" + rng.nextInt(9000)).mkString(" ")
    val run = words(40)
    // base in two batches; the probe doc copies from a doc in BATCH 2
    // (the appended one) — the probe must see it through the append
    val batch1 = Seq((10L, words(30)), (11L, words(35)))
    val batch2 = Seq((20L, run + " " + words(20)))
    val probe = Seq((99L, words(15) + " " + run)).toDF("doc_id", "text")
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_winnow_append_a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_winnow_append_b").toString
    Winnow.buildWinnowStore(batch1.toDF("doc_id", "text"),
      "winnow_append_tbl", dirA)
    Winnow.appendWinnowStore(batch2.toDF("doc_id", "text"),
      "winnow_append_tbl")
    Winnow.buildWinnowStore((batch1 ++ batch2).toDF("doc_id", "text"),
      "winnow_whole_tbl", dirB)
    try {
      def pairsVia(table: String) =
        Winnow.winnowStorePairs(probe, table, Winnow.WinnowK, Winnow.WinnowW,
            Winnow.WinnowMaxDf, Winnow.WinnowMinShared)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq.sorted
      val appended = pairsVia("winnow_append_tbl")
      assert(appended == pairsVia("winnow_whole_tbl"))
      assert(appended.map(p => (p._1, p._2)) == Seq((99L, 20L)),
        appended.toString)
    } finally {
      s.sql("DROP TABLE IF EXISTS winnow_append_tbl")
      s.sql("DROP TABLE IF EXISTS winnow_whole_tbl")
    }
  }

  // ----- r17: span attribution + store idempotence/compaction/guard -----

  test("winnow spans: the planted copied run is located in both docs' token coordinates, one island each") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    def words(n: Int) = Seq.fill(n)("c" + rng.nextInt(9000)).mkString(" ")
    val runLen = 20; val preA = 25; val preB = 10
    val run = words(runLen)
    val docs = Seq((1L, words(preA) + " " + run + " " + words(12)),
        (2L, words(preB) + " " + run + " " + words(30)))
      .toDF("doc_id", "text")
    val spans = Winnow.winnowCopySpans(docs, minShared = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val aSide = spans.filter(_._3 == "a"); val bSide = spans.filter(_._3 == "b")
    // one contiguous copied region → one island per side (matched
    // fingerprints inside a shared run sit <= w grams apart, well
    // under the span gap)
    assert(aSide.length == 1 && bSide.length == 1, spans.mkString(";"))
    // located WHERE planted: matched grams lie wholly inside the run,
    // so [start, end] nests in the run's token interval on each side
    assert(aSide(0)._5 >= preA && aSide(0)._6 <= preA + runLen - 1,
      aSide(0).toString)
    assert(bSide(0)._5 >= preB && bSide(0)._6 <= preB + runLen - 1,
      bSide(0).toString)
    assert(aSide(0)._7 >= 1 && aSide(0)._4 == 1L)
  }

  test("winnow store spans: the planted cross-split copy is located in BOTH coordinate systems; pair set == probe") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(29)
    def words(n: Int) = Seq.fill(n)("h" + rng.nextInt(9000)).mkString(" ")
    val runLen = 30; val preD = 12; val preB = 20
    val run = words(runLen)
    val base = Seq((1L, words(preB) + " " + run + " " + words(15)),
        (2L, words(35))).toDF("doc_id", "text")
    val delta = Seq((50L, words(preD) + " " + run),
        (51L, words(25))).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_storespan").toString
    Winnow.buildWinnowStore(base, "winnow_storespan_tbl", dir)
    try {
      val spans = Winnow.winnowStoreSpans(delta, "winnow_storespan_tbl")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      // only the copying delta doc reports, against only its source
      assert(spans.forall(sp => sp._1 == 50L && sp._2 == 1L),
        spans.mkString(";"))
      val dSide = spans.filter(_._3 == "delta")
      val bSide = spans.filter(_._3 == "base")
      assert(dSide.length == 1 && bSide.length == 1, spans.mkString(";"))
      // located where planted, in EACH doc's own token coordinates
      assert(dSide(0)._5 >= preD && dSide(0)._6 <= preD + runLen - 1,
        dSide(0).toString)
      assert(bSide(0)._5 >= preB && bSide(0)._6 <= preB + runLen - 1,
        bSide(0).toString)
      // pair-set consistency with the probe, same params
      val probePairs = Winnow.winnowStorePairs(delta,
          "winnow_storespan_tbl", Winnow.WinnowK, Winnow.WinnowW,
          Winnow.WinnowMaxDf, Winnow.WinnowMinShared)
        .select("delta_doc", "base_doc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(spans.map(sp => (sp._1, sp._2)).toSet == probePairs)
    } finally s.sql("DROP TABLE IF EXISTS winnow_storespan_tbl")
  }

  test("winnow store ingest idempotence: a batch already folded into the store re-admits ZERO") {
    // DESIGN DECISION (r16 VERDICT task 2): winnowStorePairs keeps
    // self-pairs (delta_doc == base_doc) — they ARE the idempotence
    // mechanism: a re-ingested doc matches its own fingerprints in
    // the store and is rejected, which is exactly the base-copy-wins
    // policy (the standing corpus already holds this content; WHICH
    // base doc holds it is irrelevant). No =!= filter is added.
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13)
    def words(n: Int) = Seq.fill(n)("d" + rng.nextInt(9000)).mkString(" ")
    val base = Seq((1L, words(40)), (2L, words(35))).toDF("doc_id", "text")
    val batch = Seq((50L, words(40)), (51L, words(45))).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_idem").toString
    Winnow.buildWinnowStore(base, "winnow_idem_tbl", dir)
    try {
      def flaggedOf(b: org.apache.spark.sql.DataFrame): Set[Long] =
        Winnow.winnowStorePairs(b, "winnow_idem_tbl", Winnow.WinnowK,
            Winnow.WinnowW, Winnow.WinnowMaxDf, Winnow.WinnowMinShared)
          .select("delta_doc").distinct().collect()
          .map(_.getLong(0)).toSet
      // fresh batch admits fully...
      assert(flaggedOf(batch).isEmpty)
      // ...fold it in, replay it: every doc self-matches → zero admitted
      Winnow.appendWinnowStore(batch, "winnow_idem_tbl")
      assert(flaggedOf(batch) == Set(50L, 51L))
    } finally s.sql("DROP TABLE IF EXISTS winnow_idem_tbl")
  }

  test("winnow store disjoint split never yields a self-pair (q146 path)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    def words(n: Int) = Seq.fill(n)("e" + rng.nextInt(300)).mkString(" ")
    val fix = (0L until 40L).map(i => (i, "sX", words(30)))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_selfpair").toString
    try {
      val pairs = Winnow.winnowStoreOverlap(fix, Winnow.WinnowDeltaMod,
        "winnow_selfpair_tbl", dir, minShared = 1L)
      assert(pairs.where(col("delta_doc") === col("base_doc")).count() == 0)
    } finally s.sql("DROP TABLE IF EXISTS winnow_selfpair_tbl")
  }

  test("winnow store compaction: replayed appends dedupe; probe identical; bucket spec survives") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(19)
    def words(n: Int) = Seq.fill(n)("f" + rng.nextInt(9000)).mkString(" ")
    val run = words(40)
    val base = Seq((1L, words(30)), (2L, run + " " + words(20)))
      .toDF("doc_id", "text")
    val batch = Seq((3L, words(25))).toDF("doc_id", "text")
    val probe = Seq((99L, words(10) + " " + run)).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_compact").toString
    Winnow.buildWinnowStore(base, "winnow_compact_tbl", dir)
    // replay the SAME batch twice — blind appends duplicate its rows
    Winnow.appendWinnowStore(batch, "winnow_compact_tbl")
    Winnow.appendWinnowStore(batch, "winnow_compact_tbl")
    try {
      def probePairs() = Winnow.winnowStorePairs(probe,
          "winnow_compact_tbl", Winnow.WinnowK, Winnow.WinnowW,
          Winnow.WinnowMaxDf, Winnow.WinnowMinShared)
      val before = probePairs().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      val rawBefore = s.table("winnow_compact_tbl").count()
      val distinctRows = s.table("winnow_compact_tbl").distinct().count()
      assert(rawBefore > distinctRows, s"$rawBefore vs $distinctRows")
      Winnow.compactWinnowStore(s, "winnow_compact_tbl", dir)
      assert(s.table("winnow_compact_tbl").count() == distinctRows)
      val after = probePairs()
      assert(after.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted == before)
      assert(before.map(p => (p._1, p._2)) == Seq((99L, 2L)))
      // the rewrite kept the (fp_hash, 16) bucket spec: the probe's
      // base aggregate still scans bucketed, no base-side exchange
      assert(after.queryExecution.executedPlan.toString
        .contains("Bucketed: true"))
    } finally s.sql("DROP TABLE IF EXISTS winnow_compact_tbl")
  }

  test("band store stale-guard: a CHANGED base at the same table+path rebuilds (store == memory for the new corpus)") {
    // the ADVICE-r16 "same precedent as bandStoreBuilt" hazard,
    // closed: two disjoint-id-set corpora through ONE table+path —
    // the second probe must equal the in-memory q68 path for the
    // SECOND corpus, which a stale store cannot produce
    val s = spark
    val corpusA = docs.where(col("doc_id") % 2 === 0)
    val corpusB = docs.where(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_band_guard").toString
    try {
      def viaStore(c: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalDedupViaBandStore(c, 10L, 0.8,
          "band_guard_tbl", dir).collect().map(_.toString).toSeq
      viaStore(corpusA) // builds the store for A's base
      val viaMemB = Dedup.incrementalDedupSummary(corpusB, 10L, 0.8)
        .collect().map(_.toString).toSeq
      assert(viaStore(corpusB) == viaMemB)
    } finally s.sql("DROP TABLE IF EXISTS band_guard_tbl")
  }

  test("winnow store stale-guard: a CHANGED base at the same table+path rebuilds, never probes the stale store") {
    val s = spark
    import s.implicits._
    val isDeltaCol = graft.pipeline.TextFunctions
      .hash64(col("doc_id").cast("string"), "inc") % Winnow.WinnowDeltaMod === 0
    val ids = (0L until 64L).toDF("doc_id")
      .select($"doc_id", isDeltaCol.as("d")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val deltaId = ids.find(_._2).get._1
    val baseIds = ids.filter(!_._2).map(_._1)
    val rng = new scala.util.Random(23)
    def words(n: Int) = Seq.fill(n)("g" + rng.nextInt(9000)).mkString(" ")
    val runA = words(40); val runB = words(40)
    // corpus A: delta copies from base doc baseIds(0). Corpus B (same
    // table+path!) is a DIFFERENT corpus — different base id set —
    // where the same delta id copies from baseIds(1), and A's
    // evidence no longer exists anywhere. (The guard's signature is
    // id-set-shaped by design — a content swap at an IDENTICAL id set
    // requires an explicit rebuild, documented at ensureWinnowStore.)
    val corpusA = Seq((deltaId, words(10) + " " + runA),
        (baseIds(0), runA + " " + words(15)),
        (baseIds(1), words(35))).toDF("doc_id", "text")
    val corpusB = Seq((deltaId, words(12) + " " + runB),
        (baseIds(1), runB + " " + words(18)),
        (baseIds(2), words(22))).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_guard").toString
    try {
      def pairsOf(c: org.apache.spark.sql.DataFrame) =
        Winnow.winnowStoreOverlap(c, Winnow.WinnowDeltaMod,
            "winnow_guard_tbl", dir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(pairsOf(corpusA) == Seq((deltaId, baseIds(0))))
      // same table+path, different corpus: the signature check must
      // rebuild — the stale store would still report baseIds(0)
      assert(pairsOf(corpusB) == Seq((deltaId, baseIds(1))))
    } finally s.sql("DROP TABLE IF EXISTS winnow_guard_tbl")
  }

  // ----- r18: stale-guard content moment, crash-safe compaction, dirTag -----

  test("winnow store stale-guard content moment: a text swap at an IDENTICAL doc_id set rebuilds when n_chars moves") {
    // ADVICE r17: the id-set-only signature let an in-place text
    // mutation at the same ids silently probe a stale store. With the
    // n_chars moment folded into the same aggregate, a swap that moves
    // total n_chars (almost any real mutation) now rebuilds.
    val s = spark
    import s.implicits._
    val isDeltaCol = graft.pipeline.TextFunctions
      .hash64(col("doc_id").cast("string"), "inc") % Winnow.WinnowDeltaMod === 0
    val ids = (0L until 64L).toDF("doc_id")
      .select($"doc_id", isDeltaCol.as("d")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val deltaId = ids.find(_._2).get._1
    val baseIds = ids.filter(!_._2).map(_._1)
    val rng = new scala.util.Random(31)
    def words(n: Int) = Seq.fill(n)("m" + rng.nextInt(9000)).mkString(" ")
    val run = words(40)
    def withNc(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    // corpus A: delta copies from baseIds(0); corpus B: SAME three
    // doc_ids, but the copied run moved to baseIds(1) and every text
    // changed length — only the n_chars moment can tell them apart
    val corpusA = withNc(Seq((deltaId, words(10) + " " + run),
      (baseIds(0), run + " " + words(15)), (baseIds(1), words(35))))
    val corpusB = withNc(Seq((deltaId, words(12) + " " + run),
      (baseIds(0), words(30)), (baseIds(1), run + " " + words(22))))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_moment").toString
    try {
      def pairsOf(c: org.apache.spark.sql.DataFrame) =
        Winnow.winnowStoreOverlap(c, Winnow.WinnowDeltaMod,
            "winnow_moment_tbl", dir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(pairsOf(corpusA) == Seq((deltaId, baseIds(0))))
      assert(pairsOf(corpusB) == Seq((deltaId, baseIds(1))))
    } finally s.sql("DROP TABLE IF EXISTS winnow_moment_tbl")
  }

  test("winnow store compaction: a stale pre-existing staging dir neither corrupts nor survives the rewrite") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(37)
    def words(n: Int) = Seq.fill(n)("n" + rng.nextInt(9000)).mkString(" ")
    val run = words(40)
    val base = Seq((1L, run + " " + words(20)), (2L, words(30)))
      .toDF("doc_id", "text")
    val batch = Seq((3L, words(25))).toDF("doc_id", "text")
    val probe = Seq((99L, words(10) + " " + run)).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_crashstage").toString
    Winnow.buildWinnowStore(base, "winnow_crashstage_tbl", dir)
    Winnow.appendWinnowStore(batch, "winnow_crashstage_tbl")
    Winnow.appendWinnowStore(batch, "winnow_crashstage_tbl")
    // a crashed prior compaction's leftovers: junk of the WRONG schema
    // under the old fixed name and a unique-suffixed one
    for (stale <- Seq("_compact_staging", "_compact_staging_p1_dead")) {
      Seq(("junk", 1)).toDF("a", "b")
        .write.mode("overwrite").parquet(dir + stale)
    }
    try {
      val distinctRows =
        s.table("winnow_crashstage_tbl").distinct().count()
      Winnow.compactWinnowStore(s, "winnow_crashstage_tbl", dir)
      assert(s.table("winnow_crashstage_tbl").count() == distinctRows)
      val pairs = Winnow.winnowStorePairs(probe, "winnow_crashstage_tbl",
          Winnow.WinnowK, Winnow.WinnowW, Winnow.WinnowMaxDf,
          Winnow.WinnowMinShared)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs == Seq((99L, 1L)), pairs.toString)
      // every staging sibling — stale AND this run's — is gone
      val parent = new java.io.File(dir).getParentFile
      val leftovers = parent.listFiles().map(_.getName)
        .filter(n => n.startsWith(new java.io.File(dir).getName) &&
          n.contains("_compact_staging"))
      assert(leftovers.isEmpty, leftovers.mkString(","))
    } finally s.sql("DROP TABLE IF EXISTS winnow_crashstage_tbl")
  }

  test("band store append: probe after a bucketed append == probe of the store rebuilt whole") {
    // lifecycle parity with the winnow store (r17 VERDICT task 2):
    // the probe doc near-copies a doc in BATCH 2 (the appended one) —
    // the candidate join must see it through the append, identically
    // to a store rebuilt from the whole base
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(41)
    def words(n: Int) = Seq.fill(n)("p" + rng.nextInt(9000)).mkString(" ")
    val t20 = words(30)
    val batch1 = Seq((10L, words(25)), (11L, words(28)))
    val batch2 = Seq((20L, t20))
    val probe = Seq((99L, t20)).toDF("doc_id", "text") // exact copy
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_band_append_a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_band_append_b").toString
    Dedup.buildBandStore(batch1.toDF("doc_id", "text"),
      "band_append_tbl", dirA)
    Dedup.appendBandStore(batch2.toDF("doc_id", "text"), "band_append_tbl")
    Dedup.buildBandStore((batch1 ++ batch2).toDF("doc_id", "text"),
      "band_whole_tbl", dirB)
    try {
      def candsVia(table: String) =
        Dedup.bandStoreCandidates(probe, table).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val appended = candsVia("band_append_tbl")
      assert(appended == candsVia("band_whole_tbl"))
      assert(appended == Seq((99L, 20L)), appended.toString)
    } finally {
      s.sql("DROP TABLE IF EXISTS band_append_tbl")
      s.sql("DROP TABLE IF EXISTS band_whole_tbl")
    }
  }

  test("band store compaction: replayed appends dedupe; candidates identical; bucket spec survives") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(43)
    def words(n: Int) = Seq.fill(n)("q" + rng.nextInt(9000)).mkString(" ")
    val t2 = words(30)
    val base = Seq((1L, words(26)), (2L, t2)).toDF("doc_id", "text")
    val batch = Seq((3L, words(24))).toDF("doc_id", "text")
    val probe = Seq((99L, t2)).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_band_compact").toString
    Dedup.buildBandStore(base, "band_compact_tbl", dir)
    // replay the SAME batch twice — blind appends duplicate its rows
    Dedup.appendBandStore(batch, "band_compact_tbl")
    Dedup.appendBandStore(batch, "band_compact_tbl")
    try {
      def cands() = Dedup.bandStoreCandidates(probe, "band_compact_tbl")
      val before = cands().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val rawBefore = s.table("band_compact_tbl").count()
      val distinctRows = s.table("band_compact_tbl").distinct().count()
      assert(rawBefore > distinctRows, s"$rawBefore vs $distinctRows")
      Dedup.compactBandStore(s, "band_compact_tbl", dir)
      assert(s.table("band_compact_tbl").count() == distinctRows)
      val after = cands()
      assert(after.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted == before)
      assert(before == Seq((99L, 2L)), before.toString)
      // the rewrite kept the ((band, bkey), 16) bucket spec: the
      // candidate join still scans the store bucketed
      assert(after.queryExecution.executedPlan.toString
        .contains("Bucketed: true"))
    } finally s.sql("DROP TABLE IF EXISTS band_compact_tbl")
  }

  test("winnow scrub: the cut nests inside the planted run, the winner keeps its text whole, a full copy scrubs to near-empty") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(47)
    def words(n: Int) = Seq.fill(n)("r" + rng.nextInt(9000)).mkString(" ")
    val runLen = 20; val preW = 25; val preL = 8
    val run = words(runLen)
    val winnerText = words(preW) + " " + run + " " + words(10)
    val loserText = words(preL) + " " + run
    val cleanText = words(30)
    val docs = Seq((1L, "sA", winnerText), (2L, "sA", loserText),
        (3L, "sA", cleanText), (4L, "sA", winnerText))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val sc = Winnow.winnowScrubbedDocs(docs, minShared = 1L).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // winner (longest, smallest id among the tied full copies) and
    // the clean doc keep their text whole — absent from the frame
    assert(sc.keySet == Set(2L, 4L), sc.keySet.toString)
    // doc 2: the removed tokens are ONE contiguous interval nested
    // inside the planted run's token coordinates [preL, preL+runLen)
    val orig2 = loserText.split(" ", -1).toIndexedSeq
    val (n2, k2, text2) = sc(2L)
    val kept2 = if (text2.isEmpty) IndexedSeq.empty[String]
      else text2.split(" ", -1).toIndexedSeq
    assert(n2 == orig2.size && k2 == kept2.size && k2 < n2)
    val a = kept2.zip(orig2).takeWhile { case (x, y) => x == y }.size
    val removed = n2 - k2
    assert(kept2 == orig2.take(a) ++ orig2.drop(a + removed.toInt),
      s"cut is not one contiguous interval: kept=$kept2 orig=$orig2")
    assert(a >= preL && a + removed - 1 <= preL + runLen - 1,
      s"cut [$a, ${a + removed - 1}] outside planted run")
    // doc 4 (full copy): scrubs to near-empty — at most w-1 leading
    // and trailing tokens outside the first/last selected fingerprint
    assert(sc(4L)._2 <= 2L * (Winnow.WinnowW - 1), sc(4L).toString)
    // digest: counts + the '#ws' corpus hash split across untouched
    // originals and rebuilt texts
    def wsHash(t: String): Long = Seq(Tuple1(t)).toDF("text")
      .select(graft.pipeline.TextFunctions.hash64(col("text"), "ws")
        % 1000000000L).head.getLong(0)
    val dig = Winnow.winnowScrubSpans(docs, minShared = 1L).collect()
    assert(dig.length == 1)
    val r = dig(0)
    assert(r.getAs[Long]("n_docs") == 4L &&
      r.getAs[Long]("n_scrubbed") == 2L)
    assert(r.getAs[Long]("n_tokens_removed") +
      r.getAs[Long]("n_tokens_kept") == n2 + sc(4L)._1)
    assert(r.getAs[Long]("scrubbed_hash_sum") ==
      wsHash(winnerText) + wsHash(cleanText) + wsHash(text2) +
        wsHash(sc(4L)._3))
  }

  test("dirTag: same basename under different parents never aliases; tag is stable and sha-derived") {
    val a = SparkEntry.dirTag("/tmp/graft_tag_a/corpus")
    val b = SparkEntry.dirTag("/tmp/graft_tag_b/corpus")
    assert(a != b)
    assert(a == SparkEntry.dirTag("/tmp/graft_tag_a/corpus"))
    assert(a.matches("corpus_[0-9a-f]{12}"), a)
  }
}
