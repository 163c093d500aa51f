package graft.pipeline

/** DuckDB oracle spellings for the pipeline queries (q16–q28).
  *
  * Each mirrors its Spark operator EXACTLY — same hash construction
  * (sha256-prefix 60-bit), same fold order, same rounding — so result
  * hashes match bit-for-bit. The portable-hash identity
  *   Spark  cast(conv(substr(sha2(x,256),1,15),16,10) AS BIGINT)
  *   DuckDB ('0x'||substr(sha256(x),1,15))::BIGINT
  * holds because both sides take the first 15 hex digits (60 bits) of the
  * same SHA-256 and parse them base-16 into a non-negative BIGINT; it is
  * pinned bit-for-bit in GraftExtensionsSpec ("portable hash spelling")
  * and exercised end-to-end by every hash-gated q16–q28 oracle run.
  */
object PipelineOracles {

  private def h64(expr: String, seed: String): String =
    s"('0x'||substr(sha256($expr||'#$seed'),1,15))::BIGINT"

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Distinct 3-token shingle CTEs over documents, plus the sha256 base
    * hashes the affine minhash family permutes (TextFunctions.minhash). */
  private val shingleCtes =
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
       |  i -> array_to_string(t[i:i+2], ' '))) AS s FROM tk),
       |bh AS (SELECT doc_id, s, list_transform(s, x -> ${h64("x", "mh")}) AS hs FROM sh)""".stripMargin

  private val P = TextFunctions.MinhashP
  private def mhExpr(i: Int): String =
    s"list_min(list_transform(hs, h -> ((h % $P) * ${TextFunctions.minhashA(i)} + ${TextFunctions.minhashB(i)}) % $P))"

  val exactDedup: String =
    """SELECT source, count(*) AS n_docs, count(DISTINCT sha256(text)) AS n_unique
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val dedupKeepFirst: String =
    """SELECT count(*) AS kept FROM
      |(SELECT min(doc_id) FROM documents GROUP BY sha256(text)) t""".stripMargin

  val minhashSignatures: String = {
    val mh = (0 until 4).map(i => s"${mhExpr(i)} AS mh$i").mkString(", ")
    s"WITH $shingleCtes SELECT doc_id, $mh FROM bh ORDER BY doc_id"
  }

  /** Shared CTE chain for the banded-LSH family: 8 minhashes, 4 bands ×
    * 2 rows, true-Jaccard verification; `near_pairs` is the thresholded
    * pair set the clustering oracles build on. */
  private def lshCtes(threshold: Double): String = {
    val mhList = (0 until 8).map(mhExpr).mkString(", ")
    val bandKey =
      h64("mh[band*2+1]::VARCHAR || '_' || mh[band*2+2]::VARCHAR", "band'||band||'")
    s"""$shingleCtes,
       |m AS (SELECT doc_id, s, [$mhList] AS mh FROM bh),
       |bands AS MATERIALIZED (SELECT doc_id, s, band, $bandKey AS bkey
       |  FROM m, (SELECT unnest(range(0, 4)) AS band) b),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |verified AS MATERIALIZED (SELECT doc_a, doc_b,
       |  round(len(list_intersect(sa.s, sb.s))::DOUBLE /
       |        len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
       |  FROM cand JOIN sh sa ON sa.doc_id = cand.doc_a
       |            JOIN sh sb ON sb.doc_id = cand.doc_b),
       |near_pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM verified
       |  WHERE jaccard >= $threshold)""".stripMargin
  }

  /** Banded LSH near-dup pairs with Jaccard verification. */
  def lshNearDups(threshold: Double): String =
    s"""WITH ${lshCtes(threshold)}
       |SELECT * FROM verified WHERE jaccard >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Connected components of the near-dup graph — min reachable doc_id
    * per node via a recursive transitive closure (the oracle's
    * fixed-point mirrors the Spark side's min-label propagation). */
  private def clusterCtes(threshold: Double): String =
    s"""${lshCtes(threshold)},
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM near_pairs
       |  UNION SELECT doc_b, doc_a FROM near_pairs),
       |reach(node, lab) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
       |clusters AS MATERIALIZED (SELECT node, min(lab) AS cluster FROM reach
       |  GROUP BY node)""".stripMargin

  def dedupClusters(threshold: Double): String =
    s"""WITH RECURSIVE ${clusterCtes(threshold)}
       |SELECT node AS doc_id, cluster FROM clusters ORDER BY doc_id""".stripMargin

  /** Cluster-size histogram over the same recursive-CC clusters. */
  def clusterSizeHistogram(threshold: Double): String =
    s"""WITH RECURSIVE ${clusterCtes(threshold)},
       |sz AS (SELECT cluster, count(*) AS k FROM clusters GROUP BY cluster)
       |SELECT k, count(*) AS n_clusters FROM sz
       |GROUP BY k ORDER BY k""".stripMargin

  def clusterDedupKept(threshold: Double): String =
    s"""WITH RECURSIVE ${clusterCtes(threshold)},
       |removed AS (SELECT node FROM clusters WHERE node <> cluster)
       |SELECT source, count(*) AS n_kept FROM documents
       |WHERE doc_id NOT IN (SELECT node FROM removed)
       |GROUP BY source ORDER BY source""".stripMargin

  /** Keep-BEST cluster dedup: representative = longest doc (n_chars),
    * tie → smallest id — same recursive clusters, ranked. */
  def clusterDedupKeepBest(threshold: Double): String =
    s"""WITH RECURSIVE ${clusterCtes(threshold)},
       |r AS (SELECT c.node, row_number() OVER (PARTITION BY c.cluster
       |  ORDER BY d.n_chars DESC, c.node) AS rn
       |  FROM clusters c JOIN documents d ON c.node = d.doc_id),
       |removed AS (SELECT node FROM r WHERE rn <> 1)
       |SELECT source, count(*) AS n_kept FROM documents
       |WHERE doc_id NOT IN (SELECT node FROM removed)
       |GROUP BY source ORDER BY source""".stripMargin

  val simhash: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |h AS (SELECT doc_id, list_transform(t, tok -> ${h64("tok", "sim")}) AS th FROM tk)
       |SELECT doc_id, list_aggregate(list_transform(range(0, 64), b ->
       |  CASE WHEN list_reduce(list_transform(th, x ->
       |    CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END), (p, q) -> p + q) > 0
       |  THEN '1' ELSE '0' END), 'string_agg', '') AS simhash
       |FROM h ORDER BY doc_id""".stripMargin

  /** Pigeonhole simhash near-dups: (maxHamming+1) chunks, verify exact
    * hamming on chunk-sharing candidates. Candidate generation MIRRORS
    * the implementation's `boundedPairs` bucket cap (star fallback
    * past `maxBucket` members): at gate corpora no chunk bucket ever
    * reaches the cap, so this is identical to the uncapped spelling —
    * but at sf1 the hot chunk buckets cross it, and an uncapped oracle
    * then grades the DOCUMENTED bounded-work approximation as a
    * mismatch (1.1% of pairs at sf1) instead of grading the
    * implementation against its contract. The cap rule is part of the
    * operator's spec; the oracle spells it. */
  def simhashNearDups(maxHamming: Int, maxBucket: Int = Dedup.DefaultMaxBucket): String = {
    val chunks = maxHamming + 1
    val chunkBits = 64 / chunks
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |h AS (SELECT doc_id, list_transform(t, tok -> ${h64("tok", "sim")}) AS th FROM tk),
       |s AS MATERIALIZED (SELECT doc_id, list_aggregate(list_transform(range(0, 64), b ->
       |  CASE WHEN list_reduce(list_transform(th, x ->
       |    CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END), (p, q) -> p + q) > 0
       |  THEN '1' ELSE '0' END), 'string_agg', '') AS sh FROM h),
       |chunks AS (SELECT doc_id, c, substr(sh, c*$chunkBits + 1, $chunkBits) AS chunk
       |  FROM s, (SELECT unnest(range(0, $chunks)) AS c) x),
       |buckets AS (SELECT c, chunk, list_sort(list(doc_id)) AS ids
       |  FROM chunks GROUP BY c, chunk HAVING count(*) > 1),
       |cand AS (SELECT DISTINCT p.doc_a, p.doc_b FROM buckets,
       |  unnest(CASE WHEN len(ids) <= $maxBucket THEN
       |      flatten(list_transform(range(1, len(ids)),
       |        i -> list_transform(ids[i+1:], y -> {'doc_a': ids[i], 'doc_b': y})))
       |    ELSE list_transform(ids[2:], y -> {'doc_a': ids[1], 'doc_b': y})
       |    END) AS u(p)),
       |v AS (SELECT doc_a, doc_b,
       |  len(list_filter(range(1, 65), i -> substr(sa.sh, i, 1) <> substr(sb.sh, i, 1))) AS hamming
       |  FROM cand JOIN s sa ON sa.doc_id = cand.doc_a
       |            JOIN s sb ON sb.doc_id = cand.doc_b)
       |SELECT * FROM v WHERE hamming <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Incremental delta-vs-base dedup: delta = hash64(doc_id, 'inc') %
    * deltaMod == 0 (hash split — doc_id ranges encode the source),
    * exact tier by content hash, near tier by asymmetric banded LSH
    * (delta bands ⋈ base bands) with raw-jaccard verification — the
    * exact mirror of Dedup.incrementalDedupSummary. */
  def incrementalDedup(deltaMod: Long, threshold: Double): String = {
    val mhList = (0 until 8).map(mhExpr).mkString(", ")
    val bandKey =
      h64("mh[band*2+1]::VARCHAR || '_' || mh[band*2+2]::VARCHAR", "band'||band||'")
    def isDelta(c: String) = s"${h64(s"$c::VARCHAR", "inc")} % $deltaMod = 0"
    def notDelta(c: String) = s"${h64(s"$c::VARCHAR", "inc")} % $deltaMod <> 0"
    s"""WITH $shingleCtes,
       |m AS (SELECT doc_id, s, [$mhList] AS mh FROM bh),
       |bands AS MATERIALIZED (SELECT doc_id, band, $bandKey AS bkey
       |  FROM m, (SELECT unnest(range(0, 4)) AS band) b),
       |dd AS MATERIALIZED (SELECT doc_id FROM documents WHERE ${isDelta("doc_id")}),
       |cand AS (SELECT DISTINCT d.doc_id AS delta_id, bb.doc_id AS base_id
       |  FROM bands d JOIN bands bb ON d.band = bb.band AND d.bkey = bb.bkey
       |  WHERE d.doc_id IN (SELECT doc_id FROM dd)
       |    AND bb.doc_id NOT IN (SELECT doc_id FROM dd)),
       |near AS (SELECT DISTINCT delta_id FROM cand
       |  JOIN sh sa ON sa.doc_id = cand.delta_id
       |  JOIN sh sb ON sb.doc_id = cand.base_id
       |  WHERE len(list_intersect(sa.s, sb.s))::DOUBLE /
       |        len(list_distinct(list_concat(sa.s, sb.s))) >= $threshold),
       |ex AS (SELECT DISTINCT doc_id FROM documents
       |  WHERE ${isDelta("doc_id")} AND sha256(text) IN
       |    (SELECT sha256(text) FROM documents WHERE ${notDelta("doc_id")}))
       |SELECT d.source, count(*) AS n_delta,
       |  sum(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
       |    AS n_exact_dup,
       |  sum(CASE WHEN ex.doc_id IS NULL AND near.delta_id IS NOT NULL
       |    THEN 1 ELSE 0 END)::BIGINT AS n_near_dup,
       |  sum(CASE WHEN ex.doc_id IS NULL AND near.delta_id IS NULL
       |    THEN 1 ELSE 0 END)::BIGINT AS n_admitted
       |FROM documents d
       |LEFT JOIN ex ON ex.doc_id = d.doc_id
       |LEFT JOIN near ON near.delta_id = d.doc_id
       |WHERE ${isDelta("d.doc_id")}
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  /** MinHash-estimate audit: verified pairs + the signature-agreement
    * estimate (fraction of the 8 minhashes agreeing) vs true jaccard. */
  def minhashEstimateAudit(threshold: Double): String =
    s"""WITH ${lshCtes(threshold)},
       |m2 AS MATERIALIZED (SELECT doc_id, mh FROM m)
       |SELECT v.doc_a, v.doc_b, v.jaccard,
       |  round(len(list_filter(range(1, 9), i -> ma.mh[i] = mb.mh[i]))::DOUBLE / 8, 6)
       |    AS mh_est,
       |  round(abs(v.jaccard -
       |    len(list_filter(range(1, 9), i -> ma.mh[i] = mb.mh[i]))::DOUBLE / 8), 6)
       |    AS abs_err
       |FROM verified v JOIN m2 ma ON ma.doc_id = v.doc_a
       |                JOIN m2 mb ON mb.doc_id = v.doc_b
       |WHERE v.jaccard >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  def ngramJaccard(maxId: Long, threshold: Double): String =
    s"""WITH g AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(
       |  range(1, length(text)-1), i -> substr(text, i, 3))) AS ng
       |  FROM documents WHERE doc_id < $maxId)
       |SELECT * FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    round(len(list_intersect(a.ng, b.ng))::DOUBLE /
       |          len(list_distinct(list_concat(a.ng, b.ng))), 6) AS jaccard
       |  FROM g a JOIN g b ON a.doc_id < b.doc_id) p
       |WHERE jaccard >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** Sequential-order cosine, mirroring TextFunctions.cosine. */
  private def cosineExpr(a: String, b: String): String =
    s"""(list_reduce(list_transform(range(1, len($a)+1),
       |   i -> ($a[i]::DOUBLE) * ($b[i]::DOUBLE)), (x, y) -> x + y)
       | / (sqrt(list_reduce(list_transform($a, v -> v::DOUBLE * v::DOUBLE), (x, y) -> x + y))
       |  * sqrt(list_reduce(list_transform($b, v -> v::DOUBLE * v::DOUBLE), (x, y) -> x + y))))""".stripMargin

  def cosineTopK(queryId: Long, k: Int): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryId)
       |SELECT vec_id, label, round(${cosineExpr("embedding", "qe")}, 6) AS cos
       |FROM embeddings, q WHERE vec_id <> $queryId
       |ORDER BY cos DESC, vec_id LIMIT $k""".stripMargin

  private def signBucket(col: String, nBits: Int): String =
    s"""list_aggregate(list_transform(range(1, ${nBits + 1}),
       |  i -> CASE WHEN $col[i] >= 0 THEN '1' ELSE '0' END), 'string_agg', '')""".stripMargin

  /** Integer-exact mirror of Similarity.oracleSizedNBits as a `params`
    * CTE: nb = smallest b ≥ 1 with 2^b ≥ ceil(count/target), computed
    * with integer shifts (never floating log2 — libm vs JVM could
    * disagree by one ulp at exact powers of two and flip the width).
    * Both engines derive the width from the SAME corpus count, so the
    * bucket definitions stay in lockstep at any scale. */
  private[graft] def adaptiveNbCte(target: Long): String =
    s"""params AS (
       |  SELECT greatest(1, coalesce((SELECT max(t.b) + 1 FROM range(0, 41) t(b)
       |    WHERE (1::BIGINT << CAST(t.b AS INT)) <
       |      (SELECT (count(*) + ${target - 1}) // $target FROM embeddings)), 0)) AS nb)""".stripMargin

  /** signBucket over the adaptive width from the `params` CTE. */
  private[graft] def signBucketAdaptive(col: String): String =
    s"""list_aggregate(list_transform(range(1, (SELECT nb FROM params) + 1),
       |  i -> CASE WHEN $col[i] >= 0 THEN '1' ELSE '0' END), 'string_agg', '')""".stripMargin

  def bucketTopK(queryId: Long, k: Int, nBits: Int): String =
    s"""WITH b AS (SELECT vec_id, label, embedding,
       |  ${signBucket("embedding", nBits)} AS bucket FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = $queryId)
       |SELECT vec_id, label, round(${cosineExpr("embedding", "qe")}, 6) AS cos
       |FROM b, q WHERE vec_id <> $queryId AND bucket = qb
       |ORDER BY cos DESC, vec_id LIMIT $k""".stripMargin

  def cosineNearDups(threshold: Double, nBits: Int): String =
    s"""WITH b AS (SELECT vec_id, embedding,
       |  ${signBucket("embedding", nBits)} AS bucket FROM embeddings)
       |SELECT * FROM (
       |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       |    round(${cosineExpr("a.embedding", "b2.embedding")}, 6) AS cos
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id) p
       |WHERE cos >= $threshold ORDER BY vec_a, vec_b""".stripMargin

  /** Capped candidate-pair CTEs over the adaptive sign buckets —
    * MIRRORS the implementation's `boundedPairs` star fallback past
    * `maxBucket` members (smallest vec_id is the representative, same
    * as the array_sort'd bucket collect), exactly like the
    * `simhashNearDups` oracle does for the text tier. Sign-bucket
    * population is distribution-dependent (a sign bit that never
    * varies subdivides nothing), so a clustered corpus can overfill a
    * bucket at ANY adaptive width; an uncapped oracle would then grade
    * the documented bounded-work contract as a mismatch. Emits
    * `bucket_pairs(vec_a, vec_b, cos)` — already cosine-verified. */
  private def cappedCosinePairCtes(threshold: Double,
                                   maxBucket: Int): String =
    s"""buckets AS (SELECT bucket, list_sort(list(vec_id)) AS ids
       |  FROM b GROUP BY bucket HAVING count(*) > 1),
       |cand AS (SELECT p.vec_a, p.vec_b FROM buckets,
       |  unnest(CASE WHEN len(ids) <= $maxBucket THEN
       |      flatten(list_transform(range(1, len(ids)),
       |        i -> list_transform(ids[i+1:], y -> {'vec_a': ids[i], 'vec_b': y})))
       |    ELSE list_transform(ids[2:], y -> {'vec_a': ids[1], 'vec_b': y})
       |    END) AS u(p)),
       |bucket_pairs AS (SELECT cand.vec_a, cand.vec_b,
       |  round(${cosineExpr("a.embedding", "b2.embedding")}, 6) AS cos
       |  FROM cand JOIN b a ON a.vec_id = cand.vec_a
       |            JOIN b b2 ON b2.vec_id = cand.vec_b
       |  WHERE round(${cosineExpr("a.embedding", "b2.embedding")}, 6)
       |    >= $threshold)""".stripMargin

  /** Corpus-sized twin of cosineNearDups — mirrors
    * Similarity.cosineNearDupPairsAuto at any scale, INCLUDING the
    * `maxBucket` star-fallback cap (part of the operator's spec). */
  def cosineNearDupsAuto(threshold: Double, target: Long,
                         maxBucket: Int = Dedup.DefaultMaxBucket): String =
    s"""WITH ${adaptiveNbCte(target)},
       |b AS (SELECT vec_id, embedding,
       |  ${signBucketAdaptive("embedding")} AS bucket FROM embeddings),
       |${cappedCosinePairCtes(threshold, maxBucket)}
       |SELECT vec_a, vec_b, cos FROM bucket_pairs
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Embedding cluster dedup: recursive min-label reachability over the
    * verified cosine near-dup pairs (same CTE shape as the text tier's
    * clusterCtes), keep the smallest vec_id per component, count
    * survivors per class label. */
  /** Corpus-sized twin of embeddingClusterKept — the q58 production
    * spelling; same adaptive width AND `maxBucket` cap as
    * cosineNearDupsAuto, so both Auto oracles grade the bounded-work
    * contract the implementation ships. */
  def embeddingClusterKeptAuto(threshold: Double, target: Long,
                               maxBucket: Int = Dedup.DefaultMaxBucket): String =
    s"""WITH RECURSIVE ${adaptiveNbCte(target)},
       |b AS (SELECT vec_id, embedding,
       |  ${signBucketAdaptive("embedding")} AS bucket FROM embeddings),
       |${cappedCosinePairCtes(threshold, maxBucket)},
       |near_pairs AS MATERIALIZED (SELECT vec_a, vec_b FROM bucket_pairs),
       |edges AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM near_pairs
       |  UNION SELECT vec_b, vec_a FROM near_pairs),
       |reach(node, lab) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
       |clusters AS MATERIALIZED (SELECT node, min(lab) AS cluster FROM reach GROUP BY node),
       |removed AS (SELECT node FROM clusters WHERE node <> cluster)
       |SELECT label, count(*) AS n_kept FROM embeddings
       |WHERE vec_id NOT IN (SELECT node FROM removed)
       |GROUP BY label ORDER BY label""".stripMargin

  /** q192/q193 oracle: semantic decontamination recompute — the SAME
    * capped adaptive-width pair CTEs as the q29/q58 oracles, eval
    * classification by the '#sev' hash, contaminated = train side of a
    * mixed pair, '#sd' kept-id hash certification. */
  def semanticDeconSql(threshold: Double, evalMod: Long, target: Long,
                       maxBucket: Int = Dedup.DefaultMaxBucket): String =
    s"""WITH ${adaptiveNbCte(target)},
       |b AS (SELECT vec_id, embedding,
       |  ${signBucketAdaptive("embedding")} AS bucket FROM embeddings),
       |${cappedCosinePairCtes(threshold, maxBucket)},
       |ev AS (SELECT vec_id,
       |  (('0x'||substr(sha256(vec_id::VARCHAR||'#sev'),1,15))::BIGINT
       |    % $evalMod = 0) AS is_eval FROM embeddings),
       |cont AS (SELECT DISTINCT v FROM (
       |  SELECT p.vec_a AS v FROM bucket_pairs p
       |    JOIN ev ea ON p.vec_a = ea.vec_id
       |    JOIN ev eb ON p.vec_b = eb.vec_id
       |  WHERE eb.is_eval AND NOT ea.is_eval
       |  UNION ALL
       |  SELECT p.vec_b FROM bucket_pairs p
       |    JOIN ev ea ON p.vec_a = ea.vec_id
       |    JOIN ev eb ON p.vec_b = eb.vec_id
       |  WHERE ea.is_eval AND NOT eb.is_eval) u),
       |train AS (SELECT e.vec_id, e.label,
       |  ('0x'||substr(sha256(e.vec_id::VARCHAR||'#sd'),1,15))::BIGINT
       |    % 1000000000 AS vh
       |  FROM embeddings e JOIN ev USING (vec_id) WHERE NOT is_eval)
       |SELECT label, count(*)::BIGINT AS n_train,
       |  sum(CASE WHEN c.v IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
       |    AS n_contaminated,
       |  sum(CASE WHEN c.v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  sum(CASE WHEN c.v IS NULL THEN vh ELSE 0 END)::BIGINT
       |    AS kept_hash_sum
       |FROM train LEFT JOIN cont c ON train.vec_id = c.v
       |GROUP BY label ORDER BY label""".stripMargin

  def embeddingClusterKept(threshold: Double, nBits: Int): String =
    s"""WITH RECURSIVE b AS (SELECT vec_id, embedding,
       |  ${signBucket("embedding", nBits)} AS bucket FROM embeddings),
       |near_pairs AS MATERIALIZED (SELECT * FROM (
       |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       |    round(${cosineExpr("a.embedding", "b2.embedding")}, 6) AS cos
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id) p
       |  WHERE cos >= $threshold),
       |edges AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM near_pairs
       |  UNION SELECT vec_b, vec_a FROM near_pairs),
       |reach(node, lab) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
       |clusters AS MATERIALIZED (SELECT node, min(lab) AS cluster FROM reach GROUP BY node),
       |removed AS (SELECT node FROM clusters WHERE node <> cluster)
       |SELECT label, count(*) AS n_kept FROM embeddings
       |WHERE vec_id NOT IN (SELECT node FROM removed)
       |GROUP BY label ORDER BY label""".stripMargin

  /** Sign-bucket ANN recall@k vs brute-force ground truth over the
    * sampled query set (vec_id % queryMod == 0) — mirrors
    * Similarity.bucketRecallAudit: rank on the ROUNDED cosine with
    * vec_id tie-break in both rankings. */
  def bucketRecallAudit(k: Int, nBits: Int, queryMod: Long): String =
    s"""WITH b AS (SELECT vec_id, embedding,
       |  ${signBucket("embedding", nBits)} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb
       |  FROM b WHERE vec_id % $queryMod = 0),
       |scored AS (SELECT qid, vec_id, bucket, qb,
       |  round(${cosineExpr("embedding", "qe")}, 6) AS cos
       |  FROM b, q WHERE vec_id <> qid),
       |ex AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored) x WHERE rn <= $k),
       |bk AS (SELECT qid AS bqid, vec_id AS bvec FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored WHERE bucket = qb) y WHERE rn <= $k)
       |SELECT qid,
       |  sum(CASE WHEN bvec IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       |  round(sum(CASE WHEN bvec IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*), 6) AS recall
       |FROM ex LEFT JOIN bk ON qid = bqid AND vec_id = bvec
       |GROUP BY qid ORDER BY qid""".stripMargin

  /** Mirrors Similarity.int8RecallAuditSized: the q63 quantization
    * rule (round half-away-from-zero onto the int8 lattice, zero
    * vector quantizes to itself), sequential-order double folds for
    * every dot product, both rankings on (rounded score desc, vec_id),
    * and the query mod derived from the SAME corpus count with integer
    * ceiling — so the recall values themselves hash-match. */
  def int8RecallAudit(k: Int, targetQueries: Long): String =
    s"""WITH qm AS (SELECT greatest(1,
       |    (count(*) + ${targetQueries - 1}) // $targetQueries) AS m
       |  FROM embeddings),
       |b AS (SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS ed
       |  FROM embeddings),
       |mm AS (SELECT vec_id, ed,
       |  list_max(list_transform(ed, v -> abs(v))) AS max_abs,
       |  sqrt(list_reduce(list_transform(ed, v -> v * v), (x, y) -> x + y)) AS norm
       |  FROM b),
       |r AS (SELECT vec_id, ed, norm, CASE WHEN max_abs = 0 THEN ed
       |    ELSE list_transform(ed,
       |      v -> round(v * (127.0/max_abs)) / (127.0/max_abs)) END AS rec
       |  FROM mm),
       |r2 AS (SELECT vec_id, ed, norm, rec,
       |  sqrt(list_reduce(list_transform(rec, v -> v * v), (x, y) -> x + y)) AS rec_norm
       |  FROM r),
       |q AS (SELECT vec_id AS qid, ed AS q_ed, norm AS q_norm FROM r2
       |  WHERE vec_id % (SELECT m FROM qm) = 0),
       |scored AS (SELECT qid, vec_id,
       |  round(list_reduce(list_transform(range(1, len(ed)+1),
       |    i -> ed[i] * q_ed[i]), (x, y) -> x + y) / (norm * q_norm), 6) AS cos,
       |  round(list_reduce(list_transform(range(1, len(rec)+1),
       |    i -> rec[i] * q_ed[i]), (x, y) -> x + y) / (rec_norm * q_norm), 6) AS qcos
       |  FROM r2, q WHERE vec_id <> qid),
       |ex AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored) x WHERE rn <= $k),
       |qt AS (SELECT qid AS bqid, vec_id AS bvec FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, vec_id) AS rn
       |  FROM scored) y WHERE rn <= $k)
       |SELECT qid,
       |  sum(CASE WHEN bvec IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       |  round(sum(CASE WHEN bvec IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*), 6) AS recall
       |FROM ex LEFT JOIN qt ON qid = bqid AND vec_id = bvec
       |GROUP BY qid ORDER BY qid""".stripMargin

  def bucketKnnJoin(k: Int, nBits: Int): String =
    s"""WITH b AS (SELECT vec_id, embedding,
       |  ${signBucket("embedding", nBits)} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS vec_id, b2.vec_id AS neighbor,
       |    round(${cosineExpr("a.embedding", "b2.embedding")}, 6) AS cos
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
       |r AS (SELECT vec_id, neighbor, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor) AS rank
       |  FROM p)
       |SELECT * FROM r WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin

  /** Corpus-sized twin of bucketKnnJoin — mirrors
    * Similarity.bucketKnnJoinAuto at any scale. */
  def bucketKnnJoinAuto(k: Int, target: Long): String =
    s"""WITH ${adaptiveNbCte(target)},
       |b AS (SELECT vec_id, embedding,
       |  ${signBucketAdaptive("embedding")} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS vec_id, b2.vec_id AS neighbor,
       |    round(${cosineExpr("a.embedding", "b2.embedding")}, 6) AS cos
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
       |r AS (SELECT vec_id, neighbor, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor) AS rank
       |  FROM p)
       |SELECT * FROM r WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin

  /** Corpus-sized twin of knnLabelAudit — mirrors
    * Similarity.knnLabelAuditAuto at any scale. */
  def knnLabelAuditAuto(k: Int, target: Long): String =
    s"""WITH ${adaptiveNbCte(target)},
       |b AS (SELECT vec_id, label, embedding,
       |  ${signBucketAdaptive("embedding")} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS vec_id, b2.vec_id AS neighbor,
       |    round(${cosineExpr("a.embedding", "b2.embedding")}, 6) AS cos
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
       |r AS (SELECT vec_id, neighbor,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor)
       |      AS rank FROM p),
       |knn AS (SELECT r.vec_id, e.label AS n_label FROM r
       |  JOIN embeddings e ON e.vec_id = r.neighbor WHERE rank <= $k),
       |votes AS (SELECT vec_id, n_label, count(*) AS v FROM knn
       |  GROUP BY vec_id, n_label),
       |top AS (SELECT vec_id, n_label AS predicted FROM (SELECT vec_id, n_label,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY v DESC, n_label) AS rn
       |  FROM votes) t WHERE rn = 1)
       |SELECT e.label, count(*) AS n,
       |  sum(CASE WHEN top.predicted = e.label THEN 1 ELSE 0 END)::BIGINT
       |    AS n_correct,
       |  round(sum(CASE WHEN top.predicted = e.label THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*), 6) AS accuracy
       |FROM top JOIN embeddings e ON e.vec_id = top.vec_id
       |GROUP BY e.label ORDER BY e.label""".stripMargin

  /** kNN majority-label audit — mirrors Similarity.knnLabelAudit:
    * bucketed kNN, majority vote with lexicographic tie-break,
    * per-label accuracy. */
  def knnLabelAudit(k: Int, nBits: Int): String =
    s"""WITH b AS (SELECT vec_id, label, embedding,
       |  ${signBucket("embedding", nBits)} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS vec_id, b2.vec_id AS neighbor,
       |    round(${cosineExpr("a.embedding", "b2.embedding")}, 6) AS cos
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
       |r AS (SELECT vec_id, neighbor,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor)
       |      AS rank FROM p),
       |knn AS (SELECT r.vec_id, e.label AS n_label FROM r
       |  JOIN embeddings e ON e.vec_id = r.neighbor WHERE rank <= $k),
       |votes AS (SELECT vec_id, n_label, count(*) AS v FROM knn
       |  GROUP BY vec_id, n_label),
       |top AS (SELECT vec_id, n_label AS predicted FROM (SELECT vec_id, n_label,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY v DESC, n_label) AS rn
       |  FROM votes) t WHERE rn = 1)
       |SELECT e.label, count(*) AS n,
       |  sum(CASE WHEN top.predicted = e.label THEN 1 ELSE 0 END)::BIGINT
       |    AS n_correct,
       |  round(sum(CASE WHEN top.predicted = e.label THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*), 6) AS accuracy
       |FROM top JOIN embeddings e ON e.vec_id = top.vec_id
       |GROUP BY e.label ORDER BY e.label""".stripMargin

  private val hitsCtes: String = {
    val cols = TextStats.StopwordLists.map { case (l, words) =>
      s"len(list_filter(t, x -> list_contains(${sqlList(words)}, x))) AS hits_$l"
    }.mkString(", ")
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |h AS (SELECT doc_id, $cols FROM tk)""".stripMargin
  }

  val langIdSummary: String = {
    val langs = TextStats.StopwordLists.map(_._1)
    val best = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l =>
      s"WHEN hits_$l = g AND g > 0 THEN '$l'").mkString(" ")
    s"""WITH $hitsCtes,
       |d AS (SELECT doc_id, CASE $cases ELSE 'und' END AS detected
       |  FROM (SELECT *, $best AS g FROM h) x)
       |SELECT detected, count(*) AS n FROM d GROUP BY detected ORDER BY detected""".stripMargin
  }

  def qualityScores(maxId: Long): String = {
    val en = sqlList(TextStats.EnStopwords)
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk
       |  FROM documents WHERE doc_id < $maxId),
       |m AS (SELECT doc_id,
       |  len(tk) AS n_tokens,
       |  round(length(text)::DOUBLE / len(tk), 6) AS mean_tok_len,
       |  round(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))::DOUBLE
       |        / length(text), 6) AS punct_ratio,
       |  round(len(list_filter(tk, x -> list_contains($en, x)))::DOUBLE
       |        / len(tk), 6) AS stopword_ratio
       |  FROM t)
       |SELECT *, round(least(n_tokens::DOUBLE / 50.0, 1.0) * (1.0 - punct_ratio), 6)
       |  AS quality FROM m ORDER BY doc_id""".stripMargin
  }

  val tokenCounts: String =
    """SELECT source,
      |  sum(len(string_split(text, ' ')))::BIGINT AS ws_tokens,
      |  sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')))::BIGINT
      |    AS bpe_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  def fingerprints(maxId: Long): String =
    s"""SELECT doc_id, list_reduce(list_transform(string_split(text, ''),
       |  c -> ascii(c)::BIGINT), (a, b) -> (a * 31 + b) % 1000000007) AS fp
       |FROM documents WHERE doc_id < $maxId ORDER BY doc_id""".stripMargin

  val multimodalMeta: String =
    """SELECT source, sum(octet_length(text::BLOB))::BIGINT AS total_bytes,
      |  count(DISTINCT sha256(text)) AS distinct_payloads
      |FROM documents GROUP BY source ORDER BY source""".stripMargin
}
