package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the string-edit member of the
  * near-dup tier (LSH q19 is token-set Jaccard; SimHash q20 is
  * feature-hamming; this is CHARACTER-level Levenshtein, the right
  * notion for key-like short strings: titles, URLs, IDs, prefixes).
  *
  * Algorithm: the PassJoin pigeonhole (Li, Deng, Wang, Feng,
  * VLDB 2011) specialized to fixed-length keys. Each doc's key is its
  * prefixLen-char text prefix; the key splits into (d+1) equal
  * segments. If ED(s1, s2) <= d, then at least one of s1's (d+1)
  * segments is untouched by the <= d edit operations, and its image in
  * s2 is the SAME substring shifted by the net indels before it —
  * at most d positions. So blocking is a plain EQUI-join:
  *   index side: (seg_idx, segment text)           — d+1 rows per doc
  *   probe side: (seg_idx, substring, start) for start within
  *               [p_i − d, p_i + d]                — O(d²) rows per doc
  * Candidates dedupe to unordered pairs BEFORE the Levenshtein
  * verify (each pair verifies once, not once per shared segment).
  * LOSSLESS: every true pair shares a blocked key; no all-pairs
  * anywhere.
  *
  * Scale shape (100 TB): emissions are O(d²) per doc — scan-local,
  * codegen'd substring arithmetic; the join shuffles on 8-char
  * segment text (skew: a boilerplate-heavy corpus makes hot segment
  * values — exactly the LSH band-bucket situation, AQE skew-join
  * handles moderate heat, and the winnow tier is the right tool when
  * prefixes ARE boilerplate). The verify is per-candidate (Spark's
  * codegen'd `levenshtein`), never per cross-pair. The gate bounds
  * its audit to doc_id < 2000 on BOTH ends (the q21 bounded-window
  * precedent) purely so the DuckDB oracle can brute-force the
  * quadratic reference at sf10; Catalyst pushes that pair filter
  * through the join into both scans.
  */
object EditJoin {

  val EditMaxDist: Int = 4
  val EditPrefixLen: Int = 40

  /** Unordered doc pairs whose prefixLen-char prefixes are within
    * Levenshtein distance maxDist. Docs shorter than prefixLen are
    * excluded from the fingerprint domain (the corpus floor is 44
    * chars, so none here; a general corpus would route short docs to
    * a padded or full-string variant). */
  def editDistancePairs(docs: DataFrame, maxDist: Int = EditMaxDist,
                        prefixLen: Int = EditPrefixLen): DataFrame = {
    require(maxDist >= 0 && prefixLen >= 1)
    require((maxDist + 1) <= prefixLen, "need at least 1 char per segment")
    val nSeg = maxDist + 1
    val segLen = prefixLen / nSeg // even split; last segment absorbs rest
    val base = graft.sources.Corpus.fanOutSmallScan(docs)
      .where(length(col("text")) >= prefixLen)
      .select(col("doc_id"), substring(col("text"), 1, prefixLen).as("s"))
    // segment boundaries (0-based start, length) — last segment absorbs
    // the remainder so the d+1 segments tile the key exactly
    val segs: Seq[(Int, Int, Int)] = (0 until nSeg).map { i =>
      val start = i * segLen
      val len = if (i == nSeg - 1) prefixLen - start else segLen
      (i, start, len)
    }
    // index side: the doc's own segments (d+1 rows per doc)
    val idx = base.select(col("doc_id").as("doc_a"), col("s").as("s_a"),
      explode(array(segs.map { case (i, st, ln) =>
        struct(lit(i).as("i"), substring(col("s"), st + 1, ln).as("t"))
      }: _*)).as("g"))
      .select(col("doc_a"), col("s_a"), col("g.i"), col("g.t"))
    // probe side: substrings at every start within the ±d window of
    // each segment's home position (O(d²) rows per doc)
    val probeEmits = segs.flatMap { case (i, st, ln) =>
      ((st - maxDist) to (st + maxDist))
        .filter(p => p >= 0 && p + ln <= prefixLen)
        .map(p => (i, p, ln))
    }
    val probe = base.select(col("doc_id").as("doc_b"), col("s").as("s_b"),
      explode(array(probeEmits.map { case (i, p, ln) =>
        struct(lit(i).as("i"), substring(col("s"), p + 1, ln).as("t"))
      }: _*)).as("g"))
      .select(col("doc_b"), col("s_b"), col("g.i"), col("g.t"))
    // equi-join on (segment index, text); unordered-pair dedupe BEFORE
    // the verify so each candidate pays one Levenshtein, not ~d² of them
    // distinct on all four columns (every emission of a pair carries
    // the same strings) — group-by keys may be strings, so this stays
    // a partial+final HashAggregate where first(string) would force a
    // SortAggregate
    val cand = idx.join(probe, Seq("i", "t"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("s_a"), col("s_b"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
