package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared column expressions for the LLM-data-pipeline operators.
  *
  * Everything here is built-in Catalyst expressions (codegen'd higher-
  * order functions) — no UDFs, so the whole pipeline stays inside
  * whole-stage codegen and scales with the scan.
  *
  * Portability contract: every function has an exact DuckDB spelling
  * (used by the oracle SQL in SparkEntry) producing bit-identical
  * results — verified for the 60-bit sha256-prefix hash, the rolling
  * fingerprint, simhash sign-vectors, and char n-grams.
  */
object TextFunctions {

  /** Whitespace tokens (corpus text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic 60-bit hash, identical across Spark and DuckDB:
    * Spark  native Sha256Prefix60 expression (one digest, no hex/decimal
    *        string round-trip) — bit-equal to
    *        conv(substr(sha2(s || '#seed', 256), 1, 15), 16, 10)
    * DuckDB ('0x' || substr(sha256(s || '#seed'), 1, 15))::BIGINT
    * 15 hex digits = 60 bits, always positive, fits a BIGINT. */
  def hash64(c: Column, seed: String): Column =
    graft.functions.Sha256Prefix60.column(c, "#" + seed)

  /** The pure-SQL spelling of hash64 (parity pinned in PipelineSpec). */
  def hash64Sql(c: Column, seed: String): Column =
    conv(substring(sha2(concat(c, lit("#" + seed)), 256), 1, 15), 16, 10)
      .cast(LongType)

  /** Distinct k-token shingles. Guarded so short docs yield an empty set
    * (Spark's sequence(1,0) would otherwise run BACKWARD, unlike DuckDB's
    * range — divergence trap). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Affine MinHash family: ONE sha256 base hash per element, then k
    * cheap affine permutations h_i = (a_i*(h mod P) + b_i) mod P — the
    * standard trick that keeps the crypto-hash cost independent of the
    * number of minhash functions (a naive k-seeded design recomputes
    * sha256 k× per shingle; measured 8-25× slower at sf0.1). */
  val MinhashP: Long = 1000000007L
  def minhashA(i: Int): Long = ((i + 1).toLong * 1000003L) % MinhashP
  def minhashB(i: Int): Long = ((i + 1).toLong * 998244353L) % MinhashP

  /** Base hashes for a string array (materialize this ONCE per row —
    * reference it from a separate select so CollapseProject's
    * expensive-expression guard keeps it from being re-inlined). HOF
    * parity spelling; the hot path uses the native forms below. */
  def baseHashes(arr: Column, seed: String): Column =
    transform(arr, x => hash64(x, seed))

  /** Per-token hashes in one native expression —
    * baseHashes(tokens(text), seed) without the interpreted per-token
    * expression-tree walk (functions/TextHashExprs.scala kernels;
    * parity pinned in PipelineSpec). */
  def tokenHashes(text: Column, seed: String): Column =
    graft.functions.HashTokens.column(text, 0, "#" + seed)

  /** Distinct-k-shingle hashes in one native expression —
    * baseHashes(shingles(tokens(text), k), seed). */
  def shingleHashes(text: Column, k: Int, seed: String): Column =
    graft.functions.HashTokens.column(text, k, "#" + seed)

  /** Distinct k-shingle strings in one native expression —
    * shingles(tokens(text), k). */
  def shinglesOf(text: Column, k: Int): Column =
    graft.functions.ShingleSet.column(text, k)

  /** Positional (non-distinct) k-shingle hashes — entry i covers tokens
    * i..i+k-1, duplicates kept. Winnowing input; empty for short docs. */
  def posShingleHashes(text: Column, k: Int, seed: String): Column =
    graft.functions.ShingleSeqHashes.column(text, k, "#" + seed)

  /** MinHash value i over pre-computed base hashes. */
  def minhash(hs: Column, i: Int): Column =
    array_min(transform(hs,
      h => ((h % MinhashP) * minhashA(i) + minhashB(i)) % MinhashP))

  /** All `count` affine minhashes in one native pass (replaces `count`
    * interpreted transform+array_min trees over the same base array). */
  def minhashesAll(hs: Column, count: Int): Column =
    graft.functions.AffineMinhashes.column(hs, count, MinhashP,
      (0 until count).map(minhashA), (0 until count).map(minhashB))

  /** LSH band key: joint hash of `rowsPerBand` consecutive minhashes.
    * Banding is what keeps near-dup search linear: candidates share a
    * band bucket; nothing else is ever compared (no all-pairs). */
  def bandKey(minhashes: Seq[Column], band: Int, rowsPerBand: Int): Column = {
    val slice = minhashes.slice(band * rowsPerBand, (band + 1) * rowsPerBand)
    hash64(concat_ws("_", slice.map(_.cast("string")): _*), s"band$band")
  }

  /** Within-bucket candidate-pair expansion with a skew guard.
    *
    * For a (pre-sorted, size>1) member array: all (i<j) pairs — UNLESS
    * the bucket exceeds `maxMembers`, in which case every member is
    * paired with the bucket representative (the first, i.e. smallest,
    * member) instead: k-1 star pairs in place of k(k-1)/2. A colliding
    * mega-bucket means near-identical content (that is what the hash
    * families bucket on), so the representative verifies against every
    * member and connectivity — the property dedup clustering needs — is
    * preserved while a 10⁶-member boilerplate cluster emits 10⁶-1 rows,
    * not ~10¹² (the round-3 scale-killer). The fallback is a deliberate
    * recall/cost APPROXIMATION: members of an over-cap bucket that fail
    * verification against the representative lose that bucket's pairs
    * (other bands/chunks can still recover them). The uncapped DuckDB
    * oracles stay exact because gate corpora never exceed the cap
    * (max observed bucket at sf0.1: 153 of 1000). Bounded-work property
    * is pinned in PipelineSpec. */
  def boundedPairs(ms: Column, maxMembers: Int,
                   pair: (Column, Column) => Column): Column = {
    val all = flatten(transform(
      sequence(lit(0), size(ms) - 2),
      i => transform(
        slice(ms, i + lit(2), size(ms) - lit(1) - i),
        y => pair(element_at(ms, i + 1), y))))
    val star = transform(
      slice(ms, lit(2), size(ms) - 1),
      y => pair(element_at(ms, 1), y))
    when(size(ms) <= maxMembers, all).otherwise(star)
  }

  /** Hamming distance of two '1'/'0' bitstrings — native byte-compare
    * (functions.HammingBits); parity with the zip_with spelling pinned
    * in PipelineSpec. */
  def hamming64(a: Column, b: Column): Column =
    graft.functions.HammingBits.column(a, b)

  /** Portable HOF spelling of hamming64 (the parity reference). */
  def hammingSql(a: Column, b: Column): Column =
    aggregate(
      zip_with(split(a, ""), split(b, ""),
        (x, y) => when(x === y, 0).otherwise(1)),
      lit(0), (acc, v) => acc + v)

  /** Jaccard similarity of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Distinct character n-grams of a string. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => substring(text, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** 64-bit SimHash rendered as a 64-char '1'/'0' string (bit b at
    * position b) — native Catalyst expression (one primitive loop,
    * codegen'd; see functions/SimHash64.scala). Bit-equal to the
    * portable HOF spelling below, pinned in PipelineSpec. */
  def simhashFromHashes(tokHashes: Column): Column =
    graft.functions.SimHash64.column(tokHashes)

  /** Portable (pure built-in HOF) spelling of simhashFromHashes — the
    * parity reference for the native expression and the construction the
    * DuckDB oracle mirrors. Interpreted (HOFs never enter codegen), so
    * the hot path uses the native form.
    *
    * Shape matters: the token-hash array is the AGGREGATE'S INPUT, so it
    * is evaluated once per row no matter what CollapseProject inlines.
    * The per-bit formulation (`transform(0..63, b -> aggregate(th, …))`)
    * puts `th` inside a lambda body, where the optimizer's reference
    * count is 1 but runtime evaluation is 64× — measured 32-95s vs ~3s
    * at sf0.1 for identical output. */
  def simhashFromHashesSql(tokHashes: Column): Column = {
    // per token: its ±1 contribution to each of the 64 bit counters
    // (shiftright via call_function: the Scala wrapper only takes a
    // literal Int, but the Catalyst expression accepts a column)
    def bitSigns(h: Column): Column =
      transform(sequence(lit(0), lit(63)), b =>
        when((call_function("shiftright", h, b) % 2) === 1, 1).otherwise(-1))
    val counts = aggregate(tokHashes, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitSigns(h), (a, v) => a + v))
    concat_ws("", transform(counts, c => when(c > 0, "1").otherwise("0")))
  }

  /** Polynomial rolling-hash document fingerprint:
    * fold (acc*31 + ascii(char)) mod 1e9+7 over the characters. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast(LongType)),
      lit(0L),
      (acc, c) => (acc * 31L + c) % 1000000007L)

  /** Cosine similarity of two float vectors, computed in deterministic
    * sequential order (cast to double first) so Spark and DuckDB agree
    * to the last ulp before rounding. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  /** Sign-bucket for embedding LSH: one bit per leading dimension
    * (1 if >= 0), rendered as a bitstring key. A content-derived coarse
    * quantizer — deterministic, portable, and good enough to make ANN
    * search a bucket-local problem. */
  def signBucket(vec: Column, nBits: Int): Column =
    concat_ws("", transform(sequence(lit(0), lit(nBits - 1)), i =>
      when(element_at(vec, i + 1) >= 0, "1").otherwise("0")))
}
