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
    * Spark  conv(substr(sha2(s || '#seed', 256), 1, 15), 16, 10)
    * DuckDB ('0x' || substr(sha256(s || '#seed'), 1, 15))::BIGINT
    * 15 hex digits = 60 bits, always positive, fits a BIGINT. */
  def hash64(c: Column, seed: String): Column =
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

  /** MinHash value for one seeded hash function over a shingle set. */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => hash64(s, seed.toString)))

  /** LSH band key: joint hash of `rowsPerBand` consecutive minhashes.
    * Banding is what keeps near-dup search linear: candidates share a
    * band bucket; nothing else is ever compared (no all-pairs). */
  def bandKey(minhashes: Seq[Column], band: Int, rowsPerBand: Int): Column = {
    val slice = minhashes.slice(band * rowsPerBand, (band + 1) * rowsPerBand)
    hash64(concat_ws("_", slice.map(_.cast("string")): _*), s"band$band")
  }

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

  /** 64-bit SimHash rendered as a 64-char '1'/'0' string (MSB-free,
    * bit b at position b). Token hashes are computed ONCE into an array,
    * then each bit position folds ±1 over them — without the hoist the
    * sha256 would be recomputed 64× per token. */
  def simhashBits(toks: Column): Column = {
    val tokHashes = transform(toks, t => hash64(t, "sim"))
    concat_ws("", transform(sequence(lit(0), lit(63)), b =>
      when(
        aggregate(tokHashes, lit(0),
          // shiftright via call_function: the Scala wrapper only takes a
          // literal Int, but the Catalyst expression accepts a column.
          (acc, h) => acc + when((call_function("shiftright", h, b) % 2) === 1, 1).otherwise(-1))
          > 0, "1").otherwise("0")))
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
