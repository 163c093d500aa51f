package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern scanning and redaction — the PII-scrub stage every
  * training-data pipeline runs before release: count occurrences of
  * configured regex classes per source (the audit that sizes the
  * problem), then rewrite the text with the matches redacted.
  *
  * Patterns are CONFIG, not hardcoded: the preset list below covers
  * the classic PII classes, but a deployment adds its own (internal
  * hostnames, ticket ids, customer names). Pattern syntax must stay
  * inside the RE2-compatible subset (character classes, bounded
  * repetition, alternation, `\b`, `\w`, `\d`) so the same pattern
  * means the same thing in Spark (Java regex), the DuckDB oracle, and
  * any RE2-based scanner a deployment might pair this with — no
  * backreferences, no lookaround.
  *
  * Scale shape: ONE corpus scan for all patterns — per-row match
  * counts are computed into an array of (pattern, count) structs and
  * exploded, so adding a pattern adds per-row CPU, never another
  * scan; the only shuffle carries (source, pattern, two longs).
  * Redaction is scan-local (`regexp_replace` chain, codegen'd), no
  * shuffle at all. */
object TextScrub {

  /** Classic PII presets (RE2-compatible). Unit-tested against
    * planted strings in PipelineSpec; the corpus gate (q81) uses
    * corpus-matching patterns instead because the synthetic corpus
    * deliberately contains no PII. */
  val PiiPresets: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\+?\\d[\\d -]{7,}\\d")

  /** Unicode NFC normalization report (q102): the cleaning primitive
    * that must run BEFORE any hash/fingerprint stage — composed é and
    * decomposed e+◌́ are different bytes, so un-normalized corpora
    * under-dedup and double-count vocabulary. The kernel is the
    * codegen'd `functions.NfcNormalize` (java.text.Normalizer);
    * DuckDB's nfc_normalize applies the same canonical composition,
    * which makes the gate a HARD cross-engine content check: every
    * doc gets a planted suffix — decomposed on doc_id % 3 == 0,
    * precomposed otherwise — and the gate hashes the NORMALIZED
    * strings (60-bit portable hash, summed mod 1e9 per source), so a
    * normalizer that missed composition or touched other bytes
    * mismatches. Scan-local; the shuffle carries (source, longs). */
  def nfcNormalizationReport(docs: DataFrame): DataFrame = {
    import TextFunctions.hash64
    val planted = concat(col("text"),
      when(col("doc_id") % 3 === 0, lit(" Cafe\u0301")) // e + U+0301
        .otherwise(lit(" Caf\u00e9")))  // precomposed
    val norm = graft.functions.NfcNormalize.column(planted)
    graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("source"), planted.as("p"), norm.as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n") =!= col("p"), 1L).otherwise(0L)).as("n_changed"),
        sum(hash64(col("n"), "nfc") % 1000000000L).as("norm_hash_sum"))
      .orderBy("source")
  }

  /** Per-(source, pattern) audit: documents hit and total matches.
    * One scan regardless of pattern count. */
  def patternScanSummary(docs: DataFrame,
                         patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "at least one pattern")
    val entries = patterns.map { case (name, re) =>
      struct(lit(name).as("pattern"),
        coalesce(size(regexp_extract_all(col("text"), lit(re), lit(0))),
          lit(0)).as("m"))
    }
    graft.sources.Corpus.fanOutSmallScan(docs)
      .select(col("source"), explode(array(entries: _*)).as("e"))
      .groupBy(col("source"), col("e.pattern").as("pattern"))
      .agg(sum(when(col("e.m") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(col("e.m")).cast("long").as("n_matches"))
      .orderBy("source", "pattern")
  }

  /** Redact every match of every pattern with `replacement` —
    * scan-local, no shuffle; the patterns apply in list order, so an
    * earlier pattern's replacement text is visible to later ones
    * (deliberate: a redacted email can't then leak as a hostname). */
  def scrub(docs: DataFrame, patterns: Seq[(String, String)],
            replacement: String = "[REDACTED]"): DataFrame = {
    val scrubbed = patterns.foldLeft(col("text")) { case (c, (_, re)) =>
      regexp_replace(c, re, replacement)
    }
    docs.withColumn("text", scrubbed)
  }

  /** Gate composition (q93): the PII presets exercised END-TO-END on
    * PLANTED data — the corpus deliberately contains no PII, so the
    * gate derives a planted frame from the documents table in closed
    * form (doc_id % 2 → one email, % 3 → one IPv4, % 5 → one phone;
    * exactly one match per planted class per doc, and the classes are
    * built so none cross-matches another's pattern), audits it with
    * patternScanSummary, scrubs it, and re-audits: per (source,
    * pattern) the oracle recomputes hit counts ARITHMETICALLY from the
    * residue classes — an independent derivation, not the same regex
    * run on another engine — and the post-scrub residual must be 0.
    *
    * Scale shape: two corpus scans (audit + scrubbed re-audit), both
    * scan-local regex work, shuffling only (source, pattern, longs). */
  def piiPresetReport(docs: DataFrame): DataFrame = {
    val planted = docs.select(col("doc_id"), col("source"),
      concat_ws(" ",
        // the local part carries doc_id % 10000, not doc_id: a 9+
        // digit run inside the email would ALSO match the phone
        // preset (\d[\d -]{7,}\d), breaking the one-match-per-class
        // construction for billion-scale ids
        when(col("doc_id") % 2 === 0, concat(lit("contact u"),
          col("doc_id") % 10000, lit("@ex"), col("doc_id") % 10, lit(".com"))),
        when(col("doc_id") % 3 === 0, concat(lit("ip 10.0."),
          col("doc_id") % 256, lit(".7"))),
        when(col("doc_id") % 5 === 0, concat(lit("call +1 555 010 "),
          col("doc_id") % 90 + 10)),
        lit("plain filler line")).as("text"))
    val audit = patternScanSummary(planted, PiiPresets)
    val residual = patternScanSummary(scrub(planted, PiiPresets), PiiPresets)
      .select(col("source"), col("pattern"),
        col("n_matches").as("n_residual"))
    audit.join(residual, Seq("source", "pattern"))
      .orderBy("source", "pattern")
  }

  /** Scrub-then-audit invariant check used by the spec: after a scrub,
    * the same patterns must match nothing. */
  def residualMatches(docs: DataFrame,
                      patterns: Seq[(String, String)]): Long = {
    val counts: Column = patterns.map { case (_, re) =>
      coalesce(size(regexp_extract_all(col("text"), lit(re), lit(0))),
        lit(0)).cast("long")
    }.reduce(_ + _)
    scrub(docs, patterns)
      .agg(sum(counts)).head().getLong(0)
  }
}
