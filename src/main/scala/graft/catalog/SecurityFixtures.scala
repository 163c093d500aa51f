package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic security fixtures modeling the ClickHouse system tables
  * and spec inputs the reference reads (FIXTURES.md §A).
  *
  * Single source of truth: each fixture's seed rows live here once and are
  * rendered BOTH as Spark DataFrames (for `SparkEntry.queries`) and as
  * DuckDB `WITH name(cols) AS (VALUES ...)` CTE fragments (for
  * `SparkEntry.oracleSql`), so the two sides can never drift.
  *
  * Schemas cite the reference lines that fix them:
  *  - sys_users                      → system.users            (clickhouse_users.py:149)
  *  - sys_role_grants                → system.role_grants      (clickhouse_users.py:156)
  *  - sys_settings_profile_elements  → system.settings_profile_elements (clickhouse_users.py:166)
  *  - sys_quotas                     → system.quotas           (clickhouse_users.py:179-180)
  *  - grant_allowlist                → applicable_grants       (clickhouse_grants.py:241-283)
  *  - spec_databases/spec_tables     → databases × tables loop (clickhouse_grants.py:292-293)
  */
object SecurityFixtures {

  val sysUsers: Seq[String] = Seq("default", "db_admin", "app_user", "reader_role_user")

  val sysRoleGrants: Seq[(String, String)] = Seq(
    ("app_user", "reader_role"),
    ("app_user", "writer_role"),
    ("db_admin", "db_admin_role"),
    ("reader_role_user", "reader_role"))

  val sysSettingsProfileElements: Seq[(String, String)] = Seq(
    ("app_user", "custom_profile"))

  val sysQuotas: Seq[(String, Seq[String])] = Seq(
    ("custom_quota", Seq("app_user", "db_admin")),
    ("default_quota", Seq("default")))

  val desiredRoles: Seq[String] = Seq("reader_role", "writer_role", "auditor_role")

  val requestedGrants: Seq[String] = Seq("SELECT", "SHOW", "OPTIMIZE", "dictGet", "bogus_grant")

  val requestedRevokes: Seq[String] = Seq("reader_role", "nonexistent_role")

  /** The 32 applicable grants: 6 system + 2 database + 24 table
    * (clickhouse_grants.py:241-283). The reference compares
    * `grant.upper() not in applicable_grants` (clickhouse_grants.py:287)
    * against the list AS WRITTEN — so the mixed-case `dictGet` entry is
    * unreachable via upper() and only the exact-case `grant != 'dictGet'`
    * carve-out admits it ('DICTGET'/'DictGet' are rejected). Keep dictGet
    * mixed-case here to preserve that. */
  val systemGrants: Seq[String] = graft.engine.GrantTaxonomy.systemLevelGrants
  val databaseGrants: Seq[String] = graft.engine.GrantTaxonomy.databaseLevelGrants
  val tableGrants: Seq[String] = graft.engine.GrantTaxonomy.tableLevelGrants
  private def asCompared(g: String): String =
    if (g == "dictGet") g else g.toUpperCase
  val grantAllowlist: Seq[(String, String)] =
    systemGrants.map(g => (asCompared(g), "system")) ++
      databaseGrants.map(g => (asCompared(g), "database")) ++
      tableGrants.map(g => (asCompared(g), "table"))

  val specDatabases: Seq[(Int, String)] = Seq((0, "main"), (1, "dictionaries"))
  val specTables: Seq[(Int, String)] = Seq((0, "statistics"), (1, "clients"), (2, "*"))

  /** user_name, user_password, err_msg (err shape clickhouse_users.py:324). */
  val userSpecs: Seq[(String, String, String)] = Seq(
    ("app_user", "app_user_secret", "Code: 497. DB::Exception: Not enough privileges."),
    ("db_admin", "db_admin_secret", ""))

  // ---- Spark side --------------------------------------------------------

  def sysUsersDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sysUsers.toDF("name")
  }
  def sysRoleGrantsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sysRoleGrants.toDF("user_name", "granted_role_name")
  }
  def sysSettingsProfileElementsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sysSettingsProfileElements.toDF("user_name", "inherit_profile")
  }
  def sysQuotasDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sysQuotas.toDF("name", "apply_to_list")
  }
  def desiredRolesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    desiredRoles.toDF("role")
  }
  def requestedGrantsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    requestedGrants.toDF("grant_name")
  }
  def requestedRevokesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    requestedRevokes.toDF("role")
  }
  def grantAllowlistDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    grantAllowlist.toDF("grant_upper", "level")
  }
  def specDatabasesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    specDatabases.toDF("db_idx", "database")
  }
  def specTablesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    specTables.toDF("tb_idx", "table_name")
  }
  def userSpecsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    userSpecs.toDF("user_name", "user_password", "err_msg")
  }

  // ---- DuckDB side (oracle CTE fragments) --------------------------------

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"
  private def litArr(xs: Seq[String]): String = xs.map(lit).mkString("[", ", ", "]")

  /** `name(cols) AS (VALUES (...), (...))` — compose into `WITH a, b SELECT …`. */
  val cteSysUsers: String =
    "sys_users(name) AS (VALUES " + sysUsers.map(u => s"(${lit(u)})").mkString(", ") + ")"
  val cteSysRoleGrants: String =
    "sys_role_grants(user_name, granted_role_name) AS (VALUES " +
      sysRoleGrants.map { case (u, r) => s"(${lit(u)}, ${lit(r)})" }.mkString(", ") + ")"
  val cteSysSettingsProfileElements: String =
    "sys_settings_profile_elements(user_name, inherit_profile) AS (VALUES " +
      sysSettingsProfileElements.map { case (u, p) => s"(${lit(u)}, ${lit(p)})" }.mkString(", ") + ")"
  val cteSysQuotas: String =
    "sys_quotas(name, apply_to_list) AS (VALUES " +
      sysQuotas.map { case (n, m) => s"(${lit(n)}, ${litArr(m)})" }.mkString(", ") + ")"
  val cteDesiredRoles: String =
    "desired_roles(role) AS (VALUES " + desiredRoles.map(r => s"(${lit(r)})").mkString(", ") + ")"
  val cteRequestedGrants: String =
    "requested_grants(grant_name) AS (VALUES " +
      requestedGrants.map(g => s"(${lit(g)})").mkString(", ") + ")"
  val cteRequestedRevokes: String =
    "requested_revokes(role) AS (VALUES " +
      requestedRevokes.map(r => s"(${lit(r)})").mkString(", ") + ")"
  val cteGrantAllowlist: String =
    "grant_allowlist(grant_upper, level) AS (VALUES " +
      grantAllowlist.map { case (g, l) => s"(${lit(g)}, ${lit(l)})" }.mkString(", ") + ")"
  val cteSpecDatabases: String =
    "spec_databases(db_idx, database) AS (VALUES " +
      specDatabases.map { case (i, d) => s"($i, ${lit(d)})" }.mkString(", ") + ")"
  val cteSpecTables: String =
    "spec_tables(tb_idx, table_name) AS (VALUES " +
      specTables.map { case (i, t) => s"($i, ${lit(t)})" }.mkString(", ") + ")"
  val cteUserSpecs: String =
    "user_specs(user_name, user_password, err_msg) AS (VALUES " +
      userSpecs.map { case (u, p, e) => s"(${lit(u)}, ${lit(p)}, ${lit(e)})" }.mkString(", ") + ")"
}
