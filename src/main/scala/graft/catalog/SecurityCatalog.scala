package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.plans._

/** Entity rows of the security catalog (SURVEY §1.1). Schemas mirror the
  * ClickHouse system tables the reference probes (system.users,
  * system.role_grants, system.settings_profile_elements, system.quotas —
  * clickhouse_users.py:149,156,166,179-180) plus the write-only entities
  * it mutates blind (roles, privilege grants —
  * clickhouse_users.py:236, clickhouse_grants.py:294-300). */
final case class User(name: String, authType: String, authValue: String)
final case class Role(name: String)
final case class RoleGrant(userName: String, grantedRoleName: String)
final case class PrivilegeGrant(grantee: String, privilege: String,
                                database: String, table: String)
final case class Quota(name: String, applyToList: Seq[String])
final case class SettingsProfileElement(userName: String, inheritProfile: String)

/** Full catalog state — an immutable value; every DDL application
  * produces a new state (mirrors `query_list` batch execution,
  * clickhouse_users.py:246). */
final case class CatalogState(
    users: Seq[User] = Nil,
    roles: Seq[Role] = Nil,
    roleGrants: Seq[RoleGrant] = Nil,
    grants: Seq[PrivilegeGrant] = Nil,
    quotas: Seq[Quota] = Nil,
    profileElements: Seq[SettingsProfileElement] = Nil)

/** Mutable, optionally Parquet-persisted security catalog — the engine's
  * analogue of the ClickHouse server the reference connects to
  * (clickhouse_users.py:317).
  *
  * Design (SURVEY §7 risk register): catalog tables are metadata — tiny
  * by construction (user/role/grant sets), single-writer,
  * driver-committed. State lives as case-class Seqs; each `apply` is a
  * read-modify-commit; persistence is one small Parquet table per
  * entity. The DATA-plane (probes, diffs, corpus queries) stays fully
  * distributed — this class is the metastore, not an operator.
  *
  * Probe surface: `sysUsersDf` etc. expose the same schemas as the
  * SecurityFixtures views, so SecurityOps probes (S1–S5) run unchanged
  * against live catalog state.
  */
final class SecurityCatalog(val spark: SparkSession, persistPath: Option[String]) {

  @volatile private var st: CatalogState = persistPath match {
    case Some(p) if new java.io.File(p, "users").exists() => loadFrom(p)
    case _ => CatalogState()
  }

  def state: CatalogState = st

  /** Out-of-band provisioning seam: quotas (and any pre-existing server
    * state) are created by DBAs outside the reference's modules —
    * system.quotas is probe-only there, and ALTER QUOTA on a missing
    * quota raises DB::Exception (see applyOne). Seeding replaces the
    * whole state, like pointing the modules at an already-provisioned
    * server. */
  def bootstrap(state: CatalogState): Unit = synchronized {
    st = state; commit()
  }

  // ---- probe-side DataFrames (schemas match SecurityFixtures views) ----

  def sysUsersDf: DataFrame = {
    import spark.implicits._
    st.users.map(_.name).toDF("name")
  }
  def sysRoleGrantsDf: DataFrame = {
    import spark.implicits._
    st.roleGrants.map(g => (g.userName, g.grantedRoleName))
      .toDF("user_name", "granted_role_name")
  }
  def sysSettingsProfileElementsDf: DataFrame = {
    import spark.implicits._
    st.profileElements.map(e => (e.userName, e.inheritProfile))
      .toDF("user_name", "inherit_profile")
  }
  def sysQuotasDf: DataFrame = {
    import spark.implicits._
    st.quotas.map(q => (q.name, q.applyToList)).toDF("name", "apply_to_list")
  }
  def grantsDf: DataFrame = {
    import spark.implicits._
    st.grants.map(g => (g.grantee, g.privilege, g.database, g.table))
      .toDF("grantee", "privilege", "database", "table")
  }

  /** Register probe views under the reference's system-table names. */
  def registerViews(): Unit = {
    sysUsersDf.createOrReplaceTempView("sys_users")
    sysRoleGrantsDf.createOrReplaceTempView("sys_role_grants")
    sysSettingsProfileElementsDf
      .createOrReplaceTempView("sys_settings_profile_elements")
    sysQuotasDf.createOrReplaceTempView("sys_quotas")
  }

  // ---- apply path (S6): batch-execute a plan -------------------------

  /** Execute each planned statement in order (the reference's
    * `[ch_connect.execute(q) for q in query_list]`,
    * clickhouse_users.py:246) and commit. Sequential like the server:
    * a failing statement leaves the already-applied prefix in place
    * (the reference's CREATE USER persists even when a later ALTER
    * QUOTA raises — a re-run then probes user_exists=true), so the
    * prefix is committed before the exception propagates. */
  def apply(plan: Seq[DdlStatement]): Unit = synchronized {
    try plan.foreach(stmt => st = applyOne(st, stmt))
    finally commit()
  }

  /** Raw-DCL entry point (SURVEY §7 Milestone 5): parse reference-dialect
    * statement strings and apply them. All-or-nothing: a parse error
    * mutates nothing. */
  def applySql(sqls: Seq[String]): Either[String, Unit] =
    DclParser.parseAll(sqls).map(apply)

  /** Statement semantics mirror the server the reference talks to,
    * including its error paths: a duplicate CREATE USER and an ALTER of
    * a nonexistent quota raise DB::Exception on a real ClickHouse
    * (message shapes per the server's ACCESS_ENTITY_ALREADY_EXISTS /
    * ACCESS_ENTITY_NOT_FOUND), which the reference modules convert to
    * fail_json via the DB::Exception regex (clickhouse_users.py:324-325,
    * quirk §8-Q12). Unreachable through the engine's probe-gated
    * planning; reachable through the raw-DCL applySql entry point. */
  private def applyOne(s: CatalogState, stmt: DdlStatement): CatalogState = stmt match {
    case CreateUserWithPassword(u, pw) =>
      requireNoUser(s, u)
      s.copy(users = s.users :+ User(u, "sha256_password", sha256Hex(pw)))
    case CreateUserWithHash(u, h) =>
      requireNoUser(s, u)
      s.copy(users = s.users :+ User(u, "sha256_hash", h))
    case DropUser(u) =>
      // The reference cascades nothing on DROP USER (SURVEY §2.7 D3).
      s.copy(users = s.users.filterNot(_.name == u))
    case CreateRoleIfNotExists(r) =>
      if (s.roles.exists(_.name == r)) s else s.copy(roles = s.roles :+ Role(r))
    case GrantRolesTo(roles, u, replace) =>
      val kept = if (replace) s.roleGrants.filterNot(_.userName == u) else s.roleGrants
      val existing = kept.collect { case g if g.userName == u => g.grantedRoleName }.toSet
      s.copy(roleGrants = kept ++ roles.filterNot(existing).map(RoleGrant(u, _)))
    case RevokeRoleFrom(r, u) =>
      s.copy(roleGrants =
        s.roleGrants.filterNot(g => g.userName == u && g.grantedRoleName == r))
    case GrantPrivilegesOn(privs, db, tbl, g, replace) =>
      // WITH REPLACE OPTION replaces the grantee's whole grant set
      // (SURVEY §2.6 SO4: delete-then-insert).
      val kept = if (replace) s.grants.filterNot(_.grantee == g) else s.grants
      val fresh = privs.map(PrivilegeGrant(g, _, db, tbl))
        .filterNot(kept.contains)
      s.copy(grants = kept ++ fresh)
    case RevokePrivilegesOn(privs, db, tbl, g) =>
      s.copy(grants = s.grants.filterNot(x =>
        x.grantee == g && x.database == db && x.table == tbl &&
          privs.contains(x.privilege)))
    case AlterQuotaMembers(q, members) =>
      // Full member-list rewrite (clickhouse_users.py:217).
      if (!s.quotas.exists(_.name == q))
        throw new ServerException(
          s"Code: 199. DB::Exception: There is no quota `$q` in user directories.")
      val others = s.quotas.filterNot(_.name == q)
      s.copy(quotas = others :+ Quota(q, members))
    case AlterUserProfile(u, p) =>
      val others = s.profileElements.filterNot(_.userName == u)
      s.copy(profileElements = others :+ SettingsProfileElement(u, p))
  }

  private def requireNoUser(s: CatalogState, u: String): Unit =
    if (s.users.exists(_.name == u))
      throw new ServerException(
        s"Code: 493. DB::Exception: User `$u` already exists.")

  // ---- persistence ----------------------------------------------------

  private def sha256Hex(s: String): String =
    graft.functions.GraftHash.sha256Hex(s)

  private def commit(): Unit = persistPath.foreach { p =>
    import spark.implicits._
    def write(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$p/$name")
    write(st.users.toDF(), "users")
    write(st.roles.toDF(), "roles")
    write(st.roleGrants.toDF(), "role_grants")
    write(st.grants.toDF(), "grants")
    write(st.quotas.toDF(), "quotas")
    write(st.profileElements.toDF(), "settings_profile_elements")
  }

  private def loadFrom(p: String): CatalogState = {
    import spark.implicits._
    CatalogState(
      users = spark.read.parquet(s"$p/users").as[User].collect().toSeq,
      roles = spark.read.parquet(s"$p/roles").as[Role].collect().toSeq,
      roleGrants = spark.read.parquet(s"$p/role_grants").as[RoleGrant].collect().toSeq,
      grants = spark.read.parquet(s"$p/grants").as[PrivilegeGrant].collect().toSeq,
      quotas = spark.read.parquet(s"$p/quotas").as[Quota].collect().toSeq,
      profileElements = spark.read.parquet(s"$p/settings_profile_elements")
        .as[SettingsProfileElement].collect().toSeq)
  }
}

/** Analogue of clickhouse_driver.errors.ServerException — the error the
  * reference's DB::Exception regex is applied to (clickhouse_users.py:323). */
final class ServerException(message: String) extends RuntimeException(message)

object SecurityCatalog {
  /** In-memory catalog (tests, dry runs). */
  def inMemory(spark: SparkSession): SecurityCatalog =
    new SecurityCatalog(spark, None)

  /** Parquet-persisted catalog rooted at `path`. */
  def at(spark: SparkSession, path: String): SecurityCatalog =
    new SecurityCatalog(spark, Some(path))
}
