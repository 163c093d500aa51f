package graft.engine

import scala.collection.immutable.ListMap


import graft.catalog.SecurityCatalog
import graft.operators.SecurityOps
import graft.plans._

/** Declarative input specs — the analogue of the Ansible argument_spec
  * (clickhouse_users.py:262-275, clickhouse_grants.py:313-328). Connection
  * parameters (address/login/secure) have no analogue: the "server" is the
  * SecurityCatalog. `on_cluster`/`cluster_name` are accepted and ignored,
  * exactly like the reference (parsed at clickhouse_grants.py:326-327,
  * used in no query template — quirk §8-Q4). */
final case class UserSpec(
    userName: String,
    userPassword: String = "",
    userPasswordHash: String = "",
    userQuota: String = "",
    userProfile: String = "",
    userRoles: Seq[String] = Nil,
    initRoles: Boolean = false,
    userState: String = "present")

final case class GrantSpec(
    granteeName: String,
    grants: Seq[String] = Nil,
    databases: Seq[String] = Seq("default"),
    tables: Seq[String] = Seq("*"),
    grantRoles: Seq[String] = Nil,
    initRoles: Boolean = false,
    revokeGrants: Boolean = false,
    replaceGrants: Boolean = false,
    onCluster: Boolean = false,
    clusterName: String = "default")

/** The result document — an ordered map mirroring the reference's result
  * dicts exactly, including their per-path shape asymmetries:
  * create/update returns `run_queries` + `user_status`
  * (clickhouse_users.py:198-202); delete returns singular `query`
  * (clickhouse_users.py:257, quirk §8-Q11); failures carry
  * `failed`/`error`/`msg` (clickhouse_grants.py:288-290). */
final case class ModuleResult(doc: ListMap[String, Any]) {
  def changed: Boolean = doc.get("changed").contains(true)
  def failed: Boolean = doc.get("failed").contains(true)
  def runQueries: Seq[String] =
    doc.getOrElse("run_queries", Nil).asInstanceOf[Seq[String]]
  def userStatus: Map[String, Any] =
    doc.getOrElse("user_status", Map.empty).asInstanceOf[Map[String, Any]]
  def msg: Option[String] = doc.get("msg").map(_.toString)
}

object ModuleResult {
  def fail(message: String): ModuleResult =
    ModuleResult(ListMap("failed" -> true, "msg" -> message))

  /** §8-Q12: a ServerException is reported as the LIST of DB::Exception
    * regex matches over its message — `re.findall(r'DB::Exception.+\.',
    * err.message)` passed to fail_json (clickhouse_users.py:324-325,
    * clickhouse_grants.py:375-376) — not a flattened string. */
  def failDb(err: graft.catalog.ServerException): ModuleResult =
    ModuleResult(ListMap("failed" -> true,
      "msg" -> "DB::Exception.+\\.".r.findAllIn(err.getMessage).toList))
}

/** The reconcile dataflow: probe → diff → plan → apply
  * (SURVEY §0). Probes run as Spark operators over the catalog's
  * DataFrames (SecurityOps S1–S5); diffs are the J1/J2 set semantics;
  * the plan is a Seq[DdlStatement]; apply batch-executes against the
  * catalog (S6). `checkMode=true` is the improved dry run (§8-Q5): the
  * full prospective plan is computed and reported but nothing is
  * applied and `changed` stays false (the reference exits before
  * probing; we keep the `changed:false` shape while actually planning).
  */
final class ReconcileEngine(val catalog: SecurityCatalog) {

  // ---- probes (Spark operators over catalog state) --------------------

  private def userExists(user: String): Boolean =
    SecurityOps.userExists(catalog.sysUsersDf, user)
      .head().getLong(0) > 0

  private def grantedRoles(user: String): Seq[String] =
    SecurityOps.grantedRoles(catalog.sysRoleGrantsDf, user)
      .collect().map(_.getString(0)).toSeq

  private def userProfiles(user: String): Seq[String] =
    SecurityOps.userProfiles(catalog.sysSettingsProfileElementsDf, user)
      .collect().map(_.getString(0)).toSeq

  private def quotasForUser(user: String): Seq[String] =
    SecurityOps.quotasForUser(catalog.sysQuotasDf, user)
      .collect().map(_.getString(0)).toSeq

  private def quotaMembers(quota: String): Seq[String] =
    SecurityOps.quotaMembers(catalog.sysQuotasDf, quota)
      .collect().headOption.map(_.getSeq[String](0)).getOrElse(Nil)

  // ---- EP1: create/update user (clickhouse_users.py:192-248) ----------

  def createUpdateUser(spec: UserSpec, checkMode: Boolean = false): ModuleResult = {
    val user = spec.userName
    val exists = userExists(user)
    var status = ListMap[String, Any]("user_exists" -> exists)
    val plan = Seq.newBuilder[DdlStatement]

    if (!exists) {
      if (spec.userPassword.nonEmpty)
        plan += CreateUserWithPassword(user, spec.userPassword)
      else if (spec.userPasswordHash.nonEmpty)
        plan += CreateUserWithHash(user, spec.userPasswordHash)
      else
        // §8-Q1: the reference crashes here (UnboundLocalError on
        // user_query); we fail cleanly — a crash is not a semantic.
        return ModuleResult.fail(
          s"user '$user' does not exist and neither 'user_password' nor 'user_password_hash' is set")
    }

    if (spec.userQuota.nonEmpty) {
      val userQuotas = quotasForUser(user)
      val hasQuota = userQuotas.contains(spec.userQuota)
      // The reference appends the user unconditionally, without dedup
      // (clickhouse_users.py:188, §8-Q6); the ALTER is only planned when
      // the user is not already a member, so dedup never materializes.
      val quotaApplyUsers = quotaMembers(spec.userQuota) :+ user
      status ++= Seq("user_quotas" -> userQuotas, "user_has_quota" -> hasQuota)
      if (!hasQuota) plan += AlterQuotaMembers(spec.userQuota, quotaApplyUsers)
    }

    if (spec.userProfile.nonEmpty) {
      val profiles = userProfiles(user)
      val hasProfile = profiles.contains(spec.userProfile)
      status ++= Seq("user_profiles" -> profiles, "user_has_profile" -> hasProfile)
      if (!hasProfile) plan += AlterUserProfile(user, spec.userProfile)
    }

    if (spec.userRoles.nonEmpty) {
      val roles = grantedRoles(user)
      val hasRoles = spec.userRoles.forall(roles.contains)
      status ++= Seq("user_roles" -> roles, "user_has_roles" -> hasRoles)
      // The reference creates and grants ALL desired roles when any one
      // is missing (clickhouse_users.py:235-241) — the anti-join gates
      // WHETHER to act, not the statement contents.
      if (spec.initRoles && !hasRoles)
        spec.userRoles.foreach(r => plan += CreateRoleIfNotExists(r))
      if (!hasRoles)
        plan += GrantRolesTo(spec.userRoles, user)
    }

    val stmts = plan.result()
    val applied = stmts.nonEmpty && !checkMode
    if (applied) catalog.apply(stmts)
    ModuleResult(ListMap(
      "changed" -> applied,
      "run_queries" -> stmts.map(_.render),
      "user_status" -> status))
  }

  // ---- EP2: delete user (clickhouse_users.py:251-257) -----------------

  def deleteUser(user: String, checkMode: Boolean = false): ModuleResult = {
    val exists = userExists(user)
    if (!exists)
      return ModuleResult(ListMap("changed" -> false, "user_exists" -> false))
    val stmt = DropUser(user)
    if (!checkMode) catalog.apply(Seq(stmt))
    // Quirk §8-Q11 preserved: singular `query`, no run_queries/user_status.
    ModuleResult(ListMap(
      "changed" -> !checkMode, "query" -> stmt.render, "user_exists" -> true))
  }

  // ---- EP3a: role grants (clickhouse_grants.py:182-229) ---------------

  def grantRoles(spec: GrantSpec, checkMode: Boolean = false): ModuleResult = {
    val grantee = spec.granteeName
    val rolesList = spec.grantRoles
    // get_user_roles requires the grantee to exist AS A USER
    // (clickhouse_grants.py:169-171). §8-Q2: the reference hits a
    // NameError on the undefined `module`; we keep the exists-check
    // semantics with a clean failure.
    if (!userExists(grantee))
      return ModuleResult.fail(s"'$grantee' user does not exist")

    val userRoles = grantedRoles(grantee)
    val hasRoles = rolesList.forall(userRoles.contains)
    val status = ListMap[String, Any](
      "user_roles" -> userRoles, "user_has_roles" -> hasRoles)

    val plan = Seq.newBuilder[DdlStatement]
    if (spec.revokeGrants) {
      // J2: revoke only roles currently held (clickhouse_grants.py:200-203).
      rolesList.filter(userRoles.contains)
        .foreach(r => plan += RevokeRoleFrom(r, grantee))
    } else {
      if (spec.initRoles && !hasRoles)
        rolesList.foreach(r => plan += CreateRoleIfNotExists(r))
      if (spec.replaceGrants)
        plan += GrantRolesTo(rolesList, grantee, replace = true)
      else if (!hasRoles)
        plan += GrantRolesTo(rolesList, grantee)
    }

    val stmts = plan.result()
    val applied = stmts.nonEmpty && !checkMode
    if (applied) catalog.apply(stmts)
    // Built once, in the reference's key position order (a Python dict
    // update preserves key position; ListMap ++ would move updated keys
    // to the end). Quirk preserved: user_status is attached only on the
    // non-revoke path (clickhouse_grants.py:223 sits in the else branch).
    val doc = ListMap[String, Any](
      "changed" -> applied,
      "run_queries" -> stmts.map(_.render),
      "grant_roles" -> rolesList,
      "revoke_grants" -> spec.revokeGrants,
      "replace_grants" -> spec.replaceGrants)
    ModuleResult(
      if (spec.revokeGrants) doc else doc + ("user_status" -> status))
  }

  // ---- EP3b: privilege grants (clickhouse_grants.py:233-306) ----------

  def grantPrivileges(spec: GrantSpec, checkMode: Boolean = false): ModuleResult = {
    val grantee = spec.granteeName
    // O4: eager validation, whole call fails on the FIRST miss
    // (clickhouse_grants.py:285-290), before any planning.
    spec.grants.find(GrantTaxonomy.isInvalid) match {
      case Some(g) =>
        return ModuleResult(ListMap(
          "changed" -> false,
          "run_queries" -> Nil,
          "error" -> s"${g.toUpperCase} not in applicable grants: ${GrantTaxonomy.applicableGrants.mkString(", ")}.",
          "failed" -> true))
      case None => ()
    }

    // J3: databases × tables expansion with positional indices
    // (clickhouse_grants.py:292-293); REPLACE emitted only for the
    // first (0,0) pair (clickhouse_grants.py:295, quirk §8-Q3).
    val plan =
      for {
        (db, dbIdx) <- spec.databases.zipWithIndex
        (tbl, tbIdx) <- spec.tables.zipWithIndex
      } yield
        if (!spec.revokeGrants)
          GrantPrivilegesOn(spec.grants, db, tbl, grantee,
            replace = spec.replaceGrants && dbIdx == 0 && tbIdx == 0)
        else
          RevokePrivilegesOn(spec.grants, db, tbl, grantee)

    val applied = plan.nonEmpty && !checkMode
    if (applied) catalog.apply(plan)
    var doc = ListMap[String, Any](
      "changed" -> applied, "run_queries" -> plan.map(_.render))
    if (applied) doc += ("msg" -> "GRANTS EXECUTED")
    ModuleResult(doc)
  }

  // ---- module entry points (main() dispatch) --------------------------

  /** clickhouse_users main() (260-333): param validation + state dispatch. */
  def usersModule(spec: UserSpec, checkMode: Boolean = false): ModuleResult = {
    if (spec.userPassword.nonEmpty && spec.userPasswordHash.nonEmpty)
      return ModuleResult.fail(
        "Only one password type can be set: 'user_password' or 'user_password_hash'")
    // §8-Q10: validate state up front, same error text as the reference's
    // else branch (clickhouse_users.py:330-331).
    spec.userState match {
      case "present" =>
        // Reference wraps ONLY the present path in the ServerException →
        // DB::Exception-list handler (clickhouse_users.py:321-327);
        // delete_user runs unwrapped.
        try createUpdateUser(spec, checkMode)
        catch { case e: graft.catalog.ServerException => ModuleResult.failDb(e) }
      case "absent"  => deleteUser(spec.userName, checkMode)
      case _ =>
        ModuleResult.fail("Only {'present', 'absent'} states are supported by this module")
    }
  }

  /** clickhouse_grants main() (311-390): mutual-exclusion + path dispatch.
    * §8-Q8: a scalar `tables` default is normalized to `["*"]` before it
    * reaches the expansion loop. */
  def grantsModule(spec: GrantSpec, checkMode: Boolean = false): ModuleResult = {
    if (spec.grantRoles.nonEmpty && spec.grants.nonEmpty)
      ModuleResult.fail("Only one of parameters 'grant_roles' OR 'grants' must be defined.")
    else if (spec.grantRoles.nonEmpty)
      // Both grant paths carry the ServerException → DB::Exception-list
      // handler (clickhouse_grants.py:374-376, 383-385).
      try grantRoles(spec, checkMode)
      catch { case e: graft.catalog.ServerException => ModuleResult.failDb(e) }
    else if (spec.grants.nonEmpty)
      try grantPrivileges(spec, checkMode)
      catch { case e: graft.catalog.ServerException => ModuleResult.failDb(e) }
    else
      ModuleResult.fail("No any grants or roles are defined")
  }
}
