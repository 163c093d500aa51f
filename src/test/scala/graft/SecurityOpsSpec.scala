package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{SecurityFixtures => F}
import graft.operators.SecurityOps

/** Unit-per-operator suite for the probe/diff surface (SURVEY §2.1–§2.6)
  * over the deterministic fixtures. Includes plan-shape checks: the
  * catalog sides are tiny, so no probe/diff may plan a
  * BroadcastNestedLoopJoin or a cartesian product (except J3, whose
  * cross join IS the semantics). */
class SecurityOpsSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("S1 user-exists probe counts matching rows") {
    assert(SecurityOps.userExists(F.sysUsersDf(spark), "app_user").head.getLong(0) == 1L)
    assert(SecurityOps.userExists(F.sysUsersDf(spark), "ghost").head.getLong(0) == 0L)
  }

  test("S2 granted-roles probe projects and orders") {
    val roles = SecurityOps.grantedRoles(F.sysRoleGrantsDf(spark), "app_user")
      .collect().map(_.getString(0)).toSeq
    assert(roles == Seq("reader_role", "writer_role"))
  }

  test("S3 profile probe") {
    val ps = SecurityOps.userProfiles(F.sysSettingsProfileElementsDf(spark), "app_user")
      .collect().map(_.getString(0)).toSeq
    assert(ps == Seq("custom_profile"))
  }

  test("S4 quota-by-member array_contains probe") {
    val qs = SecurityOps.quotasForUser(F.sysQuotasDf(spark), "db_admin")
      .collect().map(_.getString(0)).toSeq
    assert(qs == Seq("custom_quota"))
  }

  test("S5 quota-members probe reads the array cell") {
    val ms = SecurityOps.quotaMembers(F.sysQuotasDf(spark), "custom_quota")
      .head.getSeq[String](0)
    assert(ms == Seq("app_user", "db_admin"))
  }

  test("J1 left-anti diff: desired minus granted") {
    val todo = SecurityOps.rolesToGrant(F.desiredRolesDf(spark),
      F.sysRoleGrantsDf(spark), "app_user").collect().map(_.getString(0)).toSeq
    assert(todo == Seq("auditor_role"))
  }

  test("J2 left-semi: revoke set = requested ∩ granted") {
    val rv = SecurityOps.rolesToRevoke(F.requestedRevokesDf(spark),
      F.sysRoleGrantsDf(spark), "reader_role_user").collect().map(_.getString(0)).toSeq
    assert(rv == Seq("reader_role"))
  }

  test("P4 invalid grants filter honors case rules and plans no join") {
    val df = SecurityOps.invalidGrants(F.requestedGrantsDf(spark), F.grantAllowlist.map(_._1))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("bogus_grant"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Join"))
  }

  test("J3 db×table expansion preserves positional order") {
    val rows = SecurityOps.dbTableExpansion(F.specDatabasesDf(spark), F.specTablesDf(spark))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(
      ("main", "statistics"), ("main", "clients"), ("main", "*"),
      ("dictionaries", "statistics"), ("dictionaries", "clients"), ("dictionaries", "*")))
  }

  test("A4 quota append keeps duplicates out only via the gate, not dedup") {
    val r = SecurityOps.quotaAppendMember(F.sysQuotasDf(spark), "custom_quota", "app_user")
      .head.getString(1)
    // appending an EXISTING member duplicates it — concat, not array_union
    assert(r == "app_user,db_admin,app_user")
  }

  test("has() SQL alias resolves to native ArrayContains") {
    val df = QueryRunner.sql(spark, "/root/testdata/sf0.001",
      "SELECT name FROM sys_quotas WHERE has(apply_to_list, 'app_user')")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("custom_quota"))
    // the optimizer constant-folds the local fixture to a LocalRelation,
    // so resolution is visible in the analyzed plan only
    assert(df.queryExecution.analyzed.toString.contains("array_contains"))
  }
}
