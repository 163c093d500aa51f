package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.SecurityCatalog
import graft.engine.{ReconcileEngine, UserSpec, GrantSpec}
import graft.plans._

/** DclParser: render↔parse round-trips, golden reference samples, and
  * the raw-DCL catalog entry point producing the same state as the
  * spec-driven engine. */
class DclParserSpec extends AnyFunSuite {

  private val statements: Seq[DdlStatement] = Seq(
    CreateUserWithPassword("u1", "pw"),
    CreateUserWithHash("u2", "abc123"),
    DropUser("u1"),
    CreateRoleIfNotExists("r1"),
    GrantRolesTo(Seq("r1", "r2"), "u2"),
    GrantRolesTo(Seq("r1"), "u2", replace = true),
    RevokeRoleFrom("r1", "u2"),
    GrantPrivilegesOn(Seq("SELECT", "SHOW"), "main", "*", "g1"),
    GrantPrivilegesOn(Seq("ALL"), "default", "t", "g1", replace = true),
    RevokePrivilegesOn(Seq("INSERT", "UPDATE"), "main", "*", "g1"),
    AlterQuotaMembers("q1", Seq("u1", "u2")),
    AlterUserProfile("u2", "p1"))

  test("parse(render) round-trips every statement form") {
    statements.foreach { s =>
      assert(DclParser.parse(s.render) == Right(s), s"for: ${s.render}")
    }
  }

  test("golden strings from the reference docs parse to the right IR") {
    // README.md:121-124 RETURN samples
    assert(DclParser.parse(
      "ALTER QUOTA test_quota to test_user, test_user_1, test_user_2") ==
      Right(AlterQuotaMembers("test_quota", Seq("test_user", "test_user_1", "test_user_2"))))
    assert(DclParser.parse("ALTER USER test_user SETTINGS PROFILE test_profile") ==
      Right(AlterUserProfile("test_user", "test_profile")))
    assert(DclParser.parse("GRANT test_role_1, test_role_2 to 'test_user'") ==
      Right(GrantRolesTo(Seq("test_role_1", "test_role_2"), "test_user")))
    // clickhouse_grants.py:146-149 sample output
    assert(DclParser.parse("GRANT SELECT, SHOW on main.* to 'reader_role' WITH REPLACE OPTION") ==
      Right(GrantPrivilegesOn(Seq("SELECT", "SHOW"), "main", "*", "reader_role", replace = true)))
  }

  test("unparseable input fails without partial effects") {
    assert(DclParser.parse("TRUNCATE EVERYTHING").isLeft)
    assert(DclParser.parseAll(Seq("DROP USER 'u'", "garbage")).isLeft)
  }

  test("raw-DCL apply reaches the same catalog state as the spec engine") {
    val spark = SparkTestSession.spark

    val viaSpecs = SecurityCatalog.inMemory(spark)
    val engine = new ReconcileEngine(viaSpecs)
    engine.usersModule(UserSpec("app_user", userPasswordHash = "h1",
      userRoles = Seq("reader_role"), initRoles = true))
    engine.grantsModule(GrantSpec("reader_role", grants = Seq("SELECT", "SHOW"),
      databases = Seq("main"), replaceGrants = true))

    val viaSql = SecurityCatalog.inMemory(spark)
    val res = viaSql.applySql(Seq(
      "CREATE USER 'app_user' IDENTIFIED WITH sha256_hash BY 'h1'",
      "CREATE ROLE IF NOT EXISTS reader_role",
      "GRANT reader_role to 'app_user'",
      "GRANT SELECT, SHOW on main.* to 'reader_role' WITH REPLACE OPTION"))
    assert(res.isRight)
    assert(viaSql.state == viaSpecs.state)
  }
}
