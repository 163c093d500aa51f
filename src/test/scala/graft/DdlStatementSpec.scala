package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans._

/** Golden-template tests: every D1–D11 statement renders byte-for-byte
  * what the reference's f-strings produce. Expected strings come from
  * the templates at clickhouse_users.py:206,208,217,225,236,241,255 and
  * clickhouse_grants.py:203,210,215,220,295-300, and the RETURN samples
  * in README.md:116-124. */
class DdlStatementSpec extends AnyFunSuite {

  test("D1 CREATE USER sha256_password") {
    assert(CreateUserWithPassword("test_user", "secret").render ==
      "CREATE USER 'test_user' IDENTIFIED WITH sha256_password BY 'secret'")
  }

  test("D2 CREATE USER sha256_hash") {
    assert(CreateUserWithHash("db_admin", "a2015a1f").render ==
      "CREATE USER 'db_admin' IDENTIFIED WITH sha256_hash BY 'a2015a1f'")
  }

  test("D3 DROP USER") {
    assert(DropUser("test_user").render == "DROP USER 'test_user'")
  }

  test("D4 CREATE ROLE IF NOT EXISTS — role unquoted") {
    assert(CreateRoleIfNotExists("reader_role").render ==
      "CREATE ROLE IF NOT EXISTS reader_role")
  }

  test("D5 GRANT roles — lowercase 'to', quoted user, comma-space join (README sample)") {
    assert(GrantRolesTo(Seq("test_role_1", "test_role_2"), "test_user").render ==
      "GRANT test_role_1, test_role_2 to 'test_user'")
  }

  test("D6 GRANT roles WITH REPLACE OPTION") {
    assert(GrantRolesTo(Seq("reader_role"), "app_user", replace = true).render ==
      "GRANT reader_role to 'app_user' WITH REPLACE OPTION")
  }

  test("D7 REVOKE role — lowercase 'from'") {
    assert(RevokeRoleFrom("reader_role", "app_user").render ==
      "REVOKE reader_role from 'app_user'")
  }

  test("D8 GRANT privileges on db.table") {
    assert(GrantPrivilegesOn(Seq("SELECT", "SHOW"), "main", "*", "reader_role").render ==
      "GRANT SELECT, SHOW on main.* to 'reader_role'")
    assert(GrantPrivilegesOn(Seq("SELECT"), "main", "clients", "r", replace = true).render ==
      "GRANT SELECT on main.clients to 'r' WITH REPLACE OPTION")
  }

  test("D9 REVOKE privileges on db.table") {
    assert(RevokePrivilegesOn(Seq("INSERT", "UPDATE"), "main", "*", "writer_role").render ==
      "REVOKE INSERT, UPDATE on main.* from 'writer_role'")
  }

  test("D10 ALTER QUOTA — unquoted members, full list (README sample)") {
    assert(AlterQuotaMembers("test_quota", Seq("test_user", "test_user_1", "test_user_2")).render ==
      "ALTER QUOTA test_quota to test_user, test_user_1, test_user_2")
  }

  test("D11 ALTER USER SETTINGS PROFILE — unquoted (README sample)") {
    assert(AlterUserProfile("test_user", "test_profile").render ==
      "ALTER USER test_user SETTINGS PROFILE test_profile")
  }
}
