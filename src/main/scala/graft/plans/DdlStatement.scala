package graft.plans

/** The plan IR: every DDL/DCL statement the reference can emit
  * (SURVEY §2.7 D1–D11). `render` must reproduce the reference's
  * f-string templates byte-for-byte — the golden-output tests compare
  * against the samples in README.md:116-124 and the RETURN docs.
  *
  * Template fidelity notes (quirks preserved deliberately):
  *  - lowercase `to` / `from` in GRANT/REVOKE (clickhouse_users.py:241,
  *    clickhouse_grants.py:203,215,220,296,299)
  *  - user names single-quoted in GRANT/REVOKE/CREATE USER/DROP USER,
  *    but NOT in ALTER USER / ALTER QUOTA (clickhouse_users.py:217,225)
  *  - `WITH REPLACE OPTION` suffix only where the reference emits it
  *    (clickhouse_grants.py:215,295)
  */
sealed trait DdlStatement {
  def render: String
}

/** D1 — clickhouse_users.py:206 */
final case class CreateUserWithPassword(user: String, password: String) extends DdlStatement {
  def render = s"CREATE USER '$user' IDENTIFIED WITH sha256_password BY '$password'"
}

/** D2 — clickhouse_users.py:208 */
final case class CreateUserWithHash(user: String, passwordHash: String) extends DdlStatement {
  def render = s"CREATE USER '$user' IDENTIFIED WITH sha256_hash BY '$passwordHash'"
}

/** D3 — clickhouse_users.py:255 */
final case class DropUser(user: String) extends DdlStatement {
  def render = s"DROP USER '$user'"
}

/** D4 — clickhouse_users.py:236, clickhouse_grants.py:210 */
final case class CreateRoleIfNotExists(role: String) extends DdlStatement {
  def render = s"CREATE ROLE IF NOT EXISTS $role"
}

/** D5/D6 — clickhouse_users.py:241, clickhouse_grants.py:215,220 */
final case class GrantRolesTo(roles: Seq[String], user: String, replace: Boolean = false) extends DdlStatement {
  def render = {
    val suffix = if (replace) " WITH REPLACE OPTION" else ""
    s"GRANT ${roles.mkString(", ")} to '$user'" + suffix
  }
}

/** D7 — clickhouse_grants.py:203 (one statement per role) */
final case class RevokeRoleFrom(role: String, user: String) extends DdlStatement {
  def render = s"REVOKE $role from '$user'"
}

/** D8 — clickhouse_grants.py:294-297; REPLACE only on (db_idx,tb_idx)=(0,0) */
final case class GrantPrivilegesOn(privileges: Seq[String], database: String,
                                   table: String, grantee: String,
                                   replace: Boolean = false) extends DdlStatement {
  def render = {
    val suffix = if (replace) " WITH REPLACE OPTION" else ""
    s"GRANT ${privileges.mkString(", ")} on $database.$table to '$grantee'" + suffix
  }
}

/** D9 — clickhouse_grants.py:298-300 */
final case class RevokePrivilegesOn(privileges: Seq[String], database: String,
                                    table: String, grantee: String) extends DdlStatement {
  def render = s"REVOKE ${privileges.mkString(", ")} on $database.$table from '$grantee'"
}

/** D10 — clickhouse_users.py:217 (full rewritten member list, unquoted) */
final case class AlterQuotaMembers(quota: String, members: Seq[String]) extends DdlStatement {
  def render = s"ALTER QUOTA $quota to ${members.mkString(", ")}"
}

/** D11 — clickhouse_users.py:225 (unquoted user and profile) */
final case class AlterUserProfile(user: String, profile: String) extends DdlStatement {
  def render = s"ALTER USER $user SETTINGS PROFILE $profile"
}
