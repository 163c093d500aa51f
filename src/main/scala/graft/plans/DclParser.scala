package graft.plans

/** Parser for the reference's emitted DCL dialect (SURVEY §7 Milestone 5):
  * maps raw statement strings D1–D11 back onto the DdlStatement IR so
  * ClickHouse DCL text can drive the SecurityCatalog directly.
  *
  * Scope is EXACTLY the grammar the reference emits
  * (clickhouse_users.py:206-255, clickhouse_grants.py:203-300) — a
  * deliberate ~100-line regex parser, not a SparkSqlParser extension:
  * Spark's parser does not know ClickHouse DCL, and grafting a grammar
  * into it buys nothing for 11 fixed templates (SURVEY §4).
  *
  * Round-trips with render: parse(stmt.render) == stmt for every
  * statement the planner can produce, and parse(s).render == s for
  * every string in the reference's golden samples.
  */
object DclParser {

  private val CreateUserPw =
    """CREATE USER '([^']+)' IDENTIFIED WITH sha256_password BY '([^']*)'""".r
  private val CreateUserHash =
    """CREATE USER '([^']+)' IDENTIFIED WITH sha256_hash BY '([^']*)'""".r
  private val DropUserRe = """DROP USER '([^']+)'""".r
  private val CreateRoleRe = """CREATE ROLE IF NOT EXISTS (\S+)""".r
  private val GrantRolesReplaceRe = """GRANT (.+) to '([^']+)' WITH REPLACE OPTION""".r
  private val GrantPrivsReplaceRe =
    """GRANT (.+) on (\S+)\.(\S+) to '([^']+)' WITH REPLACE OPTION""".r
  private val GrantPrivsRe = """GRANT (.+) on (\S+)\.(\S+) to '([^']+)'""".r
  private val GrantRolesRe = """GRANT (.+) to '([^']+)'""".r
  private val RevokePrivsRe = """REVOKE (.+) on (\S+)\.(\S+) from '([^']+)'""".r
  private val RevokeRoleRe = """REVOKE (\S+) from '([^']+)'""".r
  private val AlterQuotaRe = """ALTER QUOTA (\S+) to (.+)""".r
  private val AlterProfileRe = """ALTER USER (\S+) SETTINGS PROFILE (\S+)""".r

  private def csv(s: String): Seq[String] = s.split(", ").toSeq

  /** Parse one statement; Left(error) for anything outside the D1–D11
    * grammar. Match order mirrors template specificity (privilege forms
    * with `on db.tbl` before the role forms; REPLACE before plain). */
  def parse(sql: String): Either[String, DdlStatement] = sql.trim match {
    case CreateUserPw(u, pw)   => Right(CreateUserWithPassword(u, pw))
    case CreateUserHash(u, h)  => Right(CreateUserWithHash(u, h))
    case DropUserRe(u)         => Right(DropUser(u))
    case CreateRoleRe(r)       => Right(CreateRoleIfNotExists(r))
    case GrantPrivsReplaceRe(ps, db, tbl, g) =>
      Right(GrantPrivilegesOn(csv(ps), db, tbl, g, replace = true))
    case GrantPrivsRe(ps, db, tbl, g) =>
      Right(GrantPrivilegesOn(csv(ps), db, tbl, g))
    case GrantRolesReplaceRe(rs, u) =>
      Right(GrantRolesTo(csv(rs), u, replace = true))
    case GrantRolesRe(rs, u)   => Right(GrantRolesTo(csv(rs), u))
    case RevokePrivsRe(ps, db, tbl, g) =>
      Right(RevokePrivilegesOn(csv(ps), db, tbl, g))
    case RevokeRoleRe(r, u)    => Right(RevokeRoleFrom(r, u))
    case AlterQuotaRe(q, ms)   => Right(AlterQuotaMembers(q, csv(ms)))
    case AlterProfileRe(u, p)  => Right(AlterUserProfile(u, p))
    case other                 => Left(s"unparseable DCL statement: $other")
  }

  /** Parse a batch; fails on the first bad statement (the reference's
    * batch apply is all-or-nothing up to the failing statement, so a
    * pre-validated parse is the safe contract). */
  def parseAll(sqls: Seq[String]): Either[String, Seq[DdlStatement]] =
    sqls.foldLeft[Either[String, Vector[DdlStatement]]](Right(Vector.empty)) {
      case (Left(e), _) => Left(e)
      case (Right(acc), s) => parse(s).map(acc :+ _)
    }
}
