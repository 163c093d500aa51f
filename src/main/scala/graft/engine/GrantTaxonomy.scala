package graft.engine

/** The privilege taxonomy the engine validates against: 6 system + 2
  * database + 24 table = 32 applicable grants, listed exactly as the
  * reference declares them (clickhouse_grants.py:241-283). The compare
  * at clickhouse_grants.py:287 is `grant.upper() not in applicable_grants
  * and grant != 'dictGet'` — the list is consulted AS WRITTEN, so the
  * mixed-case `dictGet` entry is only reachable through the exact-case
  * carve-out. */
object GrantTaxonomy {
  val systemLevelGrants: Seq[String] = Seq(
    "CREATE FUNCTION", "DROP FUNCTION", "RELOAD DICTIONARY", "KILL QUERY",
    "MYSQL", "CLUSTER")

  val databaseLevelGrants: Seq[String] = Seq("CREATE DATABASE", "DROP DATABASE")

  val tableLevelGrants: Seq[String] = Seq(
    "ALL", "SELECT", "SHOW", "dictGet", "INSERT", "UPDATE", "DELETE",
    "ALTER", "ALTER TABLE", "ALTER COLUMN", "ALTER CONSTRAINT",
    "ALTER INDEX", "ALTER VIEW", "ALTER TTL", "CREATE", "CREATE TABLE",
    "CREATE VIEW", "CREATE DICTIONARY", "DROP", "DROP TABLE", "DROP VIEW",
    "DROP DICTIONARY", "TRUNCATE", "OPTIMIZE")

  val applicableGrants: Seq[String] =
    systemLevelGrants ++ databaseLevelGrants ++ tableLevelGrants

  /** True iff the reference would reject this grant
    * (clickhouse_grants.py:287). */
  def isInvalid(grant: String): Boolean =
    !applicableGrants.contains(grant.toUpperCase) && grant != "dictGet"
}
