package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's probe / diff / validation dataflows (SURVEY §2.1–§2.6)
  * re-expressed as declarative Spark operators.
  *
  * Each function takes catalog DataFrames and returns a lazy DataFrame —
  * Catalyst handles predicate pushdown, broadcast-join selection and
  * whole-stage codegen. At scale the "catalog" sides here are tiny by
  * design (role/user/allowlist sets), so every join below plans as a
  * BroadcastHashJoin; none of these shuffles the big side.
  */
object SecurityOps {

  /** S1/A1 — user-exists probe (clickhouse_users.py:148-150). */
  def userExists(sysUsers: DataFrame, user: String): DataFrame =
    sysUsers.where(col("name") === lit(user)).agg(count(lit(1)).as("c"))

  /** S2 — granted-roles probe (clickhouse_users.py:153-161). */
  def grantedRoles(sysRoleGrants: DataFrame, user: String): DataFrame =
    sysRoleGrants.where(col("user_name") === lit(user))
      .select(col("granted_role_name"))
      .orderBy(col("granted_role_name"))

  /** S3 — settings-profile probe (clickhouse_users.py:164-172). */
  def userProfiles(sysProfileElems: DataFrame, user: String): DataFrame =
    sysProfileElems.where(col("user_name") === lit(user))
      .select(col("inherit_profile"))
      .orderBy(col("inherit_profile"))

  /** S4/P3 — quota-by-member probe: `has(apply_to_list, user)`
    * (clickhouse_users.py:179). `has` is ClickHouse spelling for
    * array_contains; registered as a SQL alias in GraftFunctions. */
  def quotasForUser(sysQuotas: DataFrame, user: String): DataFrame =
    sysQuotas.where(array_contains(col("apply_to_list"), user))
      .select(col("name"))
      .orderBy(col("name"))

  /** S5 — quota member-list probe (clickhouse_users.py:180). */
  def quotaMembers(sysQuotas: DataFrame, quota: String): DataFrame =
    sysQuotas.where(col("name") === lit(quota)).select(col("apply_to_list"))

  /** J1/SO1/A2 — roles still to grant = desired MINUS granted
    * (clickhouse_users.py:158-160). Left-anti join; granted side is a
    * filtered tiny set → broadcast. */
  def rolesToGrant(desired: DataFrame, sysRoleGrants: DataFrame, user: String): DataFrame = {
    val granted = sysRoleGrants.where(col("user_name") === lit(user))
      .select(col("granted_role_name").as("role"))
    desired.join(broadcast(granted), Seq("role"), "left_anti").orderBy(col("role"))
  }

  /** J2/SO2 — roles to revoke = requested INTERSECT currently granted
    * (clickhouse_grants.py:200-203). Left-semi join. */
  def rolesToRevoke(requested: DataFrame, sysRoleGrants: DataFrame, user: String): DataFrame = {
    val granted = sysRoleGrants.where(col("user_name") === lit(user))
      .select(col("granted_role_name").as("role"))
    requested.join(broadcast(granted), Seq("role"), "left_semi").orderBy(col("role"))
  }

  /** P4/J4 — invalid grants = requested MINUS 32-entry allowlist, with the
    * camelCase `dictGet` carve-out (clickhouse_grants.py:285-290, list at
    * 241-283: `grant.upper() not in applicable_grants and grant != 'dictGet'`).
    * The allowlist is a compile-time constant, so this is a plain codegen'd
    * filter — no join at all (the OR-condition anti-join form planned as a
    * BroadcastNestedLoopJoin). The reference fails the whole call on the
    * first miss; the relational form returns all misses. */
  def invalidGrants(requested: DataFrame, allowlist: Seq[String]): DataFrame =
    requested
      .where(!upper(col("grant_name")).isin(allowlist: _*) &&
             col("grant_name") =!= lit("dictGet"))
      .orderBy(col("grant_name"))

  /** J3 — databases × tables expansion for privilege grants
    * (clickhouse_grants.py:292-293). Positional indices preserved so the
    * first-(0,0)-pair REPLACE quirk (§8-Q3) stays observable. */
  def dbTableExpansion(databases: DataFrame, tables: DataFrame): DataFrame =
    databases.crossJoin(broadcast(tables))
      .select(col("database"), col("table_name"))
      .orderBy(col("db_idx"), col("tb_idx"))

  /** A4/SO3 — quota member append WITHOUT dedup (clickhouse_users.py:188):
    * the reference appends to apply_to_list; dedup is only avoided by the
    * user_has_quota gate, so `concat`, not `array_union` (§8-Q6). The
    * appended list is emitted as a comma-joined string: the driver's
    * canonicalizer sorts result columns in pandas, where a raw array cell
    * is unhashable (round-1 q10 failure). */
  def quotaAppendMember(sysQuotas: DataFrame, quota: String, user: String): DataFrame =
    sysQuotas.where(col("name") === lit(quota))
      .select(
        col("name"),
        array_join(concat(col("apply_to_list"), array(lit(user))), ",").as("new_members"))

  /** sha256 password hashing (clickhouse_users.py:206, playbook:46) +
    * DB::Exception error extraction (clickhouse_users.py:324). */
  def hashAndErrors(userSpecs: DataFrame): DataFrame =
    userSpecs.select(
        col("user_name"),
        sha2(col("user_password"), 256).as("pw_hash"),
        regexp_extract(col("err_msg"), "DB::Exception.+\\.", 0).as("db_error"))
      .orderBy(col("user_name"))
}
