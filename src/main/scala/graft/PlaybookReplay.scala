package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.SecurityCatalog
import graft.engine._

/** End-to-end replay of the reference's own usage example
  * (playbook_example.yaml:39-68) through the public engine API:
  * create 2 users with roles, apply 3 grant specs, then re-run the user
  * specs to prove O1 idempotence. The flattened (step, statement)
  * transcript is the observable output — the golden strings the
  * reference would send to ClickHouse.
  *
  * The playbook's users task always passes a hash: the given
  * user_password_hash or sha256 of user_password
  * (playbook_example.yaml:46); init_roles defaults true (yaml:49). */
object PlaybookReplay {

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def run(spark: SparkSession): Seq[(Int, String, Boolean, String)] = {
    val engine = new ReconcileEngine(SecurityCatalog.inMemory(spark))
    val userSpecs = Seq(
      UserSpec("db_admin",
        userPasswordHash = "a2015a1f1eb6a39f615b47de969376b367534b465a41dd7c98e5b1e00a3bdac1",
        userRoles = Seq("db_admin_role"), initRoles = true),
      UserSpec("app_user", userPasswordHash = sha256("appUserPass"),
        userRoles = Seq("reader_role", "writer_role"), initRoles = true))
    val grantSpecs = Seq(
      GrantSpec("db_admin_role", grants = Seq("ALL")),
      GrantSpec("reader_role", grants = Seq("SELECT", "SHOW"),
        databases = Seq("main"), replaceGrants = true),
      GrantSpec("writer_role", grants = Seq("INSERT", "UPDATE", "OPTIMIZE"),
        databases = Seq("main"), replaceGrants = true))

    val firstPass = userSpecs.map(s => s.userName -> engine.usersModule(s))
    val grantPass = grantSpecs.map(s => s.granteeName -> engine.grantsModule(s))
    val secondPass = userSpecs.map(s => s.userName -> engine.usersModule(s))

    (firstPass ++ grantPass ++ secondPass).zipWithIndex.flatMap {
      case ((who, res), step) =>
        if (res.runQueries.isEmpty)
          Seq((step, who, res.changed, "")) // idempotent no-op row
        else res.runQueries.map(q => (step, who, res.changed, q))
    }
  }

  /** DataFrame shape for the correctness gate. */
  def transcript(spark: SparkSession): DataFrame = {
    import spark.implicits._
    run(spark).toDF("step", "grantee", "changed", "statement")
      .orderBy("step", "statement")
  }
}
