package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.catalog.SecurityCatalog
import graft.engine.{GrantSpec, ModuleResult, ReconcileEngine, UserSpec}
import graft.streaming.ContinuousReconcile

/** Streaming reconcile: micro-batches of specs converge the catalog,
  * and redelivery is a no-op thanks to O1 idempotence. */
class ContinuousReconcileSpec extends AnyFunSuite {

  test("spec stream reconciles catalog; redelivered batch changes nothing") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val catalog = SecurityCatalog.inMemory(spark)
    val engine = new ReconcileEngine(catalog)
    val results = mutable.Buffer[(String, Boolean)]()
    val sink = (s: UserSpec, r: ModuleResult) =>
      results.synchronized { results += ((s.userName, r.changed)); () }

    val stream = MemoryStream[UserSpec]
    val query = ContinuousReconcile.writer(stream.toDS(), engine)(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
      .start()
    try {
      stream.addData(
        UserSpec("s_user1", userPassword = "pw1", userRoles = Seq("r1"), initRoles = true),
        UserSpec("s_user2", userPassword = "pw2"))
      query.processAllAvailable()
      assert(catalog.state.users.map(_.name).sorted == Seq("s_user1", "s_user2"))
      assert(catalog.state.roleGrants.map(_.grantedRoleName) == Seq("r1"))
      assert(results.toList == List("s_user1" -> true, "s_user2" -> true))

      // redelivery: same specs again → probe gates plan nothing (O1)
      results.clear()
      stream.addData(
        UserSpec("s_user1", userPassword = "pw1", userRoles = Seq("r1"), initRoles = true),
        UserSpec("s_user2", userPassword = "pw2"))
      query.processAllAvailable()
      assert(results.toList == List("s_user1" -> false, "s_user2" -> false))
    } finally query.stop()
  }

  test("grant stream applies privilege grants to seeded grantees via the grants-path writer") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val catalog = SecurityCatalog.inMemory(spark)
    val engine = new ReconcileEngine(catalog)
    // grants need their grantee to exist — seed one user with a role
    assert(engine.usersModule(UserSpec("g_user", userPassword = "pw",
      userRoles = Seq("g_role"), initRoles = true)).changed)
    val results = mutable.Buffer[(String, Boolean, Seq[String])]()
    val sink = (s: GrantSpec, r: ModuleResult) =>
      results.synchronized {
        results += ((s.granteeName, r.changed, r.runQueries)); ()
      }

    val stream = MemoryStream[GrantSpec]
    val query = ContinuousReconcile.grantsWriter(stream.toDS(), engine)(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_gckpt").toString)
      .start()
    try {
      stream.addData(GrantSpec("g_role", grants = Seq("SELECT"),
        databases = Seq("main"), replaceGrants = true))
      query.processAllAvailable()
      assert(results.toList.map(r => (r._1, r._2)) == List("g_role" -> true))
      assert(results.head._3.exists(_.contains("GRANT SELECT on main.*")))
      assert(catalog.state.grants.exists(g =>
        g.grantee == "g_role" && g.privilege == "SELECT"))
    } finally query.stop()
  }
}
