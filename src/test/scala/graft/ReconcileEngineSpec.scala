package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.SecurityCatalog
import graft.engine._

/** End-to-end playbook replay (SURVEY §5.2): executes the
  * playbook_example.yaml:39-80 scenario against an empty catalog and
  * asserts the full ordered run_queries transcript, resulting catalog
  * state, and O1 idempotence (second run → changed=false). Also pins the
  * §8 quirk decisions. */
class ReconcileEngineSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // Playbook vars (playbook_example.yaml:13-36). The users task passes
  // user_password_hash = given hash OR sha256 of the password
  // (playbook_example.yaml:46), and init_roles defaults to true (yaml:49).
  private val dbAdminHash = "a2015a1f1eb6a39f615b47de969376b367534b465a41dd7c98e5b1e00a3bdac1"
  private def dbAdmin = UserSpec("db_admin", userPasswordHash = dbAdminHash,
    userRoles = Seq("db_admin_role"), initRoles = true)
  private def appUser = UserSpec("app_user", userPasswordHash = sha256("appUserPass"),
    userRoles = Seq("reader_role", "writer_role"), initRoles = true)
  private val grantSpecs = Seq(
    GrantSpec("db_admin_role", grants = Seq("ALL")),
    GrantSpec("reader_role", grants = Seq("SELECT", "SHOW"),
      databases = Seq("main"), replaceGrants = true),
    GrantSpec("writer_role", grants = Seq("INSERT", "UPDATE", "OPTIMIZE"),
      databases = Seq("main"), replaceGrants = true))

  test("playbook replay: users, grants, idempotence, teardown") {
    val catalog = SecurityCatalog.inMemory(spark)
    val engine = new ReconcileEngine(catalog)

    // -- create users (playbook task 1) --
    val r1 = engine.usersModule(dbAdmin)
    assert(r1.changed)
    assert(r1.runQueries == Seq(
      s"CREATE USER 'db_admin' IDENTIFIED WITH sha256_hash BY '$dbAdminHash'",
      "CREATE ROLE IF NOT EXISTS db_admin_role",
      "GRANT db_admin_role to 'db_admin'"))
    assert(r1.userStatus("user_exists") == false)
    assert(r1.userStatus("user_has_roles") == false)

    val r2 = engine.usersModule(appUser)
    assert(r2.changed)
    assert(r2.runQueries == Seq(
      s"CREATE USER 'app_user' IDENTIFIED WITH sha256_hash BY '${sha256("appUserPass")}'",
      "CREATE ROLE IF NOT EXISTS reader_role",
      "CREATE ROLE IF NOT EXISTS writer_role",
      "GRANT reader_role, writer_role to 'app_user'"))

    // -- apply grants (playbook task 2) --
    val g = grantSpecs.map(engine.grantsModule(_))
    assert(g.forall(_.changed))
    assert(g.map(_.runQueries) == Seq(
      Seq("GRANT ALL on default.* to 'db_admin_role'"),
      Seq("GRANT SELECT, SHOW on main.* to 'reader_role' WITH REPLACE OPTION"),
      Seq("GRANT INSERT, UPDATE, OPTIMIZE on main.* to 'writer_role' WITH REPLACE OPTION")))
    assert(g.forall(_.msg.contains("GRANTS EXECUTED")))

    // -- catalog state after apply --
    val st = catalog.state
    assert(st.users.map(_.name).sorted == Seq("app_user", "db_admin"))
    assert(st.users.forall(_.authType == "sha256_hash"))
    assert(st.roles.map(_.name).sorted ==
      Seq("db_admin_role", "reader_role", "writer_role"))
    assert(st.roleGrants.map(rg => (rg.userName, rg.grantedRoleName)).toSet == Set(
      ("db_admin", "db_admin_role"), ("app_user", "reader_role"),
      ("app_user", "writer_role")))
    assert(st.grants.map(pg => (pg.grantee, pg.privilege, pg.database, pg.table)).toSet == Set(
      ("db_admin_role", "ALL", "default", "*"),
      ("reader_role", "SELECT", "main", "*"), ("reader_role", "SHOW", "main", "*"),
      ("writer_role", "INSERT", "main", "*"), ("writer_role", "UPDATE", "main", "*"),
      ("writer_role", "OPTIMIZE", "main", "*")))

    // -- O1 idempotence: users re-run plans nothing --
    val r1b = engine.usersModule(dbAdmin)
    assert(!r1b.changed && r1b.runQueries.isEmpty)
    assert(r1b.userStatus("user_exists") == true)
    assert(r1b.userStatus("user_has_roles") == true)
    val r2b = engine.usersModule(appUser)
    assert(!r2b.changed && r2b.runQueries.isEmpty)

    // grants path re-emits unconditionally (the reference never probes
    // privileges) but the catalog state must not change.
    val g2 = engine.grantsModule(grantSpecs.head)
    assert(g2.changed)
    assert(catalog.state.grants == st.grants)

    // -- teardown (playbook tag drop-users): quirk §8-Q11 result shape --
    val d1 = engine.usersModule(dbAdmin.copy(userState = "absent"))
    assert(d1.changed)
    assert(d1.doc("query") == "DROP USER 'db_admin'")
    assert(!d1.doc.contains("run_queries") && !d1.doc.contains("user_status"))
    val d1b = engine.usersModule(dbAdmin.copy(userState = "absent"))
    assert(!d1b.changed && d1b.doc("user_exists") == false)
    // DROP USER cascades nothing (D3): role grants survive the user.
    assert(catalog.state.roleGrants.exists(_.userName == "db_admin"))
  }

  test("quota and profile branches plan D10/D11 with probe-before-write gates") {
    val catalog = SecurityCatalog.inMemory(spark)
    // quotas are provisioned out-of-band (system.quotas is probe-only in
    // the reference; ALTER of a missing quota raises DB::Exception)
    catalog.bootstrap(graft.catalog.CatalogState(
      quotas = Seq(graft.catalog.Quota("q1", Nil))))
    val engine = new ReconcileEngine(catalog)
    val spec = UserSpec("quser", userPassword = "pw",
      userQuota = "q1", userProfile = "p1")
    val r = engine.usersModule(spec)
    assert(r.runQueries == Seq(
      "CREATE USER 'quser' IDENTIFIED WITH sha256_password BY 'pw'",
      "ALTER QUOTA q1 to quser",
      "ALTER USER quser SETTINGS PROFILE p1"))
    // password stored hashed, never in the clear
    assert(catalog.state.users.head.authValue == sha256("pw"))
    assert(catalog.state.quotas == Seq(graft.catalog.Quota("q1", Seq("quser"))))

    // second run: gates hold (user in quota list, profile present)
    val r2 = engine.usersModule(spec)
    assert(!r2.changed && r2.runQueries.isEmpty)
    assert(r2.userStatus("user_has_quota") == true)
    assert(r2.userStatus("user_has_profile") == true)

    // §8-Q6: append-no-dedup — second member joins the rewritten list
    val r3 = engine.usersModule(UserSpec("quser2", userPassword = "pw2", userQuota = "q1"))
    assert(r3.runQueries.contains("ALTER QUOTA q1 to quser, quser2"))
  }

  test("§8-Q12: ServerException surfaces as the DB::Exception match LIST, not a string") {
    // reachable through the module: quota branch plans ALTER QUOTA on a
    // quota the server doesn't have → DB::Exception → usersModule's
    // handler mirrors re.findall(r'DB::Exception.+\.', err.message)
    // (clickhouse_users.py:324-325)
    val catalog = SecurityCatalog.inMemory(spark)
    val engine = new ReconcileEngine(catalog)
    val r = engine.usersModule(
      UserSpec("u1", userPassword = "pw", userQuota = "no_such_quota"))
    assert(r.failed)
    assert(r.doc("msg") ==
      List("DB::Exception: There is no quota `no_such_quota` in user directories."))
    // sequential apply, like the server: the CREATE USER that preceded
    // the failing ALTER persists (a re-run probes user_exists=true)
    assert(catalog.state.users.map(_.name) == Seq("u1"))
  }

  test("catalog rejects duplicate CREATE USER through the raw-DCL path") {
    val catalog = SecurityCatalog.inMemory(spark)
    val stmt = "CREATE USER 'dup' IDENTIFIED WITH sha256_password BY 'x'"
    assert(catalog.applySql(Seq(stmt)).isRight)
    val e = intercept[graft.catalog.ServerException] {
      catalog.applySql(Seq(stmt))
    }
    assert(e.getMessage.contains("DB::Exception: User `dup` already exists."))
    // failed batch did not append a duplicate row
    assert(catalog.state.users.count(_.name == "dup") == 1)
  }

  test("playbook YAML vars lower to the exact module specs the replay uses") {
    val (users, grants) = graft.sources.PlaybookYaml.specs(
      graft.sources.PlaybookYaml.resourceText())
    assert(users == Seq(dbAdmin, appUser)) // hash-always + init_roles=true
    assert(grants == grantSpecs)
  }

  test("playbook YAML: top-level scalar vars never merge into the last list item") {
    val text =
      """clickhouse_user: 'default'
        |clickhouse_sql_users:
        |  - user_name: 'u1'
        |    user_password: 'p'
        |clickhouse_port: 9000
        |clickhouse_grants:
        |  - grantee_name: 'r1'
        |    grants: [SELECT]
        |clickhouse_secure_connect: false
        |""".stripMargin
    val (users, grants) = graft.sources.PlaybookYaml.parseVars(text)
    assert(users == Seq(Map("user_name" -> "u1", "user_password" -> "p")))
    assert(grants == Seq(Map("grantee_name" -> "r1", "grants" -> Seq("SELECT"))))
  }

  test("check mode: prospective plan reported, changed=false, catalog untouched (§8-Q5)") {
    val catalog = SecurityCatalog.inMemory(spark)
    val engine = new ReconcileEngine(catalog)
    val r = engine.usersModule(appUser, checkMode = true)
    assert(!r.changed)
    assert(r.runQueries.nonEmpty) // improved dry run: plan IS reported
    assert(catalog.state.users.isEmpty)
  }

  test("quirk Q1: create without password or hash fails cleanly (reference crashes)") {
    val engine = new ReconcileEngine(SecurityCatalog.inMemory(spark))
    val r = engine.usersModule(UserSpec("nopw"))
    assert(r.failed)
    assert(r.msg.get.contains("user_password"))
  }

  test("users module rejects password+hash together and unknown states") {
    val engine = new ReconcileEngine(SecurityCatalog.inMemory(spark))
    val both = engine.usersModule(UserSpec("u", userPassword = "a", userPasswordHash = "b"))
    assert(both.failed && both.msg.get ==
      "Only one password type can be set: 'user_password' or 'user_password_hash'")
    val bad = engine.usersModule(UserSpec("u", userPassword = "a", userState = "frozen"))
    assert(bad.failed && bad.msg.get ==
      "Only {'present', 'absent'} states are supported by this module")
  }

  test("role grants path: revoke intersect, replace, missing grantee (§8-Q2)") {
    val catalog = SecurityCatalog.inMemory(spark)
    val engine = new ReconcileEngine(catalog)
    engine.usersModule(UserSpec("u1", userPassword = "pw",
      userRoles = Seq("r1", "r2"), initRoles = true))

    // §8-Q2: grantee must exist as a user; clean failure, not a NameError
    val miss = engine.grantsModule(GrantSpec("ghost", grantRoles = Seq("r1")))
    assert(miss.failed && miss.msg.get == "'ghost' user does not exist")

    // J2: revoke only the roles currently held
    val rev = engine.grantsModule(
      GrantSpec("u1", grantRoles = Seq("r1", "r9"), revokeGrants = true))
    assert(rev.runQueries == Seq("REVOKE r1 from 'u1'"))
    assert(catalog.state.roleGrants.map(_.grantedRoleName) == Seq("r2"))
    // quirk: revoke path carries no user_status (clickhouse_grants.py:223)
    assert(!rev.doc.contains("user_status"))

    // D6: replace emits even when all roles are held
    val rep = engine.grantsModule(
      GrantSpec("u1", grantRoles = Seq("r2"), replaceGrants = true))
    assert(rep.runQueries == Seq("GRANT r2 to 'u1' WITH REPLACE OPTION"))
    assert(catalog.state.roleGrants.map(_.grantedRoleName) == Seq("r2"))
  }

  test("privilege grants: allowlist validation fails whole call on first miss (O4)") {
    val engine = new ReconcileEngine(SecurityCatalog.inMemory(spark))
    val r = engine.grantsModule(GrantSpec("g1", grants = Seq("SELECT", "FLY", "ALSO_BAD")))
    assert(r.failed)
    assert(r.doc("error").toString.startsWith("FLY not in applicable grants: CREATE FUNCTION,"))
    assert(engine.catalog.state.grants.isEmpty) // nothing applied
    // case-fidelity: upper() admits any case of listed grants…
    assert(!engine.grantsModule(GrantSpec("g1", grants = Seq("select"))).failed)
    // …but dictGet only via the exact-case carve-out
    assert(!engine.grantsModule(GrantSpec("g1", grants = Seq("dictGet"))).failed)
    assert(engine.grantsModule(GrantSpec("g1", grants = Seq("DICTGET"))).failed)
  }

  test("privilege grants: db×table expansion with first-(0,0)-pair REPLACE (§8-Q3)") {
    val catalog = SecurityCatalog.inMemory(spark)
    val engine = new ReconcileEngine(catalog)
    val r = engine.grantsModule(GrantSpec("g1", grants = Seq("SELECT"),
      databases = Seq("main", "dicts"), tables = Seq("t1", "t2"),
      replaceGrants = true))
    assert(r.runQueries == Seq(
      "GRANT SELECT on main.t1 to 'g1' WITH REPLACE OPTION",
      "GRANT SELECT on main.t2 to 'g1'",
      "GRANT SELECT on dicts.t1 to 'g1'",
      "GRANT SELECT on dicts.t2 to 'g1'"))
    assert(catalog.state.grants.size == 4)

    // revoke path mirrors the expansion
    val rv = engine.grantsModule(GrantSpec("g1", grants = Seq("SELECT"),
      databases = Seq("main", "dicts"), tables = Seq("t1", "t2"),
      revokeGrants = true))
    assert(rv.runQueries.head == "REVOKE SELECT on main.t1 from 'g1'")
    assert(catalog.state.grants.isEmpty)
  }

  test("grants module: mutual exclusion and empty-spec failures") {
    val engine = new ReconcileEngine(SecurityCatalog.inMemory(spark))
    val both = engine.grantsModule(
      GrantSpec("g", grants = Seq("SELECT"), grantRoles = Seq("r")))
    assert(both.failed && both.msg.get ==
      "Only one of parameters 'grant_roles' OR 'grants' must be defined.")
    val none = engine.grantsModule(GrantSpec("g"))
    assert(none.failed && none.msg.get == "No any grants or roles are defined")
  }

  test("catalog parquet persistence round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    val c1 = SecurityCatalog.at(spark, dir)
    val engine = new ReconcileEngine(c1)
    engine.usersModule(UserSpec("pu", userPassword = "pw",
      userRoles = Seq("pr"), initRoles = true, userQuota = "pq", userProfile = "pp"))
    val c2 = SecurityCatalog.at(spark, dir) // fresh load from parquet
    assert(c2.state.users == c1.state.users)
    assert(c2.state.roleGrants == c1.state.roleGrants)
    assert(c2.state.quotas == c1.state.quotas)
    assert(c2.state.profileElements == c1.state.profileElements)
    // a fresh engine over the reloaded catalog sees converged state
    val r = new ReconcileEngine(c2).usersModule(UserSpec("pu", userPassword = "pw",
      userRoles = Seq("pr"), userQuota = "pq", userProfile = "pp"))
    assert(!r.changed)
  }
}
