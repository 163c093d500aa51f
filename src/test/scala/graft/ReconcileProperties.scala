package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.catalog.SecurityCatalog
import graft.engine._

/** SURVEY §5.4 property suite. Each property builds a fresh in-memory
  * catalog; Spark probe jobs are cheap but not free, so the run count is
  * bounded (the properties are structural, not numeric — 10 diverse
  * cases each is plenty). */
object ReconcileProperties extends Properties("reconcile") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private def spark = SparkTestSession.spark
  private def freshEngine() = new ReconcileEngine(SecurityCatalog.inMemory(spark))

  private val genName: Gen[String] =
    Gen.chooseNum(3, 10).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val names: Gen[List[String]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genName)).map(_.distinct)
  private val validGrants: Gen[List[String]] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(GrantTaxonomy.applicableGrants))).map(_.distinct)

  // (a) apply is idempotent: apply(apply(s, spec), spec).changed == false
  property("usersModule idempotent") = forAll(genName, genName, names) { (u, pw, roles) =>
    val e = freshEngine()
    val spec = UserSpec(u, userPassword = pw, userRoles = roles, initRoles = true)
    e.usersModule(spec)
    val second = e.usersModule(spec)
    Prop(!second.changed && second.runQueries.isEmpty) :| s"second=$second"
  }

  // (b) revoke ∘ grant == identity on role_grants
  property("revoke after grant restores role_grants") = forAll(genName, genName, names) {
    (u, pw, roles) =>
      val e = freshEngine()
      e.usersModule(UserSpec(u, userPassword = pw))
      val before = e.catalog.state.roleGrants
      e.grantsModule(GrantSpec(u, grantRoles = roles, initRoles = true))
      e.grantsModule(GrantSpec(u, grantRoles = roles, revokeGrants = true))
      Prop(e.catalog.state.roleGrants == before)
  }

  // (c) replace-grant is last-writer-wins regardless of prior state
  property("replace grants = last writer wins") = forAll(genName, validGrants, validGrants) {
    (g, prior, next) =>
      val e = freshEngine()
      e.grantsModule(GrantSpec(g, grants = prior))
      e.grantsModule(GrantSpec(g, grants = next, replaceGrants = true))
      val held = e.catalog.state.grants.filter(_.grantee == g).map(_.privilege).toSet
      Prop(held == next.toSet) :| s"held=$held next=$next"
  }

  // (d) db×table expansion: |dbs|×|tbls| statements, REPLACE on (0,0) only
  property("expansion size and first-pair REPLACE") = forAll(genName, names, names) {
    (g, dbs, tbls) =>
      val e = freshEngine()
      val r = e.grantsModule(GrantSpec(g, grants = Seq("SELECT"),
        databases = dbs, tables = tbls, replaceGrants = true))
      val qs = r.runQueries
      Prop(
        qs.size == dbs.size * tbls.size &&
        qs.head.endsWith(" WITH REPLACE OPTION") &&
        qs.tail.forall(!_.endsWith(" WITH REPLACE OPTION")))
  }

  // (e) any grant outside the 32-entry allowlist is rejected before mutation
  property("invalid grant rejected, no mutation") = forAll(genName, genName, validGrants) {
    (g, bogus, valid) =>
      GrantTaxonomy.isInvalid(bogus) ==> {
        val e = freshEngine()
        val r = e.grantsModule(GrantSpec(g, grants = valid ++ Seq(bogus)))
        Prop(r.failed && e.catalog.state.grants.isEmpty)
      }
  }
}
