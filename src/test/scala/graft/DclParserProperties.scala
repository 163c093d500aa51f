package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.plans._

/** parse(render) == statement for generated statements across the whole
  * grammar — names drawn from the identifier shapes the reference
  * emits (unquoted role/quota/profile tokens, quoted user names). */
object DclParserProperties extends Properties("dclparser") {

  private val ident: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield "x" + cs.mkString // leading letter, never empty

  private val idents: Gen[List[String]] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, ident))

  private val privs: Gen[List[String]] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(graft.engine.GrantTaxonomy.applicableGrants))).map(_.distinct)

  private val anyStatement: Gen[DdlStatement] = Gen.oneOf(
    Gen.zip(ident, ident).map { case (u, p) => CreateUserWithPassword(u, p) },
    Gen.zip(ident, ident).map { case (u, h) => CreateUserWithHash(u, h) },
    ident.map(DropUser(_)),
    ident.map(CreateRoleIfNotExists(_)),
    Gen.zip(idents, ident, Gen.oneOf(true, false)).map { case (rs, u, rep) =>
      GrantRolesTo(rs, u, rep) },
    Gen.zip(ident, ident).map { case (r, u) => RevokeRoleFrom(r, u) },
    Gen.zip(privs, ident, ident, ident, Gen.oneOf(true, false)).map {
      case (ps, db, t, g, rep) => GrantPrivilegesOn(ps, db, t, g, rep) },
    Gen.zip(privs, ident, ident, ident).map {
      case (ps, db, t, g) => RevokePrivilegesOn(ps, db, t, g) },
    Gen.zip(ident, idents).map { case (q, ms) => AlterQuotaMembers(q, ms) },
    Gen.zip(ident, ident).map { case (u, p) => AlterUserProfile(u, p) })

  property("parse(render) round-trips the full grammar") = forAll(anyStatement) { s =>
    Prop(DclParser.parse(s.render) == Right(s)) :| s"rendered: ${s.render}"
  }
}
