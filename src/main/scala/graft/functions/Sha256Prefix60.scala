package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object GraftHash {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-256"))

  /** Top 60 bits of sha256(s ++ seedSuffix) — numerically identical to
    * the portable SQL construction
    * `conv(substr(sha2(concat(s, seed), 256), 1, 15), 16, 10)`:
    * 15 hex digits are the first 60 bits big-endian. */
  /** Lowercase-hex sha256 of a UTF-8 string — THE sha256-hex spelling
    * (catalog password hashing, playbook spec lowering, fixtures). */
  def sha256Hex(s: String): String = {
    val d = md.get(); d.reset()
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def sha256Prefix60(s: UTF8String, seedSuffix: Array[Byte]): Long = {
    val d = md.get(); d.reset()
    d.update(s.getBytes)
    d.update(seedSuffix)
    val h = d.digest()
    val top =
      ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8)  |  (h(7) & 0xffL)
    top >>> 4
  }
}

/** Native Catalyst expression for the pipeline's hottest scalar: the
  * 60-bit seeded content hash (minhash bases, simhash token hashes,
  * LSH band keys). Replaces a 5-expression chain
  * (concat→sha2→substring→conv→cast) that allocated a hex string and a
  * decimal string per call with one digest into a thread-local
  * MessageDigest. Implements doGenCode, so it stays inside
  * whole-stage codegen when used outside lambda contexts; inside
  * higher-order functions the interpreted eval path hits the same
  * static kernel.
  *
  * The DuckDB oracle spelling is unchanged —
  * `('0x'||substr(sha256(x||seed),1,15))::BIGINT` — because the value
  * is bit-identical to the old construction (pinned by PipelineSpec).
  */
case class Sha256Prefix60(child: Expression, seed: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "sha256_prefix60"

  private lazy val seedBytes: Array[Byte] = seed.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.sha256Prefix60(input.asInstanceOf[UTF8String], seedBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seedBytes", seedBytes, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.sha256Prefix60($c, $seedRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Sha256Prefix60 =
    copy(child = newChild)
}

object Sha256Prefix60 {
  /** Column builder: hash of (input ++ seedSuffix). */
  def column(c: Column, seedSuffix: String): Column =
    graftshim.column(Sha256Prefix60(graftshim.expression(c), seedSuffix))
}
