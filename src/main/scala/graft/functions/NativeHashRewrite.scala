package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the PORTABLE 60-bit hash spelling
  *
  *   cast(conv(substring(sha2(concat(x, '<seed>'), 256), 1, 15), 16, 10)
  *        as bigint)
  *
  * (and its no-seed form without the concat) into the native
  * `Sha256Prefix60` kernel — one digest, no hex-string → decimal-string
  * → long round-trip, and a codegen'd stage like any built-in.
  *
  * This is the engine-dialect contract in rule form: users (and the
  * DuckDB-parity oracle SQL) write the portable construction, the
  * engine recognizes it and substitutes the kernel, exactly the way a
  * native OLAP engine pattern-matches its hot intrinsics. Bit-equality
  * of the two spellings is pinned in PipelineSpec ("native
  * Sha256Prefix60 is bit-equal to the portable SQL construction"), so
  * the rewrite is a pure cost change. Injected via GraftExtensions
  * (injectOptimizerRule) so any session on a cluster gets it from
  * config; the rule only ever fires on the exact literal shape
  * (positions 1/15, bases 16/10, bit-length 256) — anything else is
  * left untouched. */
object NativeHashRewrite extends Rule[LogicalPlan] {

  private object PortableHash {
    /** Matches the conv(substring(sha2(...), 1, 15), 16, 10) core and
      * returns (input, seedSuffix). */
    def unapply(e: Expression): Option[(Expression, String)] = e match {
      case Conv(
          Substring(Sha2(inner, Literal(256, _)),
            Literal(1, _), Literal(15, _)),
          Literal(16, _), Literal(10, _), _) =>
        // the analyzer wraps sha2's string input in cast(... as binary)
        val unwrapped = inner match {
          case Cast(i, BinaryType, _, _) => i
          case i => i
        }
        unwrapped match {
          case Concat(Seq(x, Literal(seed: UTF8String, StringType))) =>
            Some((x, seed.toString))
          case x => Some((x, ""))
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ Cast(PortableHash(x, seed), LongType, _, _)
          if x.dataType == StringType && c.resolved =>
        Sha256Prefix60(x, seed)
    }
}
