package graft.functions

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the dedup pipeline's hottest per-document work:
  * tokenize → shingle → 60-bit hash → affine minhash. The portable HOF
  * spellings (split/transform/concat_ws/array_distinct trees) run
  * interpreted — higher-order functions never enter whole-stage codegen,
  * and the per-token expression-tree walk was the q18/q19 hot path (a
  * jstack of a stalled bench run showed 95+ s of single-thread CPU in
  * ConcatWs.eval/StringSplit.nullSafeEval). These kernels do the same
  * work in tight primitive loops; the wrapping expressions implement
  * doGenCode, so the whole path rides inside the generated stage.
  * Bit-parity with the HOF spellings is pinned in PipelineSpec. */
object TokenKernel {

  /** Exactly Spark's split(text, " ") (limit -1: trailing empties kept). */
  def tokens(s: UTF8String): Array[String] = s.toString.split(" ", -1)

  /** Unicode NFC normalization (java.text.Normalizer — the same
    * canonical composition DuckDB's nfc_normalize applies, which is
    * what makes the q102 gate cross-engine exact). Fast path: already-
    * normalized input (all-ASCII corpora in particular) returns the
    * input UTF8String with no String allocation beyond the check. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Per-token 60-bit seeded hashes (TextFunctions.baseHashes∘tokens). */
  def tokenHashes(s: UTF8String, seedSuffix: Array[Byte]): ArrayData = {
    val toks = tokens(s)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = GraftHash.sha256Prefix60(UTF8String.fromString(toks(i)), seedSuffix)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct k-token shingles, first-occurrence order — exactly
    * array_distinct(transform(sequence, i -> concat_ws(" ", slice)))
    * with the short-doc guard (TextFunctions.shingles). */
  def shingleStrings(s: UTF8String, k: Int): Array[String] = {
    val toks = tokens(s)
    if (toks.length < k) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  def shingles(s: UTF8String, k: Int): ArrayData = {
    val sh = shingleStrings(s, k)
    val out = new Array[AnyRef](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct-shingle 60-bit hashes (baseHashes∘shingles∘tokens). */
  def shingleHashes(s: UTF8String, k: Int, seedSuffix: Array[Byte]): ArrayData = {
    val sh = shingleStrings(s, k)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      out(i) = GraftHash.sha256Prefix60(UTF8String.fromString(sh(i)), seedSuffix)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sequential (positional, NON-distinct) k-gram 60-bit hashes — the
    * hash at index i covers tokens i..i+k-1, one entry per gram start,
    * duplicates kept. The winnowing tier's input: window selection
    * needs every position's hash, so the ShingleSet dedup would break
    * the algorithm. Empty for docs shorter than k tokens (same guard
    * as shingleStrings). */
  def posShingleHashes(s: UTF8String, k: Int, seedSuffix: Array[Byte]): ArrayData = {
    val toks = tokens(s)
    if (toks.length < k) return new GenericArrayData(Array.emptyLongArray)
    val n = toks.length - k + 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = GraftHash.sha256Prefix60(UTF8String.fromString(sb.toString), seedSuffix)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Left-to-right dot product of two double arrays. Null exactly when
    * the HOF spelling is null: a null element's product is null and
    * poisons the fold, and zip_with's padding on a length mismatch
    * does the same — so both cases return null here (boxed). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Differing-byte count of two ASCII bitstrings; excess length counts
    * as differing (zip_with null-padding parity). */
  def hammingBytes(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes; val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var d = math.abs(ab.length - bb.length)
    var i = 0
    while (i < n) { if (ab(i) != bb(i)) d += 1; i += 1 }
    d
  }

  /** All `count` affine minhashes of a base-hash array in one pass —
    * minhash_i = min over h of ((h mod P)*a_i + b_i) mod P
    * (TextFunctions.minhash, same P/a/b family). Null on empty input
    * (array_min of an empty array is null in the HOF spelling). */
  def affineMinhashes(hs: ArrayData, as: Array[Long], bs: Array[Long],
                      p: Long): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val count = as.length
    val mins = Array.fill[Long](count)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = hs.getLong(i) % p
      var j = 0
      while (j < count) {
        val v = (hm * as(j) + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

private[functions] trait StringInputExpr { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
}

/** tokenHashes / shingleHashes as one expression: k = 0 hashes each
  * whitespace token (simhash input); k >= 1 hashes the distinct
  * k-shingles (minhash input). */
case class HashTokens(child: Expression, k: Int, seed: String)
    extends UnaryExpression with StringInputExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_tokens"

  private lazy val seedBytes: Array[Byte] = seed.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (k <= 0) TokenKernel.tokenHashes(s, seedBytes)
    else TokenKernel.shingleHashes(s, k, seedBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seedBytes", seedBytes, "byte[]")
    val call =
      if (k <= 0) (c: String) => s"graft.functions.TokenKernel.tokenHashes($c, $seedRef)"
      else (c: String) => s"graft.functions.TokenKernel.shingleHashes($c, $k, $seedRef)"
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): HashTokens =
    copy(child = newChild)
}

object HashTokens {
  def column(c: Column, k: Int, seed: String): Column =
    graftshim.column(HashTokens(graftshim.expression(c), k, seed))
}

/** Unicode NFC normalization as a codegen'd kernel — the first text
  * op in any cleaning pipeline (composed vs decomposed accents hash
  * and dedup differently; normalize BEFORE any fingerprint). Parity:
  * java.text.Normalizer NFC == DuckDB nfc_normalize (q102-gated). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with StringInputExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernel.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernel.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def column(c: Column): Column =
    graftshim.column(NfcNormalize(graftshim.expression(c)))
}

/** Distinct k-shingle strings (the LSH verification path's input). */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression with StringInputExpr {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernel.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernel.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  def column(c: Column, k: Int): Column =
    graftshim.column(ShingleSet(graftshim.expression(c), k))
}

/** Positional k-gram hashes (index = gram start, duplicates kept) —
  * the winnowing fingerprint tier's scan kernel. Same hash family and
  * tokenizer as HashTokens; only the dedup differs. */
case class ShingleSeqHashes(child: Expression, k: Int, seed: String)
    extends UnaryExpression with StringInputExpr {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_shingle_seq"

  private lazy val seedBytes: Array[Byte] = seed.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    TokenKernel.posShingleHashes(input.asInstanceOf[UTF8String], k, seedBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seedBytes", seedBytes, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenKernel.posShingleHashes($c, $k, $seedRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSeqHashes =
    copy(child = newChild)
}

object ShingleSeqHashes {
  def column(c: Column, k: Int, seed: String): Column =
    graftshim.column(ShingleSeqHashes(graftshim.expression(c), k, seed))
}

/** Sequential-order dot product of two double arrays — bit-identical to
  * aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (s,v) -> s+v): same
  * multiplies, same left-to-right additions, so the DuckDB oracle's
  * list_reduce spelling needs no change. Null semantics also mirror the
  * HOF spelling: a null element or a length mismatch (zip_with null
  * padding) poisons the fold → NULL. Parity pinned in PipelineSpec. */
case class ArrayDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private val want = ArrayType(org.apache.spark.sql.types.DoubleType, false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.DoubleType, _),
            ArrayType(org.apache.spark.sql.types.DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got $other")
    }
  // null on null input, null element, or length mismatch (HOF parity)
  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.functions.TokenKernel.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  def column(a: Column, b: Column): Column =
    graftshim.column(ArrayDot(graftshim.expression(a), graftshim.expression(b)))
}

/** Hamming distance between two equal-length bitstrings (byte compare —
  * the strings are '1'/'0' ASCII). Parity with the portable spelling
  * aggregate(zip_with(split(a,''), split(b,''), …)): length mismatch
  * counts the excess as differing, matching zip_with's null padding. */
case class HammingBits(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "hamming_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenKernel.hammingBytes(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TokenKernel.hammingBytes($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingBits =
    copy(left = newLeft, right = newRight)
}

object HammingBits {
  def column(a: Column, b: Column): Column =
    graftshim.column(HammingBits(graftshim.expression(a), graftshim.expression(b)))
}

/** All affine minhashes over a base-hash array in one pass (replaces
  * `count` interpreted transform+array_min trees). */
case class AffineMinhashes(child: Expression, count: Int,
                           p: Long, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {
  require(as.length == count && bs.length == count)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got $other")
  }
  // null for empty input arrays (array_min parity)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "affine_minhashes"

  private lazy val aArr: Array[Long] = as.toArray
  private lazy val bArr: Array[Long] = bs.toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenKernel.affineMinhashes(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TokenKernel.affineMinhashes($c, $aRef, $bRef, ${p}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AffineMinhashes =
    copy(child = newChild)
}

object AffineMinhashes {
  def column(c: Column, count: Int, p: Long,
             as: Seq[Long], bs: Seq[Long]): Column =
    graftshim.column(AffineMinhashes(graftshim.expression(c), count, p, as, bs))
}
