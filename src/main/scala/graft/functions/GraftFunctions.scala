package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, Expression, ExpressionInfo}

/** SQL function surface for ClickHouse-dialect fidelity.
  *
  *  - `has(arr, x)` (clickhouse_users.py:179): zero-cost alias onto
  *    Catalyst's native ArrayContains (codegen'd, NOT a Scala UDF).
  *  - `sha256_prefix60(str, seedSuffix)`: SQL spelling of the native
  *    content-hash expression the pipeline uses (seedSuffix must be a
  *    literal).
  *
  * Two registration paths: `register(spark)` for an existing session
  * (QueryRunner does this), or `spark.sql.extensions=graft.GraftExtensions`
  * at session build — the deployment-config path for clusters.
  */
object GraftFunctions {

  type FunctionDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val hasFunction: FunctionDescriptor = (
    FunctionIdentifier("has"),
    new ExpressionInfo(classOf[ArrayContains].getName, "has"),
    (exprs: Seq[Expression]) => ArrayContains(exprs(0), exprs(1)))

  val sha256Prefix60Function: FunctionDescriptor = (
    FunctionIdentifier("sha256_prefix60"),
    new ExpressionInfo(classOf[Sha256Prefix60].getName, "sha256_prefix60"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "sha256_prefix60(str, seedSuffix) requires a literal seed")
      Sha256Prefix60(exprs(0), exprs(1).eval().toString)
    })

  /** SQL names for the pipeline's native kernels, so the extension
    * surface is reachable from pure `spark.sql` too. Literal-argument
    * positions (k, seed, count) must be foldable. */
  val simhash64Function: FunctionDescriptor = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "simhash64(tokenHashes) takes one argument")
      SimHash64(exprs.head)
    })

  val hashTokensFunction: FunctionDescriptor = (
    FunctionIdentifier("hash_tokens"),
    new ExpressionInfo(classOf[HashTokens].getName, "hash_tokens"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
        "hash_tokens(str, k, seedSuffix) requires literal k and seed")
      HashTokens(exprs(0), exprs(1).eval().toString.toInt, exprs(2).eval().toString)
    })

  val arrayDotFunction: FunctionDescriptor = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "array_dot(a, b) takes two arguments")
      ArrayDot(exprs(0), exprs(1))
    })

  val hammingBitsFunction: FunctionDescriptor = (
    FunctionIdentifier("hamming_bits"),
    new ExpressionInfo(classOf[HammingBits].getName, "hamming_bits"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "hamming_bits(a, b) takes two arguments")
      HammingBits(exprs(0), exprs(1))
    })

  val nfcNormalizeFunction: FunctionDescriptor = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "nfc_normalize(str) takes one argument")
      NfcNormalize(exprs(0))
    })

  val shingleSetFunction: FunctionDescriptor = (
    FunctionIdentifier("shingle_set"),
    new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "shingle_set(str, k) requires a literal k")
      ShingleSet(exprs(0), exprs(1).eval().toString.toInt)
    })

  /** `affine_minhashes(hashes, count)` — the pipeline's standard affine
    * MinHash family (TextFunctions.MinhashP / minhashA / minhashB baked
    * in, NOT caller-supplied): the SQL spelling must produce the SAME
    * signatures as the Scala operators or a SQL-composed LSH would
    * bucket differently than the persisted band stores built through
    * the Scala API. */
  val affineMinhashesFunction: FunctionDescriptor = (
    FunctionIdentifier("affine_minhashes"),
    new ExpressionInfo(classOf[AffineMinhashes].getName, "affine_minhashes"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "affine_minhashes(hashes, count) requires a literal count")
      val n = exprs(1).eval().toString.toInt
      import graft.pipeline.TextFunctions.{MinhashP, minhashA, minhashB}
      AffineMinhashes(exprs(0), n, MinhashP,
        (0 until n).map(minhashA), (0 until n).map(minhashB))
    })

  /** `money_sum(x, scale)` — the exact 128-bit money fold
    * (functions.MoneySum) on the SQL surface, so ad-hoc SQL gets the
    * same partitioning-independent revenue sums the Scala relational
    * tier uses (bit-identical to sum(CAST(x AS DECIMAL(18, scale)))
    * at a fraction of the per-row cost). The analyzer wraps the
    * returned AggregateFunction in its AggregateExpression. */
  val moneySumFunction: FunctionDescriptor = (
    FunctionIdentifier("money_sum"),
    new ExpressionInfo(classOf[MoneySum].getName, "money_sum"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "money_sum(x, scale) requires a literal scale")
      MoneySum(exprs(0), exprs(1).eval().toString.toInt)
    })

  val all: Seq[FunctionDescriptor] = Seq(
    hasFunction, sha256Prefix60Function,
    simhash64Function, hashTokensFunction, arrayDotFunction,
    hammingBitsFunction, nfcNormalizeFunction,
    shingleSetFunction, affineMinhashesFunction, moneySumFunction)

  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
