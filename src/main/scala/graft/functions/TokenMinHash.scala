package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One MinHash signature component: the minimum of
  * `xxhash64(token, seed)` over a string's space-split tokens —
  * byte-identical to the declarative
  * `aggregate(array_distinct(split(text, ' ')), MAX_LONG,
  * (a, x) -> least(a, xxhash64(x, seed)))`
  * (RewriteEquivalenceSpec proves it; `array_distinct` is dropped
  * because duplicates cannot change a minimum), but computed as one
  * compiled byte scan instead of an interpreted fold that re-splits
  * the text per signature component. Hashing replicates Spark's
  * variadic `xxhash64(x, seed)` exactly: the running XXH64 starts at
  * 42, folds the token's UTF-8 bytes, then folds the seed as a LONG.
  * Tokens are `split(' ')` tokens — empty tokens kept, and every
  * string has ≥ 1 token, so the fold is never empty. NULL in → NULL
  * out (the declarative chain's propagation). Stream-safe like any
  * expression — NearDupStream runs it on a streaming frame. */
case class TokenMinHash(child: Expression, seed: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "token_minhash"

  override protected def nullSafeEval(input: Any): Any =
    TokenMinHash.compute(input.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenMinHash.compute($c, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenMinHash = copy(child = newChild)
}

object TokenMinHash {
  /** Shared by interpreted eval and generated code (static forwarder —
    * must not be named `eval`, see ShingleHash64). The seed folds as an
    * INTEGER (the SQL literal's type in `xxhash64(x, 3)`), which XXH64
    * routes through its 32-bit-input path — using LongType here
    * produces different hashes. */
  def compute(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    val len = bytes.length
    var mn = Long.MaxValue
    var start = 0
    var p = 0
    while (p <= len) {
      if (p == len || bytes(p) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, p - start)
        val h = XxHash64Function.hash(java.lang.Integer.valueOf(seed.toInt),
          IntegerType, XxHash64Function.hash(tok, StringType, 42L))
        if (h < mn) mn = h
        start = p + 1
      }
      p += 1
    }
    mn
  }
}
