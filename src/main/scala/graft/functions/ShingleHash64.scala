package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Document fingerprinting (SURVEY north star "rolling hash"): polynomial
  * rolling hash over the UTF-8 bytes of a string, codegen'd.
  *
  *  - `k <= 0`: one 64-bit fingerprint of the whole document
  *    (h = h*31 + byte, wrapping — Java String.hashCode widened to 64 bit).
  *  - `k > 0`: the MINIMUM hash over all k-byte shingles (windows) — the
  *    winnowing-style shingle fingerprint used for near-dup sketching;
  *    two documents sharing their minimal k-shingle collide.
  *
  * No SQL oracle (iterative hashing is not expressible in DuckDB SQL);
  * covered by ExtOpsSpec against an independent Scala reference
  * implementation plus determinism/equality properties.
  */
case class ShingleHash64(child: Expression, k: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "shingle_hash64"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    ShingleHash64.hash(bytes, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHash64.hash($c.getBytes(), $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

object ShingleHash64 {
  /** Shared by interpreted eval and generated code. Must NOT be named
    * `eval`: the case class inherits Expression.eval(InternalRow), which
    * suppresses the companion's static forwarder, so generated Java code
    * calling `ShingleHash64.eval(byte[], int)` failed Janino compilation
    * and the whole stage silently fell back to interpreted mode. */
  def hash(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (k <= 0 || k >= n) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
      h
    } else {
      var minH = Long.MaxValue
      var start = 0
      while (start <= n - k) {
        var h = 0L
        var i = start
        while (i < start + k) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
        if (h < minH) minH = h
        start += 1
      }
      minH
    }
  }
}
