package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted DISTINCT xxhash64 fingerprints of a string's character
  * n-shingles — the per-document set representation the n-gram Jaccard
  * verify consumes (SortedIntersectCount merge-scans two of these).
  * Byte-identical to the declarative
  * `sort_array(array_distinct(transform(sequence(1, length(text)-n+1),
  * i -> xxhash64(substring(text, i, n)))))` with the short-text guard
  * (RewriteEquivalenceSpec proves it, unicode included), but computed
  * as one compiled pass: the declarative form evaluates an INTERPRETED
  * lambda per shingle (~len(text) allocations/row) plus two more array
  * passes for distinct+sort. Hashing matches Spark's `xxhash64(...)`
  * exactly (XxHash64Function over the substring's UTF-8 bytes, seed
  * 42). NULL or shorter-than-n text yields the empty array (the CASE
  * guard's ELSE branch), never NULL. */
case class SortedShingleHashes(child: Expression, n: Int)
  extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sorted_shingle_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SortedShingleHashes.compute(
      child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.SortedShingleHashes.compute(
          ${childGen.isNull} ? null : ${childGen.value}, $n);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedShingleHashes = copy(child = newChild)
}

object SortedShingleHashes {
  private val Empty = new GenericArrayData(new Array[Long](0))

  /** Shared by interpreted eval and generated code (static forwarder —
    * the ShingleHash64 naming caveat applies: must not be `eval`). */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    if (s == null) return Empty
    val cnt = s.numChars() - n + 1
    if (cnt <= 0) return Empty
    val hs = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      // identical to SQL xxhash64(substring(text, i+1, n)): XXH64 over
      // the substring's UTF-8 bytes, seed 42
      hs(i) = XxHash64Function.hash(s.substringSQL(i + 1, n),
        StringType, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted run
    var w = 1
    i = 1
    while (i < cnt) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == cnt) hs else java.util.Arrays.copyOf(hs, w))
  }
}
