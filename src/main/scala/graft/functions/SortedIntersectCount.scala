package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd |A ∩ B| over two SORTED arrays via a single merge scan —
  * O(|A| + |B|), inside the whole-stage-codegen loop. Supports
  * `array<long>` (the hot path: primitive compares, ZERO allocation)
  * and `array<string>` (UTF8String binary compares — correct, but each
  * element access allocates a UTF8String wrapper, measured ~1 µs per
  * 10×10 scan vs ~0.1 µs for longs; prefer hashing tokens to 64-bit
  * fingerprints upstream and intersecting those). Semantically equal
  * to `size(array_intersect(a, b))` for null-free, duplicate-free,
  * ascending arrays (exactly what `sort_array(collect_set(…))` /
  * `sort_array(array_distinct(…))` produce); callers own that
  * precondition. The builtin ArrayIntersect instead builds a hash set
  * per evaluated ROW — measured on the sf0.1 near-dup verify stage
  * (9.8 M candidate pairs, ~3 evals each after predicate pushdown):
  * 60+ s → ~2 s for the long-fingerprint merge.
  *
  * Callers should also write threshold predicates with a SINGLE
  * occurrence of this expression — `(100+τ)·inter ≥ τ·(|A|+|B|)`, not
  * `100·inter ≥ τ·(|A|+|B|−inter)` — because Catalyst pushes the
  * filter into the join residual by SUBSTITUTION: every textual
  * occurrence is a separate per-row evaluation.
  *
  * SURVEY §7.5 preference order: (a) builtins can't express a sorted
  * merge; (b) custom codegen Expression — this. The merge loop is
  * emitted inline (no companion helper — avoids the Scala static-
  * forwarder/Janino trap documented at ShingleHash64.scala:48).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case ArrayType(LongType, _) => true
      case _ => false
    }) && left.dataType.asInstanceOf[ArrayType].elementType ==
      right.dataType.asInstanceOf[ArrayType].elementType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> or two array<long>, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    if (elemType == LongType) {
      while (i < na && j < nb) {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { cnt += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      val body = if (elemType == LongType)
        s"""
           |long ${c}x = $a.getLong($i);
           |long ${c}y = $b.getLong($j);
           |if (${c}x == ${c}y) { $cnt++; $i++; $j++; }
           |else if (${c}x < ${c}y) { $i++; } else { $j++; }
         """.stripMargin
      else
        s"""
           |int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |if ($c == 0) { $cnt++; $i++; $j++; }
           |else if ($c < 0) { $i++; } else { $j++; }
         """.stripMargin
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  $body
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
