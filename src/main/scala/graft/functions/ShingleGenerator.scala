package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR (UDTF): emits one row per character
  * n-shingle of a string column — `ShingleGenerator(text, 5)` on
  * "abcdef" yields "abcde", "bcdef". This is the last rung of the
  * extension ladder the library demonstrates (SURVEY §2.10/§4): scalar
  * codegen Expression (DotProductF32, ShingleHash64,
  * SortedIntersectCount) → optimizer Rule (DotProductRewrite) →
  * whole-operator plan/strategy/exec (TopKPerGroup) → and here a
  * table-valued expression planned through Spark's own Generate node,
  * exactly like the builtin explode/posexplode family.
  *
  * Implemented as a [[CollectionGenerator]], so GenerateExec keeps it
  * INSIDE whole-stage codegen: doGenCode materializes the shingle
  * array and the surrounding generated loop iterates it — same
  * execution shape as `explode(transform(sequence(…)))` but without
  * building the intermediate lambda-expression tree, and reusable as a
  * first-class operator. NULL or shorter-than-n strings generate zero
  * rows (matching `explode` of an empty array). Positions are
  * character-based (`substringSQL`), the same semantics as the SQL
  * `substring` the declarative formulation uses.
  */
case class ShingleGenerator(child: Expression, n: Int)
  extends UnaryExpression with CollectionGenerator {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType =
    ArrayType(StringType, containsNull = false)
  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got " +
        child.dataType.simpleString)

  override def prettyName: String = "shingles"

  /** Interpreted row-emitting path (used when codegen is off). */
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) Nil
    else {
      val cnt = s.numChars() - n + 1
      if (cnt <= 0) Nil
      else (0 until cnt).iterator
        .map(i => InternalRow(s.substringSQL(i + 1, n)))
    }
  }

  /** Codegen path: evaluates to the shingle ArrayData; GenerateExec's
    * generated loop consumes it (the CollectionGenerator contract). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val arrCls = classOf[GenericArrayData].getName
    val uCls = classOf[UTF8String].getName
    val items = ctx.freshName("items")
    val cnt = ctx.freshName("cnt")
    val i = ctx.freshName("i")
    ev.copy(code = code"""
      ${childGen.code}
      int $cnt = 0;
      if (!${childGen.isNull}) {
        int ${cnt}_len = ${childGen.value}.numChars();
        if (${cnt}_len >= $n) $cnt = ${cnt}_len - $n + 1;
      }
      $uCls[] $items = new $uCls[$cnt];
      for (int $i = 0; $i < $cnt; $i++) {
        $items[$i] = ${childGen.value}.substringSQL($i + 1, $n);
      }
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        new $arrCls($items);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleGenerator = copy(child = newChild)
}
