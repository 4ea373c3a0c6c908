package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR: one row per overlapping word n-gram of a
  * space-tokenized string — the workhorse under the per-document text
  * keys (bigram LM scoring, repetition stats, span sharing,
  * decontamination). Byte-identical to the declarative
  * `explode(transform(sequence(1, size(split(text,' ')) - n + 1),
  * i -> concat_ws(' ', slice(split(text,' '), i, n))))`
  * (RewriteEquivalenceSpec proves it on the corpus and on adversarial
  * strings), but ~an order of magnitude cheaper: the declarative form
  * routes every gram through INTERPRETED higher-order-function lambdas
  * (split → transform → slice → concat_ws, each allocating), while
  * this is one compiled byte scan per row and one byte-slice per gram.
  *
  * Correctness note on the byte scan: Spark's `split(text, ' ')` keeps
  * empty tokens, and rejoining any n CONSECUTIVE tokens with single
  * spaces reproduces exactly the original byte span from the first
  * token's start to the last token's end (the separators being single
  * 0x20 bytes, which never occur inside a multi-byte UTF-8 sequence) —
  * so gram k IS `bytes[start(k) .. end(k+n-1))`, no per-token strings
  * ever materialize. NULL and shorter-than-n inputs generate zero
  * rows. */
case class WordGramGenerator(child: Expression, n: Int)
  extends UnaryExpression with CollectionGenerator {
  require(n >= 1, s"gram width must be >= 1, got $n")

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType =
    ArrayType(StringType, containsNull = false)
  override def elementSchema: StructType =
    new StructType().add("g", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got " +
        child.dataType.simpleString)

  override def prettyName: String = "word_grams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = WordGramGenerator.compute(
      child.eval(input).asInstanceOf[UTF8String], n)
    (0 until arr.numElements()).iterator
      .map(i => InternalRow(arr.getUTF8String(i)))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.WordGramGenerator.compute(
          ${childGen.isNull} ? null : ${childGen.value}, $n);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordGramGenerator = copy(child = newChild)
}

object WordGramGenerator {
  private val Empty = new GenericArrayData(new Array[AnyRef](0))

  /** Word n-gram array of `s` (split-on-single-space semantics, empty
    * tokens kept — see class doc). Static forwarder target for the
    * generated code. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    if (s == null) return Empty
    val bytes = s.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') spaces += 1
      i += 1
    }
    val numTok = spaces + 1
    val cnt = numTok - n + 1
    if (cnt <= 0) return Empty
    val starts = new Array[Int](numTok)
    val ends = new Array[Int](numTok)
    var t = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = len
    val out = new Array[AnyRef](cnt)
    var k = 0
    while (k < cnt) {
      val from = starts(k)
      out(k) = UTF8String.fromBytes(bytes, from, ends(k + n - 1) - from)
      k += 1
    }
    new GenericArrayData(out)
  }
}
