package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native span-removal reconstruction for the ExactSubstr family
  * (reference behavior: Lee et al. 2022, arXiv:2107.06499 — duplicate
  * token windows are cut wholesale from the surviving text).
  *
  * Given a document's token array and the SORTED start positions of
  * its marked duplicate windows of length `l`, a token at position `p`
  * is removed iff some marked window covers it — iff the largest start
  * ≤ `p` is ≥ `p - l + 1`. Both expressions walk tokens and starts
  * with one two-pointer merge (O(tokens + starts) per document, no
  * allocation beyond the output), replacing the previous relational
  * form (posexplode → join → per-document RANGE window → collect_list
  * regroup), which paid TWO corpus-sized shuffles (the token explode's
  * window repartition and the regroup) for what is a per-row
  * computation once the marked starts are grouped per document. At
  * 100 TB that's the difference between a map-only reconstruction pass
  * and reshuffling every token in the corpus twice.
  *
  * Two sibling expressions instead of one struct-returning expression:
  * each keeps the scalar codegen contract (`nullSafeCodeGen` writing a
  * primitive/UTF8String), and the double walk over an already-decoded
  * array is cheaper than materializing an InternalRow per document.
  * [[SpanRemoveClean]] returns the surviving tokens joined with a
  * single space; [[SpanRemoveCount]] returns how many tokens were cut.
  * Bit-identical to the relational form (same order, same " " joiner,
  * empty string when everything is cut). */
abstract class SpanRemoveBase extends BinaryExpression {
  def l: Int

  // no body-level require: an initializer assertion runs again during
  // task-side Java deserialization and aborts instance creation
  override def checkInputDataTypes(): TypeCheckResult =
    if (l < 2) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires window length >= 2, got $l")
    else (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got " +
          s"${a.simpleString} and ${b.simpleString}")
    }
}

/** Surviving tokens (those no marked window covers) joined by " ". */
case class SpanRemoveClean(left: Expression, right: Expression, l: Int)
  extends SpanRemoveBase {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_span_clean"

  override def nullSafeEval(t: Any, s: Any): Any =
    SpanRemove.clean(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      s"""
         |${ev.value} = graft.plans.SpanRemove.clean($t, $s, $l);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanRemoveClean =
    copy(left = newLeft, right = newRight)
}

/** Number of tokens cut (covered by at least one marked window). */
case class SpanRemoveCount(left: Expression, right: Expression, l: Int)
  extends SpanRemoveBase {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_span_count"

  override def nullSafeEval(t: Any, s: Any): Any =
    SpanRemove.count(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      s"""
         |${ev.value} = graft.plans.SpanRemove.count($t, $s, $l);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanRemoveCount =
    copy(left = newLeft, right = newRight)
}

object SpanRemove {
  /** Two-pointer coverage walk shared by both expressions: calls
    * `kept`/`cut` in position order. `starts` MUST be sorted ascending
    * (the caller groups with sort_array) — the invariant that makes
    * "largest start ≤ p" the head of the advanced pointer. */
  @inline private def walk(nToks: Int, starts: ArrayData, l: Int)
                          (kept: Int => Unit, cut: Int => Unit): Unit = {
    val m = starts.numElements()
    var j = 0
    var p = 0
    while (p < nToks) {
      while (j < m && starts.getInt(j) <= p) j += 1
      if (j > 0 && starts.getInt(j - 1) >= p - l + 1) cut(p) else kept(p)
      p += 1
    }
  }

  def clean(toks: ArrayData, starts: ArrayData, l: Int): UTF8String = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    walk(n, starts, l)(p => out.add(toks.getUTF8String(p)), _ => ())
    UTF8String.concatWs(SpaceSep, out.toArray(new Array[UTF8String](0)): _*)
  }

  def count(toks: ArrayData, starts: ArrayData, l: Int): Long = {
    var c = 0L
    walk(toks.numElements(), starts, l)(_ => (), _ => c += 1L)
    c
  }

  private val SpaceSep = UTF8String.fromString(" ")
}
