package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native Catalyst expression for n-gram shingle hashes over an array
  * of 32-bit token hashes: out[i] = rolling 31-polynomial combine of n
  * consecutive token hashes, masked to 32 bits per step.
  *
  * Bit-identical to the composable form
  * ([[graft.operators.DedupSuite.shingleHashesFromTokenHashes]]), which
  * evaluates interpreted (transform + inner fold, one boxed fold per
  * shingle). This compiles to one fused primitive loop. Fewer than n
  * tokens → EMPTY array (not null), matching the composable
  * `otherwise(array())`. */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1 && n <= 16, s"shingle width must be in [1, 16], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val len = th.numElements()
    val m = len - n + 1
    val out = new Array[Long](math.max(m, 0))
    var i = 0
    while (i < m) {
      var h = th.getLong(i)
      var j = 1
      while (j < n) {
        h = (h * 31 + th.getLong(i + j)) & 0xFFFFFFFFL
        j += 1
      }
      out(i) = h
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len"); val m = ctx.freshName("m")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      s"""
         |int $len = $arr.numElements();
         |int $m = $len - $n + 1;
         |long[] $out = new long[$m > 0 ? $m : 0];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 1; $j < $n; $j++) {
         |    $h = ($h * 31L + $arr.getLong($i + $j)) & 0xFFFFFFFFL;
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
