package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native Catalyst expression for the k-function MinHash signature over
  * an array of 32-bit base hashes (stored in longs), with whole-stage
  * codegen.
  *
  * Semantically identical to the composable form
  * ([[graft.operators.DedupSuite.minhashSignatureFromHashes]]:
  * k × `array_min(transform(hs, x => (x*a+b) % p))`), which evaluates
  * interpreted and walks the hash array k times, allocating a
  * transformed copy each walk. This compiles to ONE fused pass: per
  * element, k affine updates into a primitive min table — no
  * allocation, no boxing, k× less traversal. Affine constants come
  * from the same fixed-seed generator, so signatures are bit-identical
  * to the composable form and the DuckDB oracle (d5) still reproduces
  * them.
  *
  * Empty input → null, matching `when(size(hs) > 0, ...)`. Input
  * values must lie in [0, 2^32) (the 32-bit base-hash domain): with
  * a < 2^30 the product stays under 2^62, overflow-free. */
case class MinhashSignature(child: Expression, k: Int)
  extends UnaryExpression {

  require(k > 0 && k <= 64, s"k must be in [1, 64], got $k")

  private val consts: Array[(Long, Long)] =
    graft.operators.DedupSuite.affineConsts(k).toArray
  private def p: Long = graft.operators.DedupSuite.MinhashP

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (x * consts(j)._1 + consts(j)._2) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val as = ctx.addReferenceObj("minhashA", consts.map(_._1), "long[]")
    val bs = ctx.addReferenceObj("minhashB", consts.map(_._2), "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val x = ctx.freshName("x")
      val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $x = $arr.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($x * $as[$j] + $bs[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
