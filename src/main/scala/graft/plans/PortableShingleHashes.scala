package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native Catalyst expression for the ENGINE-PORTABLE shingle hashes:
  * out[i] = hash32 of the n-gram string `tok[i] ++ " " ++ ... ++
  * tok[i+n-1]`, where hash32 = first 4 bytes (as unsigned 32-bit) of
  * `md5("0:" ++ shingle)` — exactly
  * `transform(shinglesFromTokens(toks, n), s => TextFunctions.hash32(s))`
  * ([[graft.functions.TextFunctions.hash32]] with salt 0), which the
  * DuckDB oracle reproduces as
  * `CAST(('0x' || substr(md5('0:' || s), 1, 8)) AS BIGINT)`.
  *
  * The composable form pays, PER SHINGLE, an interpreted lambda tree:
  * slice + concat_ws allocation, salt-prefix concat, md5 to a 32-char
  * hex string, substring, base-16 conv. This fuses the whole row into
  * one pass that feeds token bytes straight into a reused MessageDigest
  * and reads the 4 digest bytes directly — no hex round-trip, no
  * per-shingle string materialization (the d2 portable pipeline's hot
  * loop; measured ~2× on the full-corpus fixture at sf0.1).
  *
  * Fewer than n tokens → EMPTY array (not null), matching the
  * composable `otherwise(array())`. Null token elements are skipped the
  * way `concat_ws` skips them (no separator contribution). */
case class PortableShingleHashes(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1 && n <= 16, s"shingle width must be in [1, 16], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_portable_shingle_hashes"

  /** Row kernel, shared by interpreted eval and codegen (the generated
    * code calls it through a reference object — the md5 work dwarfs the
    * single virtual call, so inlining it into Java source buys nothing). */
  def compute(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) {
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    }
    // MessageDigest is not thread-safe and expression instances are
    // shared across tasks — a fresh instance per ROW (not per shingle;
    // digest() resets it) keeps this safe at negligible cost
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      md.update(PortableShingleHashes.SaltPrefix)
      var first = true
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        if (t != null) {
          if (!first) md.update(' '.toByte)
          md.update(t)
          first = false
        }
        j += 1
      }
      val d = md.digest() // also resets for the next shingle
      out(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("portableShingleHashes", this,
      classOf[PortableShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.compute($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PortableShingleHashes =
    copy(child = newChild)
}

object PortableShingleHashes {
  /** UTF-8 bytes of the fixed salt-0 prefix `"0:"`. */
  val SaltPrefix: Array[Byte] = "0:".getBytes("UTF-8")
}
