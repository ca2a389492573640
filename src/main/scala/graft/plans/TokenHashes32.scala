package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize-and-hash: masked 32-bit xxhash64 of every
  * `[a-z0-9]+` run in an ALREADY-LOWERCASED string, in one byte scan
  * with zero-copy hashing of each token's byte slice.
  *
  * Bit-identical to the composable
  * `transform(filter(split(lowered, "[^a-z0-9]+"), _ != ""),
  *  t => xxhash64(t) & 0xFFFFFFFF)`:
  *  - the regex treats every char outside [a-z0-9] as a separator; in
  *    UTF-8 every byte of a non-ASCII codepoint has the high bit set,
  *    so a byte-level scan finds exactly the same runs;
  *  - Spark's `xxhash64(string)` is XXH64 over the UTF-8 bytes with
  *    seed 42 — hashing the slice in place gives the same value with
  *    no per-token string allocation.
  *
  * The caller passes `lower(text)` as the child so Unicode lowercasing
  * stays Spark's own (`Lower`), keeping cross-engine semantics in one
  * place. */
case class TokenHashes32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(TokenHashes32.scan(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.plans.TokenHashes32.scan($str));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHashes32 =
    copy(child = newChild)
}

object TokenHashes32 {
  private final val Seed = 42L // Spark's xxhash64 default seed

  private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** One pass to count runs, one to hash them (no growable buffer). */
  def scan(s: UTF8String): Array[Long] = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var count = 0
    var i = 0
    var in = false
    while (i < n) {
      val t = isTokenByte(s.getByte(i))
      if (t && !in) count += 1
      in = t
      i += 1
    }
    val out = new Array[Long](count)
    var k = 0
    i = 0
    var start = -1
    while (i <= n) {
      val t = i < n && isTokenByte(s.getByte(i))
      if (t && start < 0) start = i
      else if (!t && start >= 0) {
        out(k) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + start, i - start, Seed) &
          0xFFFFFFFFL
        k += 1
        start = -1
      }
      i += 1
    }
    out
  }
}
