package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter membership probe against a TORRENT-BROADCAST bitmap.
  *
  * Why this exists (round-6 soak finding): the composable probe embeds
  * the bitmap as an array LITERAL — `element_at(lit(bits), ...)` — and
  * a 12 MiB long[] literal Java-serializes to ~140 MiB of boxed Longs
  * inside EVERY task binary, re-shipped per stage ("Broadcasting large
  * task binary" warning; the 50 M-row soak measured the pruned anti
  * join 130x slower than the plain one, inverting the optimization).
  * Holding a `Broadcast[Array[Long]]` instead serializes as a handful
  * of bytes (the handle); executors fetch the primitive-array blocks
  * once via torrent broadcast and every task reuses them — the same
  * transport Spark's own `InjectRuntimeFilter` bloom uses.
  *
  * Children are the two 64-bit base hashes (any long expressions; the
  * operators layer passes xxhash64 pairs). Probe positions are
  * Kirsch–Mitzenmacher double hashing `pos_i = (h1 + i*h2) mod m`
  * computed identically to [[graft.operators.BloomFilter]]'s builder
  * and composable probe — the three agree bit-for-bit, which
  * `BloomFilterSpec` pins.
  */
case class BloomMightContain(left: Expression, right: Expression,
                             bc: Broadcast[Array[Long]], k: Int)
  extends BinaryExpression {

  require(k >= 1 && k <= 8, "1..8 probes")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint) hashes, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  // deserialized once per executor from broadcast blocks, never shipped
  // inside the plan or task binary
  @transient private lazy val bits: Array[Long] = bc.value

  /** Row kernel shared by interpreted eval and codegen. */
  def compute(h1: Long, h2: Long): Boolean = {
    val b = bits
    val m = b.length.toLong * 64L
    val x = java.lang.Math.floorMod(h1, m)
    val y = java.lang.Math.floorMod(h2, m)
    var i = 0
    while (i < k) {
      val pos = (x + i.toLong * y) % m
      if (((b((pos >>> 6).toInt) >>> (pos & 63L)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (h1, h2) => s"${ev.value} = $ref.compute($h1, $h2);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
