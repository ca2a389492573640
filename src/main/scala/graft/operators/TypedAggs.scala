package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The engine's UDAF surface (SURVEY §2.J): `Aggregator[IN, BUF, OUT]`
  * is the designated extension point for custom aggregation — typed,
  * mergeable (partial buffers combine associatively, so map-side
  * partial aggregation and AQE re-partitioning both work), and usable
  * from both the Dataset API (`.agg(agg.toColumn)`) and SQL
  * (`spark.udf.register("name", functions.udaf(agg))`).
  */
object TypedAggs {

  /** One-pass per-key profile: count, exact decimal sum, min, max.
    * The buffer is exact (BigDecimal sum is associative), so results
    * are independent of partition order and merge tree shape — the
    * property every custom Aggregator at cluster scale must have. */
  final case class Profile(n: Long, sum: BigDecimal, min: Double, max: Double)

  /** Profiles a double extracted from `IN`, summing at 2 decimal
    * places (generic in IN because `TypedColumn` has no contramap —
    * the extractor adapts the aggregator to whatever the grouped
    * Dataset's element type is). */
  final class ProfileAgg[IN](f: IN => Double)
    extends Aggregator[IN, Profile, Profile] {
    private val Two = BigDecimal(0).setScale(2)
    override def zero: Profile =
      Profile(0L, Two, Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: Profile, in: IN): Profile = {
      val v = f(in)
      Profile(b.n + 1,
        b.sum + BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        math.min(b.min, v), math.max(b.max, v))
    }
    override def merge(a: Profile, b: Profile): Profile =
      Profile(a.n + b.n, a.sum + b.sum,
        math.min(a.min, b.min), math.max(a.max, b.max))
    override def finish(r: Profile): Profile = r
    override def bufferEncoder: Encoder[Profile] = Encoders.product[Profile]
    override def outputEncoder: Encoder[Profile] = Encoders.product[Profile]
  }

  /** Aggregates a bare double column. */
  val ValueProfile: ProfileAgg[Double] = new ProfileAgg[Double](identity)
}
