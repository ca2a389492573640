package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking operators — SURVEY §2.H.
  *
  * T2 (global order-by + limit) is left to `orderBy(...).limit(k)`,
  * which Spark plans as `TakeOrderedAndProject` — per-partition top-k
  * then a k-row driver merge; no global sort materializes at any scale.
  *
  * T4 (per-group top-k — the reference's "top domains" table defers
  * ranking to BI, `/root/reference/sql/mart/02_marts.sql:72-90`) is a
  * rank window. `row_number` (not `rank`) plus a total-order tie-break
  * keeps output deterministic for the oracle compare.
  */
object TopK {

  /** Top-k rows per group under `order` (pass a TOTAL order: e.g.
    * count desc, then key asc). One shuffle on the group keys; Spark
    * pushes a per-partition rank-limit (WindowGroupLimit) below the
    * exchange, so only ≤k rows per group per mapper shuffle. */
  def perGroup(df: DataFrame, groupKeys: Seq[String], order: Seq[Column],
               k: Int, rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(groupKeys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("int"))
      .filter(col(rankCol) <= k)
  }
}
