package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers the engine's native
  * functions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `withExtensions(new GraftExtensions)`); then
  * `spark.sql("SELECT graft_cosine(a, b) ...")` resolves to the
  * codegen'd [[CosineSimilarity]]. The injectFunction path makes the
  * function available in every session derived from the builder —
  * cluster-wide via config, no per-session registration code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      GraftExtensions.cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      GraftExtensions.minhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      GraftExtensions.shingleBuilder))
  }
}

object GraftExtensions {
  /** The SQL function builder (exposed for direct testing). */
  val cosineBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2,
      s"graft_cosine expects 2 arguments, got ${children.length}")
    CosineSimilarity(children.head, children(1))
  }

  /** `graft_minhash(hashes, k)` — k must be an integer literal (the
    * signature width shapes the generated code). */
  val minhashBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2,
      s"graft_minhash expects 2 arguments, got ${children.length}")
    val k = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_minhash k must be an integer literal, got $other")
    }
    MinhashSignature(children.head, k)
  }

  /** `graft_shingle_hashes(token_hashes, n)` — n must be a literal. */
  val shingleBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2,
      s"graft_shingle_hashes expects 2 arguments, got ${children.length}")
    val n = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_shingle_hashes n must be an integer literal, got $other")
    }
    ShingleHashes(children.head, n)
  }
}
