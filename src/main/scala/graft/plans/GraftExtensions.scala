package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session-extension entry point: registers graft's native Catalyst
  * expressions as SQL functions. Wire with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private[plans] val descriptors: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    FloatVecDot.descriptor,
    (FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getCanonicalName,
        "graft_sorted_intersect_count"),
      (c: Seq[Expression]) => SortedLongIntersectCount(c(0), c(1))))

  /** Idempotent runtime registration for an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
