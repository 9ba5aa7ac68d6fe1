package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session-extension entry point: registers graft's native Catalyst
  * expressions as SQL functions. Wire with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(FloatVecDot.descriptor)
  }
}

object GraftExtensions {
  /** Idempotent runtime registration for an existing session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = FloatVecDot.descriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
