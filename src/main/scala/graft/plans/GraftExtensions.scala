package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session-extension entry point: registers graft's native Catalyst
  * expressions as SQL functions. Wire with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => AsofJoinNative.Strategy)
    ext.injectOptimizerRule(_ => AsofJoinNative.FilterPushdown)
    // SQL front door: row-level DML over GraftCatalog tables (also
    // self-registered at runtime by GraftCatalog.register/loadTable)
    // and the streaming table-read rewrite (BUILD-time only — an
    // analyzer rule can't attach to a live session, so
    // spark.readStream.table over graft tables needs this class on
    // spark.sql.extensions)
    ext.injectPlannerStrategy(_ => graft.sources.GraftSqlDml.Strategy)
    ext.injectResolutionRule(sp => new graft.sources.GraftStreamRewrite(sp))
    // broadcast-size hints for versioned scans (the V1ScanWrapper
    // hides scan statistics from join selection — see the rule)
    ext.injectOptimizerRule(_ => graft.sources.VersionedJoinHint)
    // persistent views: CREATE/DROP VIEW against a GraftCatalog —
    // intercepted in the HINT batch, BEFORE Spark's own
    // ResolveSessionCatalog blanket-rejects v2-catalog view DDL
    // (see [[graft.sources.GraftViewRules]])
    ext.injectHintResolutionRule(sp =>
      new graft.sources.GraftViewRules(sp))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def intLit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got $other")
  }

  private[plans] val descriptors: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    FloatVecDot.descriptor,
    (FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getCanonicalName,
        "graft_sorted_intersect_count"),
      (c: Seq[Expression]) => SortedLongIntersectCount(c(0), c(1))),
    (FunctionIdentifier("graft_md5_prefix_hashes"),
      new ExpressionInfo(classOf[Md5PrefixHashes].getCanonicalName,
        "graft_md5_prefix_hashes"),
      (c: Seq[Expression]) => Md5PrefixHashes(c(0), intLit(c(1)))),
    (FunctionIdentifier("graft_char_shingle_hashes"),
      new ExpressionInfo(classOf[CharShingleHashes].getCanonicalName,
        "graft_char_shingle_hashes"),
      (c: Seq[Expression]) => CharShingleHashes(c(0), intLit(c(1)), intLit(c(2)))),
    (FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getCanonicalName,
        "graft_hyperplane_sig"),
      (c: Seq[Expression]) => HyperplaneSig(c(0), intLit(c(1)), intLit(c(2)))),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getCanonicalName,
        "graft_minhash_sig"),
      (c: Seq[Expression]) => MinHashSig(c(0), intLit(c(1)))))

  /** Idempotent runtime registration for an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
