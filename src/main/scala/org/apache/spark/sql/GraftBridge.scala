package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's `Column` wraps a connect-compatible `ColumnNode`; the
  * classic-session converters live behind `private[sql]`, so this
  * shim (in the sql package, the standard extension-library pattern)
  * re-exports the two conversions custom expressions need.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Catalyst's size estimate (bytes) for a frame's optimized plan —
    * the same statistic JoinSelection consults when it auto-picks a
    * broadcast side. Exposed so operators can make the SAME call
    * adaptively (hint only when the estimate fits the threshold)
    * instead of forcing a broadcast hint that would OOM the driver
    * on a fact-sized input. */
  def sizeEstimate(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The session's autoBroadcastJoinThreshold in bytes (-1 = off). */
  def broadcastThreshold(spark: SparkSession): Long =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold

  /** First TOP-LEVEL equality conjunct `column = literal` of an
    * (unresolved) predicate Column — the only predicate shape a
    * bloom sidecar can soundly bound a DML mask scan with. Only
    * AND nodes are descended: an equality under OR/NOT does not
    * bound the matching rows' files. Handles BOTH Column shapes:
    * DSL-built columns (`col("k") === 42` — a connect-style
    * `UnresolvedFunction("=", …)` node tree) and engine-built ones
    * wrapping a Catalyst expression (`ExpressionColumnNode`, the
    * [[column]] path SQL DML uses). Returns the attribute name and
    * the literal as an EXTERNAL Scala value. */
  def topLevelEquality(c: Column): Option[(String, Any)] = {
    import org.apache.spark.sql.{internal => in}
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Literal => CLit}
    import org.apache.spark.sql.catalyst.{analysis => an}
    def catName(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[String] = e match {
      case a: an.UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def catWalk(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[(String, Any)] = e match {
      case And(l, r) => catWalk(l).orElse(catWalk(r))
      case EqualTo(l, lit: CLit) if lit.value != null =>
        catName(l).map(_ -> org.apache.spark.sql.catalyst
          .CatalystTypeConverters.convertToScala(lit.value, lit.dataType))
      case EqualTo(lit: CLit, r) if lit.value != null =>
        catName(r).map(_ -> org.apache.spark.sql.catalyst
          .CatalystTypeConverters.convertToScala(lit.value, lit.dataType))
      case _ => None
    }
    def nodeName(n: in.ColumnNode): Option[String] = n match {
      case in.UnresolvedAttribute(parts, _, _, _) if parts.size == 1 =>
        Some(parts.head)
      case _ => None
    }
    def nodeLit(n: in.ColumnNode): Option[Any] = n match {
      case in.Literal(v, _, _) if v != null => Some(v)
      case _ => None
    }
    def nodeWalk(n: in.ColumnNode): Option[(String, Any)] = n match {
      case in.UnresolvedFunction(fn, args, _, _, _, _) =>
        fn.toLowerCase(java.util.Locale.ROOT) match {
          case "and" => args.iterator.map(nodeWalk)
            .collectFirst { case Some(x) => x }
          case "=" | "==" if args.size == 2 =>
            (for { nm <- nodeName(args(0)); v <- nodeLit(args(1)) }
              yield (nm, v))
              .orElse(for { nm <- nodeName(args(1));
                v <- nodeLit(args(0)) } yield (nm, v))
          case _ => None
        }
      case classic.ExpressionColumnNode(e, _) => catWalk(e)
      case _ => None
    }
    nodeWalk(c.node)
  }

  /** DataFrame from a custom LogicalPlan (the `Dataset.ofRows`
    * constructor is private[sql]) — needed to surface custom logical
    * nodes like graft's native as-of join through the public API. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
