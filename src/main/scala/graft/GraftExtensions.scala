package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, NfcNormalize}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available to plain SQL. Activate on any cluster with
  *   spark.sql.extensions=graft.GraftExtensions
  * or SparkSession.builder().withExtensions(new GraftExtensions). For an
  * already-running session, `GraftSqlBridge.registerFunction` does the
  * same registration directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    // whole-operator extension: plans graft.plans.TopKPerGroup nodes
    // (Ranking.topKPerGroup also registers this lazily per session)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // optimizer rewrite: row_number-window + rank filter → TopKPerGroup
    e.injectOptimizerRule(_ => graft.plans.RewriteRowNumberTopK)
  }
}
