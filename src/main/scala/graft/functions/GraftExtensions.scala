package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point — the deployment-grade registration
  * path for the engine's custom expressions (the runtime
  * [[GraftFunctions.register]] covers ad-hoc sessions):
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * makes every `graft_*` function available to SQL/expr in every session
  * of the application, including ones the engine didn't build. Both
  * paths iterate [[GraftFunctions.all]], the single source of truth, so
  * the surfaces cannot drift. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    // the custom grouped-top-k physical operator (runtime sessions get it
    // via GroupTopK.install on spark.experimental.extraStrategies)
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RankLimitToGroupTopK)
  }
}
