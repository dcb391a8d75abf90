package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions hook for the graft engine.
  *
  * Registers graft's custom Catalyst functions for SQL use
  * (`spark.sql.extensions=graft.GraftExtensions`) plus the ONE planner
  * strategy the library ships always-on: [[graft.plans.TopKPerKeyStrategy]],
  * which only fires on the explicit [[graft.plans.TopKPerKeyNode]]. The
  * row_number-rewrite optimizer rule ([[graft.plans.RewriteRowNumberTopK]])
  * stays opt-in via RowNumberTopKRewrite.enable and is NOT injected here —
  * stock SQL plans are otherwise untouched. (The reference itself has no
  * optimizer rules or strategies, SURVEY.md §4; these belong to the
  * extension surface.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.registrations.foreach(ext.injectFunction)
    // Whole-plan operators (SURVEY.md §2.8): planner strategy for the
    // map-side-bounded top-k-per-key node. GraftPlans.topKPerKey also
    // self-registers via experimental.extraStrategies for sessions built
    // without spark.sql.extensions.
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
