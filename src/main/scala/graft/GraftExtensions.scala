package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions hook for the graft engine.
  *
  * Registers graft's custom Catalyst functions so they are usable from SQL
  * (`spark.sql.extensions=graft.GraftExtensions`). Everything else the
  * engine does rides on stock Catalyst — per SURVEY.md §4 the reference
  * has no optimizer rules or physical strategies of its own, and none are
  * needed for parity.
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
