package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Run a ScalaCheck property from ScalaTest without the scalatestplus
  * bridge (not on the offline classpath). ONE definition shared by every
  * property suite so the run parameters cannot drift between them.
  */
object PropCheck {
  def check(prop: Prop): Unit = check(prop, 200)

  /** For properties whose single evaluation launches Spark jobs (e.g. the
    * CC loop): same parameters, smaller sample — pure-function properties
    * should keep the 200 default.
    */
  def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }
}
