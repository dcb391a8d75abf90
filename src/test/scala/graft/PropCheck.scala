package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Run a ScalaCheck property from ScalaTest without the scalatestplus
  * bridge (not on the offline classpath). ONE definition shared by every
  * property suite so the run parameters cannot drift between them.
  */
object PropCheck {
  def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
