package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded random cases) for the SpaceSaving buffer
  * backing approx_top_k: the Metwally guarantees must hold for arbitrary
  * streams and capacities, and arbitrary split/merge (Spark partial
  * aggregation) must preserve them.
  */
class SpaceSavingSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h")
  private def randomStream(): List[String] = {
    // Skewed draw so heavy hitters actually exist.
    val n = rnd.nextInt(400)
    List.fill(n)(alphabet(math.min(rnd.nextInt(alphabet.size),
      rnd.nextInt(alphabet.size))))
  }

  private def truth(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def check(buf: SpaceSavingBuffer, items: Seq[String]): Unit = {
    val t = truth(items)
    // (1) count bounds: true <= count <= true + error
    buf.counters.foreach { case (item, (c, e)) =>
      val tc = t.getOrElse(item, 0L)
      assert(tc <= c, s"$item: count $c under true $tc")
      assert(c - e <= tc, s"$item: count-error ${c - e} over true $tc")
    }
    // (2) any item with frequency > N/capacity is retained
    val n = items.size.toLong
    t.foreach { case (item, tc) =>
      if (tc > n / buf.capacity)
        assert(buf.counters.contains(item), s"heavy item $item (freq $tc) evicted")
    }
  }

  test("property: single-buffer SpaceSaving bounds for arbitrary streams") {
    (1 to 200).foreach { _ =>
      val items = randomStream()
      val cap = 2 + rnd.nextInt(9)
      val buf = new SpaceSavingBuffer(cap)
      items.foreach(buf.add(_))
      check(buf, items)
    }
  }

  test("property: split-then-merge preserves the bounds (partial aggregation)") {
    (1 to 200).foreach { _ =>
      val items = randomStream()
      val cap = 2 + rnd.nextInt(9)
      val splitAt = if (items.isEmpty) 0 else rnd.nextInt(items.size + 1)
      val (l, r) = items.splitAt(splitAt)
      val a = new SpaceSavingBuffer(cap); l.foreach(a.add(_))
      val b = new SpaceSavingBuffer(cap); r.foreach(b.add(_))
      a.mergeIn(b)
      check(a, items)
      assert(a.counters.size <= cap)
    }
  }

  test("exact regime: capacity >= distinct gives exact counts, zero error") {
    val items = Seq("x", "y", "x", "z", "x", "y")
    val buf = new SpaceSavingBuffer(8)
    items.foreach(buf.add(_))
    assert(buf.counters.toMap == Map("x" -> (3L, 0L), "y" -> (2L, 0L), "z" -> (1L, 0L)))
  }
}
