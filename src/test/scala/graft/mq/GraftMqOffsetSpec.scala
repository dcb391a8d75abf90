package graft.mq

import graft.PropCheck
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

class GraftMqOffsetSpec extends AnyFunSuite {

  test("json round-trip, canonical ordering") {
    val off = GraftMqOffset(Map(2 -> 7L, 0 -> 12L, 1 -> 0L))
    assert(off.json() == """{"0":12,"1":0,"2":7}""")
    assert(GraftMqOffset.fromJson(off.json()) == off)
  }

  test("empty offset") {
    assert(GraftMqOffset(Map.empty).json() == "{}")
    assert(GraftMqOffset.fromJson("{}") == GraftMqOffset(Map.empty))
  }

  test("property: round-trip for arbitrary partition maps") {
    val genMap = Gen.mapOf(Gen.zip(Gen.chooseNum(0, 1024), Gen.chooseNum(0L, Long.MaxValue)))
    PropCheck.check(Prop.forAll(genMap) { m =>
      val off = GraftMqOffset(m)
      GraftMqOffset.fromJson(off.json()) == off
    })
  }
}

class GraftMqPlannerSpec extends AnyFunSuite {
  private def opts(minParts: Option[Int]) = GraftMqOptions(
    topic = "t", backend = "broker", numPartitions = 4, rowsPerBatch = 10,
    maxRowsPerBatch = None, minPartitions = minParts, seed = 42, wordsPerMessage = 4,
    failOnDataLoss = true, includeMetadata = false, startingOffsets = "earliest")

  /** The Kafka invariant (reference README.md:424-446): every offset in
    * [start,end) is covered exactly once, no gaps, no overlaps.
    */
  private def exactCover(parts: Seq[GraftMqInputPartition],
      start: Map[Int, Long], end: Map[Int, Long]): Boolean = {
    // No phantom partitions: a planner bug emitting ranges for a partition
    // id outside the end map would otherwise never be inspected below.
    parts.forall(p => end.contains(p.partition)) &&
    end.keys.forall { p =>
      val ranges = parts.filter(_.partition == p).map(r => (r.from, r.until)).sorted
      val from = start.getOrElse(p, 0L)
      val until = end(p)
      if (until > from) {
        ranges.nonEmpty &&
          ranges.head._1 == from &&
          ranges.last._2 == until &&
          ranges.forall { case (f, u) => u > f } &&
          ranges.sliding(2).forall {
            case Seq((_, aEnd), (bStart, _)) => aEnd == bStart
            case _ => true
          }
      } else ranges.isEmpty
    }
  }

  test("plans one task per non-empty partition range") {
    val start = Map(0 -> 0L, 1 -> 5L, 2 -> 3L, 3 -> 9L)
    val end = Map(0 -> 10L, 1 -> 5L, 2 -> 8L, 3 -> 20L)
    val parts = GraftMqPlanner.plan(opts(None), start, end)
      .map(_.asInstanceOf[GraftMqInputPartition]).toSeq
    assert(parts.size == 3) // partition 1 has no new data
    assert(exactCover(parts, start, end))
  }

  test("minPartitions splits ranges without gaps or overlaps") {
    val start = Map(0 -> 0L, 1 -> 0L)
    val end = Map(0 -> 100L, 1 -> 10L)
    val parts = GraftMqPlanner.plan(opts(Some(8)), start, end)
      .map(_.asInstanceOf[GraftMqInputPartition]).toSeq
    assert(parts.size >= 8)
    assert(exactCover(parts, start, end))
  }

  test("property: exact range cover for arbitrary start/end/minPartitions") {
    val gen = for {
      n <- Gen.chooseNum(1, 8)
      starts <- Gen.listOfN(n, Gen.chooseNum(0L, 1000L))
      deltas <- Gen.listOfN(n, Gen.chooseNum(0L, 500L))
      minP <- Gen.option(Gen.chooseNum(1, 64))
    } yield (starts.zipWithIndex.map { case (s, i) => i -> s }.toMap,
      starts.zip(deltas).zipWithIndex.map { case ((s, d), i) => i -> (s + d) }.toMap, minP)
    PropCheck.check(Prop.forAll(gen) { case (start, end, minP) =>
      val parts = GraftMqPlanner.plan(opts(minP), start, end)
        .map(_.asInstanceOf[GraftMqInputPartition]).toSeq
      exactCover(parts, start, end)
    })
  }
}
