package graft.mq

import graft.{Bench, SparkSuite}

/** The bench line's MQ streaming-throughput member ([[graft.Bench.mqDrainRowsPerSec]]):
  * a fixed generated workload drained through the real AvailableNow
  * trigger loop. These specs pin the contract the trend figure depends
  * on — exact row accounting (a drain that silently under-reads would
  * inflate rows/sec), both reader modes green, and failure-as-Left
  * (a broken drain must surface in "errors", never crash the line).
  */
class BenchMqDrainSpec extends SparkSuite {

  test("row and columnar drains account for every generated row and report positive throughput") {
    for (columnar <- Seq(false, true)) {
      Bench.mqDrainRowsPerSec(spark, 20000, columnar) match {
        case Right(rps) => assert(rps > 0, s"columnar=$columnar rps=$rps")
        case Left(err)  => fail(s"columnar=$columnar drain failed: $err")
      }
    }
  }

  test("totalRows below the partition count still drains consistently (expected = floor x parts)") {
    // 3 rows / 4 partitions → rowsPerBatch 0 is rejected by option
    // validation; the drain must surface that as a Left, not a crash.
    val r = Bench.mqDrainRowsPerSec(spark, 3, columnar = false)
    assert(r.isLeft, s"expected Left for sub-partition workload, got $r")
    assert(r.swap.toOption.get.startsWith("mq_drain_row:"), r)
  }
}
