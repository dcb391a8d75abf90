package graft.tools

import graft.mq.{GeneratedPayloads, GraftMqOptions}

/** Dev tool: attribute the MQ drain figure (Bench's mq_rows_per_sec) —
  * is it generation-bound, reader-bound, or sink-bound? Times three
  * layers on the same workload:
  *
  *   1. raw generation: a driver-side loop over
  *      [[GeneratedPayloads.messageAt]] (no Spark at all) — the speed
  *      of the synthetic broker itself;
  *   2. the row drain (full AvailableNow trigger loop, row reader);
  *   3. the columnar drain (same, vectorized reader).
  *
  * If (1) ≈ (2) ≈ (3), the figure is generation-bound and the reader
  * modes are EXPECTED to tie — the vectorization seam can only show
  * once the per-message synthesis cost is out of the way.
  *
  * Usage: runMain graft.tools.DrainProbe [totalRows] (default 2M).
  * Env: SPARK_GRAFT_CPUS (default 32, matching Bench).
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val totalRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val opts = GraftMqOptions(topic = "default", backend = "generated",
      numPartitions = 4, rowsPerBatch = totalRows / 4,
      maxRowsPerBatch = None, minPartitions = None, seed = 42L,
      wordsPerMessage = 4, failOnDataLoss = true, includeMetadata = false,
      startingOffsets = "earliest")

    // 1. Raw generation, single-threaded (per-core ceiling: multiply by
    //    the drain's partition count for the parallel ceiling).
    var blackhole = 0L
    def genPass(): Double = {
      val t0 = System.nanoTime()
      var o = 0L
      val perPart = totalRows / 4
      var p = 0
      while (p < 4) {
        o = 0L
        while (o < perPart) {
          val m = GeneratedPayloads.messageAt(opts, p, o)
          blackhole ^= m.value.length + m.key.length + m.timestamp
          o += 1
        }
        p += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    genPass() // warm up the JIT before the timed pass
    val genSec = genPass()
    println(f"[drain] generation   ${math.round(totalRows / genSec)}%9d rows/s " +
      f"(single-thread, $genSec%5.2f s; x4 parallel ceiling ~${math.round(4 * totalRows / genSec)}%d)")

    val spark = graft.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    Seq(false, true).foreach { columnar =>
      // Untimed small drain first, mirroring Bench: streaming-engine init
      // (state dirs, first trigger planning) stays out of the figure.
      graft.Bench.mqDrainRowsPerSec(spark, 20000, columnar = columnar)
      val r = graft.Bench.mqDrainRowsPerSec(spark, totalRows, columnar = columnar)
      val tag = if (columnar) "columnar" else "row"
      println(f"[drain] $tag%-12s ${r.fold(e => -1L, identity)}%9d rows/s ($r)")
    }
    spark.stop()
    if (blackhole == 42L) println("") // keep the blackhole observable
  }
}
