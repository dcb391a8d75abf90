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

    // 4. SOCKET drain (r19 — VERDICT r18 #5's recorded figure): the same
    //    trigger loop with every fetch crossing a localhost TCP broker.
    //    Not directly subtractable from the generated figure — the
    //    generated drain pays per-message SYNTHESIS in the reader while
    //    this serves pre-materialized logs. r19 clean-load recording
    //    (pre-prefetch): socket 696k row / 992k columnar rows/s vs
    //    generated 1.03M/1.10M at 2M rows (~10-30% transport tax at 4096
    //    messages/RPC). r20 recording with the one-chunk-ahead prefetch:
    //    at 2M, row 856k→993k off→on (+16%), columnar 948k→982k —
    //    socket+prefetch ≥ the same run's generated figures; at the 8M
    //    bench workload, row 1.02M→1.73M (+69%), columnar 1.70M→1.83M.
    //    All figures load-sensitive — compare only same-run pairs.
    {
      import graft.mq.{InMemoryMqBroker, MqSocketBroker}
      val server = new MqSocketBroker.MqBrokerServer()
      val topic = "drain-socket"
      val parts = 4
      InMemoryMqBroker.drop(topic)
      val st = InMemoryMqBroker.getOrCreate(topic, parts)
      val perPart = totalRows / parts
      var p = 0
      while (p < parts) { // same payloads as the generated drain — comparable figure
        var o = 0L
        while (o < perPart) {
          st.append(p, GeneratedPayloads.messageAt(opts, p, o)); o += 1
        }
        p += 1
      }
      // Separate small warm topic: a broker-backed drain reads ALL
      // available rows regardless of the size parameter, so warming on
      // the big topic would be a full untimed drain.
      val warmTopic = "drain-socket-warm"
      InMemoryMqBroker.drop(warmTopic)
      val wst = InMemoryMqBroker.getOrCreate(warmTopic, parts)
      (0 until 20000).foreach(i =>
        wst.append(i % parts, GeneratedPayloads.messageAt(opts, i % parts, i / parts)))
      def sock(t: String, prefetch: Boolean, depth: Int) =
        Map("backend" -> "socket",
          "brokerSocket" -> server.address, "topic" -> t,
          "prefetch" -> prefetch.toString, "prefetchDepth" -> depth.toString)
      // Prefetch A/B (r20 — VERDICT r19 #4; depth ladder r22 — VERDICT
      // r21 #5): interleaved off/d1/d2/d3 samples per reader mode,
      // best-of-2 each, so the chunk-ahead prefetch's cut of the
      // transport tax — and whether a SECOND/THIRD armed chunk buys
      // anything past it — is measured in the same run (cross-run drift
      // on this box is 30-60%; only same-run pairs are comparable).
      val legs = Seq(("off", false, 1), ("+pf1", true, 1),
        ("+pf2", true, 2), ("+pf3", true, 3))
      Seq(false, true).foreach { columnar =>
        graft.Bench.mqDrainRowsPerSec(spark, 20000, columnar = columnar,
          source = sock(warmTopic, prefetch = true, depth = 1))
        val samples = (0 until 2).flatMap { _ =>
          legs.map { case (tag, pf, d) =>
            tag -> graft.Bench.mqDrainRowsPerSec(spark, totalRows,
              columnar = columnar, source = sock(topic, pf, d))
          }
        }
        legs.foreach { case (ltag, _, _) =>
          val best = samples.collect { case (`ltag`, Right(v)) => v }.maxOption
          val tag = (if (columnar) "columnar" else "row") + "@socket" + ltag
          println(f"[drain] $tag%-22s ${best.getOrElse(-1L)}%9d rows/s")
        }
      }
      server.close()
    }
    spark.stop()
    if (blackhole == 42L) println("") // keep the blackhole observable
  }
}
