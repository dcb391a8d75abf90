package graft.mq

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge contracts from the round-6 connector review: batch data-loss
  * semantics, sink schema acceptance, broker partition-count safety,
  * generated-backend partition growth, and option validation.
  */
class GraftMqHardeningSpec extends SparkSuite {

  private val base = 1700000000000000L

  test("batch read aborts on truncated start under failOnDataLoss=true, clamps under false") {
    val topic = "hard-trunc"
    InMemoryMqBroker.drop(topic)
    val state = InMemoryMqBroker.getOrCreate(topic, 1)
    (0 until 10).foreach(i =>
      state.append(0, MqMessage(null, s"m$i".getBytes("UTF-8"), base + i)))
    state.truncateTo(4) // offsets [4, 10) retained
    def read(failOnDataLoss: Boolean) = spark.read.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1")
      .option("startingOffsets", """{"0":1}""")
      .option("failOnDataLoss", failOnDataLoss.toString).load()
    // Default semantics: requesting truncated offsets IS data loss.
    val err = intercept[Exception] { read(failOnDataLoss = true).count() }
    assert(err.getMessage.contains("earliest retained"), err.getMessage)
    // Opt-out reads from the log head instead — 6 surviving rows.
    assert(read(failOnDataLoss = false).count() == 6)
  }

  test("batch write with optional key column reaches the sink (ACCEPT_ANY_SCHEMA)") {
    import spark.implicits._
    val topic = "hard-keyed-write"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.getOrCreate(topic, 1)
    Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
      .write.format("graft-mq").mode("append")
      .option("topic", topic).option("numPartitions", "1").save()
    val back = spark.read.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1")
      .option("includeMetadata", "true").load()
      .select($"key".cast("string"), $"value".cast("string"))
      .as[(String, String)].collect().toSet
    assert(back == Set(("k1", "v1"), ("k2", "v2")))
  }

  test("broker rejects a mismatched partition count instead of corrupting the topic") {
    InMemoryMqBroker.drop("hard-mismatch")
    InMemoryMqBroker.getOrCreate("hard-mismatch", 2)
    val err = intercept[IllegalArgumentException] {
      InMemoryMqBroker.getOrCreate("hard-mismatch", 8)
    }
    assert(err.getMessage.contains("2 partitions"), err.getMessage)
  }

  test("generated backend plans partitions added after a checkpoint") {
    // Simulate a restart where the offset log was written at
    // numPartitions=2 but the source is reconfigured to 4: the restored
    // start has no entries for partitions 2-3, which must still advance.
    val props = java.util.Map.of("topic", "hard-grow", "backend", "generated",
      "numPartitions", "4", "rowsPerBatch", "5")
    val stream = new GraftMqMicroBatchStream(GraftMqOptions.from(props), "unused")
    val restored = GraftMqOffset(Map(0 -> 10L, 1 -> 10L))
    val end = stream.latestOffset(restored,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      .asInstanceOf[GraftMqOffset].ends
    assert(end == Map(0 -> 15L, 1 -> 15L, 2 -> 5L, 3 -> 5L), end.toString)
  }

  test("non-positive numeric options fail fast with a clear message") {
    def opts(k: String, v: String) =
      GraftMqOptions.from(java.util.Map.of("topic", "t", k, v))
    for ((k, v) <- Seq("numPartitions" -> "0", "rowsPerBatch" -> "-1",
        "maxRowsPerBatch" -> "0", "minPartitions" -> "-2")) {
      val err = intercept[IllegalArgumentException] { opts(k, v) }
      assert(err.getMessage.contains(k), s"$k: ${err.getMessage}")
    }
  }
}
