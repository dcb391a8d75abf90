package graft.mq

import org.apache.spark.sql.connector.read.streaming.Offset

/** Stream position: exclusive end offset per MQ partition.
  *
  * The reference's mock uses a single epoch-millis timestamp
  * (/root/reference/src/main/java/org/example/MockTimestampOffset.java:5-20);
  * the Kafka-grade semantics its README specifies are a per-partition map
  * with exclusive ends (README.md:337-344). We implement the latter — it is
  * the only shape that survives partition-parallel reads at scale.
  *
  * JSON form is `{"0":12,"1":7}` with keys sorted numerically so the
  * serialized form is canonical (checkpoint files diff cleanly).
  */
case class GraftMqOffset(ends: Map[Int, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}

object GraftMqOffset {
  /** Parse the canonical JSON form. Hand-rolled (flat string->long map)
    * to avoid pulling a JSON library into the connector hot path.
    */
  def fromJson(json: String): GraftMqOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) GraftMqOffset(Map.empty)
    else GraftMqOffset(
      body.split(",").map { kv =>
        val Array(k, v) = kv.split(":").map(_.trim)
        k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
      }.toMap)
  }

  def initial(numPartitions: Int): GraftMqOffset =
    GraftMqOffset((0 until numPartitions).map(_ -> 0L).toMap)
}
