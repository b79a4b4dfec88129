package graft.lineage

import scala.collection.mutable.ArrayBuffer
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Lineage tracking — the engine restatement of the reference's
  * lineage.py:8-50 (`LineageEvent` / `DataLineage` dataclasses with a JSON
  * round-trip).
  *
  * One deliberate divergence, mandated by the north rule's
  * checkpoint-resume-determinism requirement: the reference stamps events
  * with wall-clock `time.time()` (lineage.py:21,28) and builds dataset ids
  * from wall-clock seconds (app.py:35). Wall clock is nondeterministic
  * across a checkpoint resume, so the engine uses a *logical* clock: event
  * `timestamp` is the event's ordinal (0, 1, 2, …) unless the caller
  * supplies an explicit deterministic value (e.g. a streaming epoch id),
  * and dataset ids derive from (type, seed) instead of (type, unix time).
  */
final case class LineageEvent(
    transform: String,
    timestamp: Double,
    input_count: Long,
    output_count: Long,
    params: Map[String, String] = Map.empty,
    notes: String = "")

/** Mutable accumulator mirroring lineage.py:18-50. `created_at` defaults to
  * 0.0 (logical epoch) rather than wall clock.
  */
final class DataLineage(val datasetId: String, val createdAt: Double = 0.0) {
  private val buf = ArrayBuffer.empty[LineageEvent]

  def events: Seq[LineageEvent] = buf.toSeq

  /** Append an event (lineage.py:24-33). Timestamp = event ordinal unless
    * given explicitly.
    */
  def record(
      transform: String,
      inputCount: Long,
      outputCount: Long,
      params: Map[String, String] = Map.empty,
      notes: String = "",
      timestamp: Option[Double] = None): Unit = {
    buf += LineageEvent(
      transform,
      timestamp.getOrElse(buf.size.toDouble),
      inputCount,
      outputCount,
      params,
      notes)
  }

  def toJson: String = Lineage.toJson(this)
}

object Lineage {
  private val mapper = new ObjectMapper()

  /** Serialize (lineage.py:35-43). Field order matches the reference dict. */
  def toJson(l: DataLineage): String = {
    val root = mapper.createObjectNode()
    root.put("dataset_id", l.datasetId)
    root.put("created_at", l.createdAt)
    val evs = root.putArray("events")
    l.events.foreach { e =>
      val n = evs.addObject()
      n.put("transform", e.transform)
      n.put("timestamp", e.timestamp)
      n.put("input_count", e.input_count)
      n.put("output_count", e.output_count)
      val p = n.putObject("params")
      e.params.foreach { case (k, v) => p.put(k, v) }
      n.put("notes", e.notes)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Deserialize (lineage.py:45-50). */
  def fromJson(json: String): DataLineage = {
    val root = mapper.readTree(json)
    val l = new DataLineage(
      root.get("dataset_id").asText(),
      root.get("created_at").asDouble())
    val evs = root.get("events")
    if (evs != null && evs.isArray) {
      evs.asInstanceOf[ArrayNode].forEach { (n: JsonNode) =>
        val params = scala.collection.mutable.LinkedHashMap.empty[String, String]
        val pn = n.get("params")
        if (pn != null && pn.isObject) {
          pn.asInstanceOf[ObjectNode].fields().forEachRemaining { e =>
            params += e.getKey -> e.getValue.asText()
          }
        }
        l.record(
          n.get("transform").asText(),
          n.get("input_count").asLong(),
          n.get("output_count").asLong(),
          params.toMap,
          if (n.has("notes")) n.get("notes").asText() else "",
          Some(n.get("timestamp").asDouble()))
      }
    }
    l
  }
}
