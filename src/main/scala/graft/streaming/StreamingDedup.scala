package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming exact deduplication for training-data pipelines (SURVEY.md
  * §2.9 × the dedup family): the batch operator's normalized-text
  * fingerprint ([[graft.ops.TextOps.fingerprint]]) keyed through Structured
  * Streaming's watermarked duplicate-drop, so state is BOUNDED — a
  * fingerprint is remembered only within the event-time watermark window,
  * which is the only shape that survives an unbounded 100 TB/day stream
  * (unbounded `dropDuplicates` state grows forever).
  *
  * Semantics: within any watermark window, the FIRST-arriving document of a
  * duplicate group survives (batch `exactDedup` keeps the smallest key —
  * both are deterministic pick-one-per-group policies; the streaming one
  * must be arrival-based because later members may not have arrived yet).
  */
object StreamingDedup {

  /** Drops rows whose normalized-text fingerprint was already seen within
    * the watermark. `eventTimeCol` must name a timestamp column of the
    * stream; `delay` is the out-of-orderness bound (e.g. "10 minutes"). */
  def exactDedup(stream: DataFrame, textCol: Column,
                 eventTimeCol: String, delay: String): DataFrame =
    stream
      .withColumn("__fp", TextOps.fingerprint(textCol))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
