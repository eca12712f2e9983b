package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** Streaming NEAR-duplicate detection (SURVEY.md §2.9 × the dedup family):
  * the batch MinHash-LSH operator's banding
  * ([[graft.ops.Dedup.minhashDupPairs]] — identical shingles, signature, and
  * band hashes by shared construction) re-expressed as watermark-bounded
  * per-bucket state, so an unbounded stream is matched against only the
  * documents that arrived within the event-time bound.
  *
  * Each (band, bandhash) bucket holds the (key, signature, event-time) of
  * its recent members in `flatMapGroupsWithState`; an arriving document is
  * compared against the bucket's members and emits a pair when the
  * SIGNATURE-ESTIMATED Jaccard (matching slots / numHashes) clears the
  * threshold. The estimate stands in for the batch operator's exact verify:
  * state carrying full shingle sets would grow with document size instead
  * of O(numHashes) per member — the honest streaming trade, and the one
  * every caller should know: `est_jaccard` is an unbiased estimate with
  * stderr ≈ sqrt(j(1−j)/numHashes), not the exact statistic.
  *
  * Guarantees: two near-duplicates arriving within `delayMs` of each other
  * (event time) are compared in every band they share — same candidacy as
  * batch LSH over that window. Members farther apart NEVER pair: the pair
  * loop checks |Δevent-time| ≤ delayMs explicitly, so the emitted set is a
  * deterministic function of event times alone (state pruning remains
  * watermark-driven and only affects memory, not output). A pair sharing
  * several bands is emitted once per shared band; downstream cluster
  * resolution ([[graft.ops.Dedup.dupClusters]]) is insensitive to
  * duplicates, or use `.dropDuplicates("key_a","key_b")` in the sink.
  * State per bucket is bounded by one watermark window of members; an idle
  * bucket's state is removed by its event-time timeout. */
object StreamingNearDup {

  final case class BandedDoc(key: Long, band: Int, bandhash: Long,
                             sig: Seq[Long], tsMs: Long)
  final case class BucketState(members: Vector[(Long, Seq[Long], Long)])
  final case class NearDupPair(key_a: Long, key_b: Long,
                               est_jaccard: Double, band: Int)

  /** `stream` must contain the text column, a Long key column, and a
    * timestamp column named `eventTimeCol`. `delayMs` bounds out-of-order
    * arrival AND how far apart (event time) two documents can be and still
    * pair. Run with `writeStream` in append mode. */
  def minhashNearDupPairs(stream: DataFrame, textCol: Column, keyCol: Column,
                          eventTimeCol: String, delayMs: Long,
                          ngram: Int = 3, numHashes: Int = 16, bands: Int = 4,
                          threshold: Double = 0.5): Dataset[NearDupPair] = {
    require(delayMs > 0, "delayMs must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    // the watermarked __ts attribute stays physically in the plan (as[] only
    // narrows the typed view) so the event-time timeout has its watermark
    val banded = stream
      .withWatermark(eventTimeCol, s"$delayMs milliseconds")
      .select(keyCol.as("key"), col(eventTimeCol).as("__ts"),
        Dedup.minhashSignature(Dedup.shingles(textCol, ngram), numHashes).as("sig"))
      .select(col("key"), col("__ts"), col("sig"),
        posexplode(Dedup.bandHashes(col("sig"), numHashes, bands)))
      .select(col("key"), col("pos").as("band"), col("col").as("bandhash"),
        col("sig"), (col("__ts").cast("double") * 1000).cast("long").as("tsMs"),
        col("__ts"))
      .as[BandedDoc]

    def estimate(a: Seq[Long], b: Seq[Long]): Double =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / numHashes

    banded.groupByKey(d => (d.band, d.bandhash))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // watermark passed every member's ts + delay: nothing can pair
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            val old = state.getOption.map(_.members).getOrElse(Vector.empty)
              .filter(_._3 >= wm - delayMs) // beyond-delay members can't pair
            // deterministic processing order regardless of batch iteration
            val incoming = rows.toVector.sortBy(d => (d.tsMs, d.key))
            val out = Vector.newBuilder[NearDupPair]
            var seen = old
            incoming.foreach { d =>
              seen.foreach { case (k, sig, mts) =>
                // the explicit event-time bound makes output independent of
                // batch timing: a member the lagging watermark hasn't pruned
                // yet still can't pair beyond delayMs
                if (k != d.key && math.abs(d.tsMs - mts) <= delayMs) {
                  val est = estimate(sig, d.sig)
                  if (est >= threshold)
                    out += NearDupPair(math.min(k, d.key), math.max(k, d.key),
                      est, bucket._1)
                }
              }
              seen :+= ((d.key, d.sig, d.tsMs))
            }
            state.update(BucketState(seen))
            state.setTimeoutTimestamp(seen.map(_._3).max + delayMs)
            out.result().iterator
          }
      }
  }
}
