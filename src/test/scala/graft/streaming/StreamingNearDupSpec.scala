package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.ops.Dedup

/** Streaming minhash near-dup: within one watermark window the emitted pair
  * set equals a batch recomputation with the SAME banding and signature
  * estimate (noise cancels — both sides use identical hashes), seeded exact
  * copies are guaranteed pairs, and members separated by more than the
  * event-time bound do not pair (state eviction). */
class StreamingNearDupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val ngram = 3; private val numHashes = 16; private val bands = 4
  private val threshold = 0.5

  /** Batch reference: banded candidates + signature-estimated jaccard —
    * the streaming operator's exact semantics, recomputed with joins. */
  private def batchEstPairs(docs: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
    val sig = docs.select(col("doc_id").as("key"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), ngram), numHashes).as("sig"))
    val banded = sig.select(col("key"), col("sig"),
      posexplode(Dedup.bandHashes(col("sig"), numHashes, bands)))
      .select(col("key"), col("sig"), col("pos").as("band"), col("col").as("bandhash"))
    val l = banded.select(col("band"), col("bandhash"),
      col("key").as("key_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bandhash"),
      col("key").as("key_b"), col("sig").as("sig_b"))
    val est = aggregate(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => (x === y).cast("int")), lit(0), (acc, v) => acc + v)
      .cast("double") / numHashes
    l.join(r, Seq("band", "bandhash")).filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), est.as("est"))
      .filter(col("est") >= threshold)
      .groupBy("key_a", "key_b").agg(first("est").as("est"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1)) -> r0.getDouble(2)).toMap
  }

  test("streaming near-dup pairs equal the batch banding + estimate within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1_700_000_000_000L
    val base = (0 until 30).map { i =>
      DocEvent(i.toLong, s"the quick document number $i talks about topic " +
        s"${"abcdef".charAt(i % 6)} with shared boilerplate text around it",
        new Timestamp(t0 + i * 1000L))
    }
    // 10 exact copies (guaranteed est = 1.0 in every band) + 5 near copies
    val copies = (0 until 10).map { i =>
      DocEvent(500L + i, base(i).text, new Timestamp(t0 + (40 + i) * 1000L))
    }
    val near = (0 until 5).map { i =>
      DocEvent(600L + i, base(i).text.replace("quick", "slow"),
        new Timestamp(t0 + (55 + i) * 1000L))
    }
    val events = base ++ copies ++ near

    val stream = MemoryStream[DocEvent]
    val query = StreamingNearDup.minhashNearDupPairs(
      stream.toDF(), col("text"), col("doc_id"), "ts", delayMs = 600_000L,
      ngram = ngram, numHashes = numHashes, bands = bands, threshold = threshold)
      .writeStream.format("memory").queryName("snd_out")
      .outputMode("append").start()
    events.grouped(12).foreach { chunk => stream.addData(chunk); query.processAllAvailable() }
    query.stop()

    val got = spark.table("snd_out").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap // dedup'd across bands
    val want = batchEstPairs(events.toDF())
    assert(got.keySet === want.keySet, "stream pair set != batch banding+estimate")
    got.foreach { case (k, est) => assert(est === want(k), s"estimate mismatch for $k") }
    // every seeded exact copy pairs with its source at estimate 1.0
    (0 until 10).foreach { i =>
      assert(got.get((i.toLong, 500L + i)).contains(1.0), s"exact copy $i missing")
    }
  }

  test("members separated by more than the event-time bound do not pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1_800_000_000_000L
    val a = DocEvent(1L, "a very distinctive sentence about winnowing rivers and salt",
      new Timestamp(t0))
    val fillers = (0 until 8).map(i => DocEvent(100L + i,
      s"completely unrelated filler text number $i with its own words",
      new Timestamp(t0 + 60_000L + i * 1000L)))
    val aCopy = a.copy(doc_id = 2L, ts = new Timestamp(t0 + 70_000L))

    val stream = MemoryStream[DocEvent]
    val query = StreamingNearDup.minhashNearDupPairs(
      stream.toDF(), col("text"), col("doc_id"), "ts", delayMs = 10_000L)
      .writeStream.format("memory").queryName("snd_evict")
      .outputMode("append").start()
    // batch 1: A; batch 2: fillers advance the watermark past A + delay;
    // batch 3: A's copy — must NOT pair (A evicted / beyond the bound)
    stream.addData(Seq(a)); query.processAllAvailable()
    stream.addData(fillers); query.processAllAvailable()
    stream.addData(Seq(aCopy)); query.processAllAvailable()
    query.stop()

    val pairs = spark.table("snd_evict").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 2L)),
      "pair across more than the event-time bound must not be emitted")
  }
}
