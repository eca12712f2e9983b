package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestSession

case class DocEvent(doc_id: Long, text: String, ts: Timestamp)

/** Streaming exact dedup: duplicate texts arriving within the watermark are
  * dropped; the surviving set has exactly one row per fingerprint group and
  * the group count matches the batch operator's. */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("watermarked streaming dedup keeps one row per fingerprint group") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1_700_000_000_000L
    // 60 docs over 20 distinct texts (whitespace/case variants collapse to
    // the same normalized fingerprint), timestamps a second apart
    val events = (0 until 60).map { i =>
      val base = s"document number ${i % 20} body"
      val variant = (i / 20) match {
        case 0 => base
        case 1 => base.toUpperCase // fingerprint lowers: same group
        case _ => "  " + base.replace(" ", "  ") + " " // whitespace-normalized
      }
      DocEvent(i.toLong, variant, new Timestamp(t0 + i * 1000L))
    }

    val stream = MemoryStream[DocEvent]
    val query = StreamingDedup.exactDedup(stream.toDF(), col("text"), "ts", "10 minutes")
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    events.grouped(15).foreach { chunk => stream.addData(chunk); query.processAllAvailable() }
    query.stop()

    val got = spark.table("sd_out").collect()
    assert(got.length === 20, s"expected one survivor per group, got ${got.length}")

    // survivor set has the same fingerprint groups as the batch operator
    val batch = graft.ops.Dedup.exactDedup(
      events.toDF(), col("text"), col("doc_id"))
    assert(batch.count() === 20)
    val fpOf = (df: org.apache.spark.sql.DataFrame) => df
      .select(graft.ops.TextOps.fingerprint(col("text"))).collect()
      .map(_.getLong(0)).toSet
    assert(fpOf(spark.table("sd_out")) === fpOf(batch))

    // first-arrival policy: every survivor is the earliest doc_id of its group
    got.foreach { r => assert(r.getLong(0) < 20, s"late duplicate survived: $r") }
  }
}
