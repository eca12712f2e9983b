package graft.exprs

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.ops.TextOps

/** The codegen'd winnowing kernel: exact equivalence with the HOF oracle
  * pipeline it replaced (values AND first-occurrence order), edge cases the
  * fixture can't hit (unicode, whitespace runs, short/empty docs), the
  * codegen pin, and the plan-shape regression the kernel exists to fix. */
class WinnowKernelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val documents =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  private def compare(df: org.apache.spark.sql.DataFrame, text: String,
                      k: Int, w: Int): Unit = {
    val both = TextOps.winnowedFingerprints(
      TextOps.winnowedFingerprintsHof(df, col(text), "hof", k, w),
      col(text), "kernel", k, w)
    val rows = both.select(col(text), col("hof"), col("kernel")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](2) === r.getSeq[Long](1),
        s"kernel != HOF for <${r.get(0)}> (k=$k, w=$w)")
    }
  }

  test("kernel equals the HOF oracle on the documents fixture, several (k,w)") {
    for ((k, w) <- Seq((8, 4), (5, 1), (2, 9), (12, 3)))
      compare(documents.select(col("text")), "text", k, w)
  }

  test("kernel equals the HOF oracle on adversarial edge-case strings") {
    val edge = Seq(
      "",                          // empty → hash of ""
      "   ",                       // spaces only → trim to ""
      "a",                         // shorter than k
      "ab",                        // == smallest k boundary
      "short",                     // < default k
      "exactly8",                  // == k: one gram
      "exactly8+",                 // k+1: two grams
      " \t leading and\ttabs\n and newlines \r\n collapsed ",
      "UPPER lower MiXeD CaSe",
      "Straße İstanbul ΣΟΦΟΣ œuf", // non-ASCII lowercasing
      "日本語のテキストです。マルチバイト文字。", // multi-byte code points
      "aaaaaaaaaaaaaaaaaaaaaaaa",  // degenerate: all grams identical
      "ab" * 40,                   // periodic text: heavy dedup
      "x y " + ("z" * 3) + "  double  spaces   everywhere")
      .toDF("text")
    for ((k, w) <- Seq((8, 4), (3, 2), (2, 1)))
      compare(edge, "text", k, w)
  }

  test("null text yields null; type mismatch is rejected") {
    val df = spark.sql("SELECT cast(null as string) AS text")
    assert(df.select(TextOps.winnowedFingerprintsCol(col("text"))).collect()(0).isNullAt(0))
    val err = intercept[Exception] {
      spark.range(1).select(TextOps.winnowedFingerprintsCol(col("id"))).collect()
    }
    assert(err.getMessage.contains("winnow_fingerprints") ||
      err.getMessage.toLowerCase.contains("type"))
  }

  test("fingerprinting runs inside whole-stage codegen via the kernel") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val cg = try {
      val df = TextOps.winnowedFingerprints(
        documents.select(col("doc_id"), col("text")), col("text"), "fps")
        .select(col("doc_id"), explode(col("fps")).as("f"))
      import org.apache.spark.sql.execution.debug._
      codegenString(df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(cg.contains("WinnowKernel"), s"kernel call missing from codegen:\n$cg")
  }

  test("explode + self-join of fingerprints stays fast (the 315 s regression)") {
    // pre-kernel, this shape re-inlined the whole HOF tree per element and
    // took minutes for a few hundred docs; with the kernel it is sub-second
    val fps = TextOps.winnowedFingerprints(
      documents.select(col("doc_id").as("key"), col("text")), col("text"), "fps")
      .select("key", "fps")
    val e = fps.select(col("key"), explode(col("fps")).as("f"))
    val t0 = System.nanoTime()
    val n = e.alias("l").join(e.alias("r"), "f")
      .filter(col("l.key") < col("r.key")).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n > 0)
    assert(sec < 30.0, f"fingerprint explode+join took $sec%.1f s")
  }
}
