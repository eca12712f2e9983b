package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.fixtures.DeterministicGen

/** S2-clustered layout conformance: cap-pruned scans equal the exact
  * haversine filter on every cap shape (pole-centered, antimeridian,
  * budget-coarsened wide caps), physical plan pins (directory pruning +
  * pushed scell ranges), and metadata-less degradation. */
class S2LayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val nodesDF = {
    val els = DeterministicGen.elements(0.001)
    els.filter(_.otype == "node")
      .map(e => (e.docId, e.id, e.lat.get, e.lon.get))
      .toDF("doc_id", "id", "lat", "lon")
  }

  private lazy val layoutPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-s2layout").toString
    S2Layout.materialize(nodesDF, dir, coarseLevel = 3, fineLevel = 12,
      numFiles = 8)
    dir
  }

  private val caps = Seq(
    (48.905, 2.405, 500e3),    // mid-latitude city cap
    (84.005, 0.005, 1500e3),   // near-pole (the equirect layout's bad case)
    (-89.5, 77.0, 800e3),      // south pole crossing
    (0.005, 179.995, 3000e3),  // antimeridian (wide enough to catch fixture rows)
    (-33.905, 151.205, 8000e3)) // wide cap — forces budget coarsening

  test("capFilter equals the exact haversine filter on every cap shape") {
    val layout = spark.read.parquet(layoutPath)
    caps.foreach { case (qla, qlo, r) =>
      val got = S2Layout.capFilter(layout, qla, qlo, r)
        .select("id").as[Long].collect().sorted
      val want = nodesDF.filter(SpatialOps.haversineMeters(
          col("lat"), col("lon"), lit(qla), lit(qlo)) <= r)
        .select("id").as[Long].collect().sorted
      assert(got.toSeq === want.toSeq,
        s"cap ($qla,$qlo,$r): ${got.length} vs ${want.length}")
      assert(want.nonEmpty, s"degenerate cap ($qla,$qlo,$r) matched nothing")
    }
  }

  test("cap prunes partition directories and pushes scell ranges") {
    val layout = spark.read.parquet(layoutPath)
    val df = S2Layout.capFilter(layout, 48.905, 2.405, 500e3)
    val p = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[ps2#\\d+ IN(SET | \\()".r.findFirstIn(p).isDefined,
      s"missing ps2 directory pruning in:\n$p")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metadata.getOrElse("PushedFilters", "").contains("scell"),
      s"scell ranges not pushed: ${scan.metadata.getOrElse("PushedFilters", "")}")
    val readFiles = df.select(input_file_name()).distinct().count()
    val allFiles = layout.select(input_file_name()).distinct().count()
    assert(readFiles < allFiles, s"cap read all $allFiles files")
  }

  test("a metadata-less table degrades to the exact filter") {
    val got = S2Layout.capFilter(nodesDF, 48.905, 2.405, 500e3)
      .select("id").as[Long].collect().sorted
    val want = nodesDF.filter(SpatialOps.haversineMeters(
        col("lat"), col("lon"), lit(48.905), lit(2.405)) <= 500e3)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
  }
}
