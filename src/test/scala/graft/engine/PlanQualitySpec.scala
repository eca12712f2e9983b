package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.compile.Compiler
import graft.fixtures.DeterministicGen
import graft.ofl.Parser
import graft.spatial.SpatialOps

/** Physical-plan quality pins: these are the properties that make the plans
  * survive a 100 TB scale-up — filter pushdown into the parquet scan, column
  * pruning, partition pruning from the entity mask, broadcast for the small
  * join sides, and whole-stage codegen around the scalar predicate path. */
class PlanQualitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val viewPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-view").toString
    FilterEngine.materializeView(DeterministicGen.docsDF(spark, 0.001), dir)
    dir
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scalar predicates push down into the typed-view parquet scan") {
    val view = spark.read.parquet(viewPath)
    val p = plan(FilterEngine.filterView(view, "@version >= 2 and @uid > 100"))
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(version,2"), s"missing pushdown in:\n$p")
    assert(p.contains("GreaterThan(uid,100"), s"uid pushdown missing in:\n$p")
  }

  test("entity mask becomes a partition filter on the type-partitioned view") {
    val view = spark.read.parquet(viewPath)
    val p = plan(FilterEngine.filterView(view, "@closed_way"))
    assert(p.contains("PartitionFilters:") && p.contains("type#"),
      s"missing partition filter in:\n$p")
  }

  test("column pruning: an id-only query reads only the columns it needs") {
    val view = spark.read.parquet(viewPath)
    val df = FilterEngine.filterView(view, "@id > 100").select("id")
    val p = plan(df)
    val readSchema = "ReadSchema: ([^\\n]+)".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(readSchema.contains("id"), p)
    assert(!readSchema.contains("spans"), s"spans not pruned: $readSchema")
    assert(!readSchema.contains("tags"), s"tags not pruned: $readSchema")
  }

  test("hot-tag filters push down to the scan and equal the cold array path") {
    val view = spark.read.parquet(viewPath)
    // pushdown pin: the materialized t_highway column carries the predicate
    // into the parquet scan (IsNotNull enables null-count row-group skips,
    // EqualTo enables min/max skips)
    val p = plan(FilterEngine.filterView(view, "highway == residential"))
    assert(p.contains("IsNotNull(t_highway)"), s"missing IsNotNull pushdown in:\n$p")
    assert(p.contains("EqualTo(t_highway,residential)"), s"missing EqualTo pushdown in:\n$p")
    // bare-key and regex checks also reach the scan via IsNotNull
    val p2 = plan(FilterEngine.filterView(view, "highway =~ '_link$'"))
    assert(p2.contains("IsNotNull(t_highway)"), s"regex IsNotNull missing in:\n$p2")
    // semantic pin: hot compile == cold compile on every tag-check shape,
    // including a non-hot key (cold path intact) and negations
    for (e <- Seq("highway == residential", "highway != residential",
      "highway =~ 'prim'", "highway !~ 'prim'", "highway",
      "oneway == yes and not (building == '12')", "priority == 'x'",
      "not highway")) {
      val hot = FilterEngine.filterView(view, e).select("doc_id")
      val cold = view.filter(Compiler.compileEffective(Parser.parse(e)))
        .select("doc_id")
      assert(hot.exceptAll(cold).isEmpty && cold.exceptAll(hot).isEmpty,
        s"hot/cold mismatch for: $e")
    }
  }

  test("hot keys are derived from the corpus, not a static list (foreign-key fixture)") {
    // a corpus whose tag vocabulary shares NOTHING with the legacy OSM list:
    // rewrite every highway=/name= tag to zzcustom=/qqname= in the spans
    val docs = DeterministicGen.docsDF(spark, 0.001)
      .withColumn("spans", transform(col("spans"), s =>
        struct(
          s.getField("kind").as("kind"),
          regexp_replace(regexp_replace(s.getField("text"),
            "^highway=", "zzcustom="), "^name=", "qqname=").as("text"),
          s.getField("media_ref").as("media_ref"),
          s.getField("offset").as("offset"))))
    val dir = java.nio.file.Files.createTempDirectory("graft-view-foreign").toString
    FilterEngine.materializeView(docs, dir)
    val view = spark.read.parquet(dir)
    val hot = HotTags.forSchema(view.schema)
    assert(hot.contains("zzcustom") && hot.contains("qqname"),
      s"frequency derivation missed the corpus's own hot keys: $hot")
    assert(!hot.contains("highway") && !hot.contains("name"),
      s"stale static keys leaked into the derived map: $hot")
    // and the derived column actually carries the pushdown
    val p = plan(FilterEngine.filterView(view, "zzcustom == residential"))
    assert(p.contains("IsNotNull(t_zzcustom)") &&
      p.contains("EqualTo(t_zzcustom,residential)"),
      s"derived hot key not pushed in:\n$p")
    // semantic pin on the foreign key, hot vs cold
    val hotDf = FilterEngine.filterView(view, "zzcustom =~ 'prim'").select("doc_id")
    val coldDf = view.filter(Compiler.compileEffective(Parser.parse("zzcustom =~ 'prim'")))
      .select("doc_id")
    assert(hotDf.exceptAll(coldDf).isEmpty && coldDf.exceptAll(hotDf).isEmpty)
  }

  test("Z layout over the hot view composes all three prune layers in one scan") {
    // directory pruning (pcell), row-group skipping (zcell ranges), and the
    // hot-tag pushdown must coexist on a single parquet scan: the Z layout
    // carries the t_<key> columns AND their graft_hot_key metadata through
    val nodes = spark.read.parquet(viewPath).filter(col("type") === "node")
    val dir = java.nio.file.Files.createTempDirectory("graft-zhot").toString
    graft.spatial.SpatialLayout.materialize(nodes, dir, coarseLevel = 3,
      fineLevel = 14, numFiles = 8)
    val layout = spark.read.parquet(dir)
    val df = FilterEngine.filterView(
      graft.spatial.SpatialLayout.bboxFilter(layout, -20.005, 40.005,
        -100.005, 30.005),
      "highway == residential")
    val p = plan(df)
    assert("PartitionFilters: \\[pcell#\\d+ IN(SET | \\()".r.findFirstIn(p).isDefined,
      s"missing pcell directory pruning in:\n$p")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(zcell"),
      s"zcell ranges not pushed: $pushed")
    assert(pushed.contains("EqualTo(t_highway,residential)"),
      s"hot-tag predicate not pushed alongside the spatial prunes: $pushed")
    // and the composition is semantically exact vs the unpruned view path
    val want = spark.read.parquet(viewPath)
      .filter(col("type") === "node" &&
        col("lat") >= -20.005 && col("lat") <= 40.005 &&
        col("lon") >= -100.005 && col("lon") <= 30.005)
      .filter(Compiler.compileEffective(Parser.parse("highway == residential")))
      .select("doc_id")
    val got = df.select("doc_id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("whole-stage codegen covers the scalar filter path") {
    val view = spark.read.parquet(viewPath)
    val p = plan(FilterEngine.filterView(view, "@version >= 2 and @id != 7"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(p.contains("*(1) Filter"), s"no codegen span in:\n$p")
  }

  test("in-flight span filter decodes only the fields the predicate touches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    DeterministicGen.docsDF(spark, 0.001).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val df = FilterEngine.filter(docs, "@version >= 2").select("id")
    val optimized = df.queryExecution.optimizedPlan.toString
    val masks = "decode_osm_spans\\([^,)]+, (\\d+)\\)".r
      .findAllMatchIn(optimized).map(_.group(1).toInt).toSet
    import graft.exprs.SpanDecode._
    assert(masks === Set(FId, FVersion),
      s"expected only id+version decode passes, got masks $masks in:\n$optimized")
    // and the decode path itself runs inside whole-stage codegen
    val p = plan(df)
    assert("\\*\\(\\d+\\) Filter".r.findFirstIn(p).isDefined ||
      "\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined,
      s"no codegen span around the decode filter in:\n$p")
  }

  test("polygon join broadcasts the polygon side") {
    val nodes = spark.read.parquet(viewPath)
      .filter(col("type") === "node").select("doc_id", "lat", "lon")
    val polys = DeterministicGen.polygons()
      .map(p => (p.polygon_id, p.rings.map(_.map { case (la, lo) => (la, lo) })))
      .toDF("polygon_id", "rings")
      .withColumn("rings", col("rings").cast("array<array<struct<lat:double,lon:double>>>"))
    val p = plan(SpatialOps.polygonJoin(nodes, polys, level = 13))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"polygon side not broadcast in:\n$p")
  }

  test("complete-ways wanted-ids side is adaptive (AQE decides broadcast at runtime)") {
    val docs = DeterministicGen.docsDF(spark, 0.001)
    val df = FilterEngine.completeWays(docs, "highway == primary")
    df.count() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan"), s"AQE not active in:\n$p")
    assert(p.contains("LeftSemi"), s"not a semi join in:\n$p")
  }
}
