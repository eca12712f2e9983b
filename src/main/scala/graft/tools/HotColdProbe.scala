package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.compile.Compiler
import graft.engine.{FilterEngine, HotTags}
import graft.fixtures.DeterministicGen
import graft.ofl.Parser

/** Hot-tag pushdown evidence: the SAME tag-filter suite over the SAME
  * materialized view, compiled hot (t_<key> columns, pushed predicates) vs
  * cold (tags-array lookup), at a row count where the scan dominates job
  * dispatch (the sf0.1 view is too small — its per-query wall is ~60%
  * fixed cost and run-to-run JIT drift swamps the delta). Only
  * tag-touching expressions are timed: attribute-only filters are
  * identical in both modes.
  *
  * Usage: runMain graft.tools.HotColdProbe [nDocs]
  */
object HotColdProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 6000000L
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsPath = s"/root/repo/target/bench/docs_dist_n$n"
    if (!new java.io.File(docsPath + "/_SUCCESS").exists())
      DeterministicGen.distributedDocs(spark, n,
        parts = math.max(128, (n / 200000).toInt))
        .write.mode("overwrite").partitionBy("type").parquet(docsPath)
    val viewPath = docsPath + "_view_h2"
    if (!new java.io.File(viewPath + "/_SUCCESS").exists())
      FilterEngine.materializeView(spark.read.parquet(docsPath), viewPath)
    val view = spark.read.parquet(viewPath)
    val nRows = view.count()
    val hotMap = HotTags.forSchema(view.schema)
    require(hotMap.nonEmpty, "view has no hot columns")

    // tag-touching subset of the bench suite + a high-selectivity key miss
    val suite = Seq(
      "highway == residential",
      "highway =~ '_link$'",
      "not (highway or building or landuse)",
      "amenity == restaurant and natural != tree",
      "'addr:housenumber' == '42a'")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = { f; Seq(time(f), time(f), time(f)).sorted.apply(1) }

    // counts must agree between modes (same semantics pin, at scale)
    suite.foreach { e =>
      val hot = view.filter(Compiler.compileEffective(Parser.parse(e), Compiler.noFiles, hotMap)).count()
      val cold = view.filter(Compiler.compileEffective(Parser.parse(e))).count()
      require(hot == cold, s"hot/cold count mismatch for $e: $hot vs $cold")
    }
    var tHot = 0.0; var tCold = 0.0
    suite.foreach { e =>
      val hotDf = view.filter(Compiler.compileEffective(Parser.parse(e), Compiler.noFiles, hotMap))
      val coldDf = view.filter(Compiler.compileEffective(Parser.parse(e)))
      val h = med3(hotDf.count()); val c = med3(coldDf.count())
      tHot += h; tCold += c
      println(f"HOTCOLD ${e.take(40)}%-40s hot=$h%.2f s cold=$c%.2f s  ${c / h}%.2fx")
    }
    println(f"""{"hotcold_probe":true,"rows":$nRows,"hot_sec":$tHot%.2f,"cold_sec":$tCold%.2f,"speedup":${tCold / tHot}%.2f,"hot_eps":${nRows * suite.size / tHot}%.0f,"cold_eps":${nRows * suite.size / tCold}%.0f}""")
    spark.stop()
  }
}
