package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spatial.SpatialOps

/** Diagnostic: where does spatial_knn wall time go, and what does the
  * two-phase rank cost per trial at bench scale? Times the bench's exact
  * knn row (sf0.1 view nodes, 99 hotspot queries, level 14, maxRing 2) at
  * rankSalts = 1 (single window, the r3 shape) vs 64 (two-phase), warm +
  * median-of-3 each, plus a construction-only timing (the eager
  * localCheckpoint ladder + analysis that every trial re-pays).
  *
  * Usage: runMain graft.tools.KnnRankProbe [viewPath]
  */
object KnnRankProbe {
  def main(args: Array[String]): Unit = {
    val viewPath = if (args.nonEmpty) args(0)
      else "/root/repo/target/bench/docs_n600000_view_h2"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nodes = spark.read.parquet(viewPath).filter(col("type") === "node")
      .select(col("doc_id"), col("lat"), col("lon")).cache()
    nodes.count()
    val queries = graft.fixtures.DeterministicGen.hotspots.zipWithIndex.flatMap {
      case ((la, lo), i) =>
        (0 until 33).map(j => ((i * 33 + j).toLong, la + j * 0.003, lo + j * 0.002))
    }.toDF("query_id", "lat", "lon")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = {
      f; Seq(time(f), time(f), time(f)).sorted.apply(1)
    }

    for (salts <- Seq(1, 64)) {
      val full = med3(
        SpatialOps.knn(nodes, queries, 10, level = 14, maxRing = 2,
          rankSalts = salts).count())
      // construction only: the checkpoint ladder runs during knn(), before
      // any caller action
      val build = med3(
        SpatialOps.knn(nodes, queries, 10, level = 14, maxRing = 2,
          rankSalts = salts))
      println(f"KNN salts=$salts%-3d full=$full%.2f s  build=$build%.2f s  rank_delta=${full - build}%.2f s")
    }
    spark.stop()
  }
}
