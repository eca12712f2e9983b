package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.DeterministicGen
import graft.spatial.{HCell, SpatialLayout, ZCell}

/** Space-filling-curve comparison for the clustered layout: the SAME boxes
  * over the SAME points stored Z-clustered vs HILBERT-clustered
  * (SpatialLayout `curve` option). Two measurements:
  *
  *  1. Fragmentation sweep (pure driver math, no I/O): for a population of
  *     random boxes, the merged-range count each curve needs to cover the
  *     IDENTICAL cell set (shared budget rule — HCell.coverRanges scaladoc).
  *     Fewer ranges = a smaller pushed Or-of-ranges filter tree for the
  *     same prune precision; Hilbert's edge-adjacency is the known-better
  *     clusterer (Moon et al., "Analysis of the clustering properties of
  *     the Hilbert space-filling curve", TKDE 2001).
  *
  *  2. Physical scan legs: both layouts materialized from identical bytes
  *     (same numFiles, same coarse dirs — pcell is curve-agnostic), the
  *     BboxProbe box ladder driven through bboxFilter on each; counts
  *     asserted equal, wall + files-read reported per curve.
  *
  * Usage: runMain graft.tools.CurveProbe [nPoints]
  */
object CurveProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 24000000L

    // --- leg 1: fragmentation sweep (no Spark) -----------------------------
    val rng = new scala.util.Random(41)
    val fine = 16
    val budget = 128
    val sizes = Seq(0.05, 0.7, 8.0, 60.0)
    val stats = sizes.map { deg =>
      var zRuns = 0L; var hRuns = 0L; var boxesWonH = 0; var ties = 0
      val trials = 200
      (1 to trials).foreach { _ =>
        val la = rng.nextDouble() * (170 - deg) - 85
        val lo = rng.nextDouble() * (360 - deg) - 180
        val z = ZCell.coverRanges(la, la + deg, lo, lo + deg, fine, budget).size
        val h = HCell.coverRanges(la, la + deg, lo, lo + deg, fine, budget).size
        zRuns += z; hRuns += h
        if (h < z) boxesWonH += 1 else if (h == z) ties += 1
      }
      println(f"CURVE frag ${deg}%5.2f°  z=${zRuns / trials.toDouble}%6.1f ranges  " +
        f"h=${hRuns / trials.toDouble}%6.1f ranges  ratio=${zRuns.toDouble / hRuns}%4.2f  " +
        f"hilbert wins $boxesWonH/$trials (ties $ties)")
      (deg, zRuns.toDouble / trials, hRuns.toDouble / trials, zRuns.toDouble / hRuns)
    }

    // --- leg 2: physical layouts -------------------------------------------
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def points: DataFrame = DeterministicGen.hotspotMixPointsDF(spark, n)

    val zPath = s"/root/repo/target/bench/bbox_z_n$n" // shared with BboxProbe
    if (!new java.io.File(zPath + "/_SUCCESS").exists())
      SpatialLayout.materialize(points, zPath, coarseLevel = 4,
        fineLevel = 16, numFiles = 256)
    val hPath = s"/root/repo/target/bench/bbox_h_n$n"
    if (!new java.io.File(hPath + "/_SUCCESS").exists())
      SpatialLayout.materialize(points, hPath, coarseLevel = 4,
        fineLevel = 16, numFiles = 256, curve = "hilbert")
    val zLayout = spark.read.parquet(zPath)
    val hLayout = spark.read.parquet(hPath)

    val boxes = Seq(
      ("block", 48.85, 48.90, 2.33, 2.38),
      ("city", 48.5, 49.2, 2.0, 2.7),
      ("region", 45.0, 53.0, -2.0, 6.0),
      ("continent", 20.0, 80.0, -30.0, 30.0))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = { f; Seq(time(f), time(f), time(f)).sorted.apply(1) }

    var rows = Seq.newBuilder[String]
    boxes.foreach { case (name, latMin, latMax, lonMin, lonMax) =>
      val zq = SpatialLayout.bboxFilter(zLayout, latMin, latMax, lonMin, lonMax)
      val hq = SpatialLayout.bboxFilter(hLayout, latMin, latMax, lonMin, lonMax)
      val zc = zq.count(); val hc = hq.count()
      require(zc == hc, s"$name: z $zc != hilbert $hc")
      val zRead = zq.select(input_file_name()).distinct().count()
      val hRead = hq.select(input_file_name()).distinct().count()
      val zRanges = ZCell.coverRanges(latMin, latMax, lonMin, lonMax, 16, 128).size
      val hRanges = HCell.coverRanges(latMin, latMax, lonMin, lonMax, 16, 128).size
      val zT = med3(zq.count()); val hT = med3(hq.count())
      println(f"CURVE $name%-10s rows=$zc%10d  z=$zT%6.2f s ($zRead files, $zRanges ranges)  " +
        f"h=$hT%6.2f s ($hRead files, $hRanges ranges)")
      rows += f""""$name":{"rows":$zc,"z_sec":$zT%.3f,"h_sec":$hT%.3f,"z_files":$zRead,"h_files":$hRead,"z_ranges":$zRanges,"h_ranges":$hRanges}"""
    }
    val frag = stats.map { case (deg, z, h, r) =>
      f""""$deg%.2f":{"z_ranges":$z%.1f,"h_ranges":$h%.1f,"ratio":$r%.2f}"""
    }.mkString(",")
    println(s"""{"curve_probe":true,"points":$n,"frag":{$frag},${rows.result().mkString(",")}}""")
    spark.stop()
  }
}
