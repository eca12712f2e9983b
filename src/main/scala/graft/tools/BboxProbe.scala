package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.DeterministicGen
import graft.spatial.SpatialLayout

/** Z-order layout evidence: the SAME bbox queries over the SAME points,
  * stored (a) Z-clustered (SpatialLayout: coarse-cell dirs + fine-cell
  * sort) vs (b) hash-scattered parquet (the layout every non-spatial
  * pipeline produces by default). Three box sizes — city (~0.7°), region
  * (~8°), continent (~60°) — so the trendline over selectivity is visible,
  * plus the files-actually-read fraction per path (directory pruning +
  * row-group skipping are I/O effects; wall-clock alone under-sells them
  * on a page-cached local disk).
  *
  * The fixture is 70% hotspot-clustered / 30% uniform (deterministic hash
  * mixing, no RNG object), so dense-urban skew is present: the hot coarse
  * cells must split across range partitions or the write stage straggles.
  *
  * Usage: runMain graft.tools.BboxProbe [nPoints]
  */
object BboxProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 24000000L
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def points: DataFrame = DeterministicGen.hotspotMixPointsDF(spark, n)

    val zPath = s"/root/repo/target/bench/bbox_z_n$n"
    if (!new java.io.File(zPath + "/_SUCCESS").exists())
      SpatialLayout.materialize(points, zPath, coarseLevel = 4,
        fineLevel = 16, numFiles = 256)
    val flatPath = s"/root/repo/target/bench/bbox_flat_n$n"
    if (!new java.io.File(flatPath + "/_SUCCESS").exists())
      points.repartition(256, col("id"))
        .write.mode("overwrite").parquet(flatPath)
    val zLayout = spark.read.parquet(zPath)
    val flat = spark.read.parquet(flatPath)

    // boxes centered on the Paris hotspot so every size has real rows
    val boxes = Seq(
      ("block", 48.85, 48.90, 2.33, 2.38),
      ("city", 48.5, 49.2, 2.0, 2.7),
      ("region", 45.0, 53.0, -2.0, 6.0),
      ("continent", 20.0, 80.0, -30.0, 30.0))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = { f; Seq(time(f), time(f), time(f)).sorted.apply(1) }

    val zFiles = zLayout.select(input_file_name()).distinct().count()
    val fFiles = flat.select(input_file_name()).distinct().count()
    var rows = Seq.newBuilder[String]
    boxes.foreach { case (name, latMin, latMax, lonMin, lonMax) =>
      val zq = SpatialLayout.bboxFilter(zLayout, latMin, latMax, lonMin, lonMax)
      val exact = col("lat") >= latMin && col("lat") <= latMax &&
        col("lon") >= lonMin && col("lon") <= lonMax
      val fq = flat.filter(exact)
      val zc = zq.count(); val fc = fq.count()
      require(zc == fc, s"$name: pruned $zc != full $fc")
      val zRead = zq.select(input_file_name()).distinct().count()
      val fRead = fq.select(input_file_name()).distinct().count()
      val zT = med3(zq.count()); val fT = med3(fq.count())
      println(f"BBOX $name%-10s rows=$zc%10d  z=$zT%6.2f s ($zRead/$zFiles files)  " +
        f"flat=$fT%6.2f s ($fRead/$fFiles files)  ${fT / zT}%5.1fx")
      rows += f""""$name":{"rows":$zc,"z_sec":$zT%.3f,"flat_sec":$fT%.3f,"speedup":${fT / zT}%.2f,"z_files":$zRead,"flat_files":$fRead}"""
    }
    // pruned spatial join: the hotspot polygons (a few km across) against
    // the full corpus — the Z path reads only polygon-adjacent storage
    import spark.implicits._
    val polys = DeterministicGen.polygons()
      .map(p => (p.polygon_id, p.rings.map(_.map { case (la, lo) => (la, lo) })))
      .toDF("polygon_id", "rings")
      .withColumn("rings",
        col("rings").cast("array<array<struct<lat:double,lon:double>>>"))
    val zj = SpatialLayout.polygonJoin(zLayout, polys, level = 13)
    val fj = graft.spatial.SpatialOps.polygonJoin(flat, polys, level = 13)
    val zjc = zj.count(); val fjc = fj.count()
    require(zjc == fjc, s"join: pruned $zjc != full $fjc")
    val zjT = med3(zj.count()); val fjT = med3(fj.count())
    println(f"BBOX pip_join   rows=$zjc%10d  z=$zjT%6.2f s  flat=$fjT%6.2f s  ${fjT / zjT}%5.1fx")
    println(s"""{"bbox_probe":true,"points":$n,"total_files_z":$zFiles,"total_files_flat":$fFiles,${rows.result().mkString(",")},"pip_join":{"rows":$zjc,"z_sec":$zjT,"flat_sec":$fjT}}""")
    spark.stop()
  }
}
