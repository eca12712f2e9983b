package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.DeterministicGen
import graft.spatial.{S2Layout, SpatialLayout}

/** Polar-cap scan comparison: the SAME pole-centered cap answered through
  * (a) the S2-clustered layout ([[S2Layout.capFilter]]) and (b) the
  * equirect Z layout ([[SpatialLayout.bboxFilter]] with the cap's exact
  * lat-band equivalent — a pole cap IS `lat ≥ 90 − (r/R)·(180/π)`, so both
  * paths return identical rows and the comparison isolates the LAYOUTS.
  * This probes the S2Layout scaladoc's polar claim with numbers: the
  * equirect grid's polar cells are area-starved (many cells, few rows),
  * the S2 grid's are near-uniform. Also runs a mid-latitude cap where the
  * two layouts should be comparable.
  *
  * Usage: runMain graft.tools.CapProbe [nPoints]
  */
object CapProbe {
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

    val zPath = s"/root/repo/target/bench/bbox_z_n$n" // shared with BboxProbe
    if (!new java.io.File(zPath + "/_SUCCESS").exists())
      SpatialLayout.materialize(DeterministicGen.hotspotMixPointsDF(spark, n),
        zPath, coarseLevel = 4, fineLevel = 16, numFiles = 256)
    val sPath = s"/root/repo/target/bench/cap_s2_n$n"
    if (!new java.io.File(sPath + "/_SUCCESS").exists())
      S2Layout.materialize(DeterministicGen.hotspotMixPointsDF(spark, n),
        sPath, coarseLevel = 4, fineLevel = 16, numFiles = 256)
    val zLayout = spark.read.parquet(zPath)
    val s2Layout = spark.read.parquet(sPath)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = { f; Seq(time(f), time(f), time(f)).sorted.apply(1) }

    val R = graft.spatial.S2Cell.EarthRadiusMeters
    // (label, cap lat, cap lon, radius m) — polar caps + a mid-latitude one
    val caps = Seq(
      ("pole_300km", 90.0, 0.0, 300e3),
      ("pole_1000km", 90.0, 0.0, 1000e3),
      ("midlat_300km", 48.85, 2.35, 300e3))
    var rows = Seq.newBuilder[String]
    caps.foreach { case (name, qla, qlo, r) =>
      val s2q = S2Layout.capFilter(s2Layout, qla, qlo, r)
      // the Z layout answers the cap as its bbox superset + the same
      // exact haversine refine (pole caps: a pure lat band; mid-lat:
      // lat/lon box with spherical lon widening)
      val rDeg = r / R * (180.0 / math.Pi)
      val (latMin, latMax) =
        (math.max(-90.0, qla - rDeg), math.min(90.0, qla + rDeg))
      val lonHalf =
        if (latMax >= 89.999 || latMin <= -89.999) 180.0
        else math.min(180.0, rDeg / math.cos(math.max(math.abs(latMin),
          math.abs(latMax)) * math.Pi / 180.0))
      val zq = SpatialLayout.bboxFilter(zLayout, latMin, latMax,
          math.max(-180.0, qlo - lonHalf), math.min(180.0, qlo + lonHalf))
        .filter(graft.spatial.SpatialOps.haversineMeters(
          col("lat"), col("lon"), lit(qla), lit(qlo)) <= r)
      val sc = s2q.count(); val zc = zq.count()
      require(sc == zc, s"$name: s2 $sc != z $zc")
      val sRead = s2q.select(input_file_name()).distinct().count()
      val zRead = zq.select(input_file_name()).distinct().count()
      val sT = med3(s2q.count()); val zT = med3(zq.count())
      println(f"CAP $name%-13s rows=$sc%9d  s2=$sT%6.2f s ($sRead files)  " +
        f"z=$zT%6.2f s ($zRead files)")
      rows += f""""$name":{"rows":$sc,"s2_sec":$sT%.3f,"z_sec":$zT%.3f,"s2_files":$sRead,"z_files":$zRead}"""
    }
    // partition-size balance: the equirect grid's coarse cells shrink in
    // area toward the poles (uneven directory sizes at planetary scale);
    // S2 cells are near-uniform. Report max/mean directory row-share.
    def dirBalance(df: org.apache.spark.sql.DataFrame, part: String): (Long, Double) = {
      val counts = df.groupBy(part).count().select("count")
        .collect().map(_.getLong(0))
      (counts.length.toLong, counts.max.toDouble / (counts.sum.toDouble / counts.length))
    }
    val (zDirs, zSkew) = dirBalance(zLayout, SpatialLayout.PartCol)
    val (sDirs, sSkew) = dirBalance(s2Layout, S2Layout.PartCol)
    println(f"CAP dir-balance  z: $zDirs dirs, max/mean ${zSkew}%.1f   " +
      f"s2: $sDirs dirs, max/mean ${sSkew}%.1f")
    println(s"""{"cap_probe":true,"points":$n,"z_dirs":$zDirs,"z_dir_skew":$zSkew,"s2_dirs":$sDirs,"s2_dir_skew":$sSkew,${rows.result().mkString(",")}}""")
    spark.stop()
  }
}
