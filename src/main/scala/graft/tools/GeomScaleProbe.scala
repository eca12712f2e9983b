package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spatial.{GeomOps, SpatialOps, ZCell}

/** Phase-level breakdown of the distance-join pipeline at one master, to
  * localize the 4N scaling stall the round-5 geom pair measured (N=71 s →
  * 4N=63 s, efficiency 0.28, probes idle both ends): times the build-side
  * cover explode alone, the probe-side cell assignment alone, then the full
  * join, and prints the physical join node chosen.
  *
  * Usage: runMain graft.tools.GeomScaleProbe <master> [ptsN]
  */
object GeomScaleProbe {
  def main(args: Array[String]): Unit = {
    val master = if (args.nonEmpty) args(0) else "local[8]"
    val cores: Int = "local-cluster\\[(\\d+),(\\d+),".r.findFirstMatchIn(master)
      .map(m => m.group(1).toInt * m.group(2).toInt)
      .orElse("local\\[(\\d+)\\]".r.findFirstMatchIn(master).map(_.group(1).toInt))
      .getOrElse(8)
    val jdk17Opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
      "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
    val spark = (if (master.startsWith("local-cluster")) {
      val jar = new java.io.File("target/scala-2.13")
        .listFiles().filter(_.getName.endsWith(".jar")).maxBy(_.lastModified).getAbsolutePath
      builder.config("spark.jars", jar)
        .config("spark.executor.memory", "5g")
        .config("spark.executor.extraJavaOptions", jdk17Opens)
    } else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ptsN = if (args.length > 1) args(1).toLong else 12000000L
    val points = spark.read.parquet(s"/root/repo/target/bench/pts_dist_n$ptsN")
      .withColumnRenamed("doc_id", "id")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bestOf2(f: => Unit): Double = { f; math.min(time(f), time(f)) }

    val level = 21
    val rLatDeg = 5.0 / (math.Pi * 6371008.8 / 180.0)
    val coverUdf = udf { (lat: Double, lon: Double) =>
      val sinR = math.sin(math.toRadians(rLatDeg))
      val cosPhi = math.cos(math.toRadians(lat))
      val hw = if (sinR >= cosPhi) 180.0 else math.toDegrees(math.asin(sinR / cosPhi))
      GeomOps.discCover(lat, lon, rLatDeg, hw, level)
    }
    val b = points.select(col("id").as("key_b"),
      col("lat").as("lat_b"), col("lon").as("lon_b"))
      .withColumn("cell", explode(coverUdf(col("lat_b"), col("lon_b"))))
    val a = points.select(col("id").as("key_a"),
      col("lat").as("lat_a"), col("lon").as("lon_a"))
      .withColumn("cell", SpatialOps.cellId(col("lat_a"), col("lon_a"), level))

    val tA = bestOf2(a.count())
    println(f"PHASE a_cells $tA%.2f s")
    val bCount = b.count()
    val tB = bestOf2(b.count())
    println(f"PHASE b_explode $tB%.2f s ($bCount rows)")
    val joined = GeomOps.withinDistanceMeters(points, 5.0, level = level)
    val nPairs = joined.count()
    val tJ = bestOf2(joined.count())
    println(f"PHASE full_join $tJ%.2f s ($nPairs pairs)")
    val plan = joined.queryExecution.executedPlan.toString
    println("JOIN_NODE " + plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange")).take(6).mkString(" | "))
    println(f"""{"geom_probe":true,"master":"$master","cores":$cores,"a_sec":$tA%.2f,"b_sec":$tB%.2f,"join_sec":$tJ%.2f,"b_rows":$bCount,"pairs":$nPairs}""")
    spark.stop()
  }
}
