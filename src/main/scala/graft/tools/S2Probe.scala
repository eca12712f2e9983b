package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spatial.SpatialOps

/** Cell-encoder throughput probe: the Z/Morton density vs the S2 density on
  * the same 600k synthetic points. This is the probe that caught the
  * unrolled-Column S2 form at 30.7 s vs z 0.59 s (the sequential Hilbert
  * state duplicated per level — no let-binding in Catalyst; BASELINE.md
  * round 5) and verified the native-kernel fix at 0.44 s. Kept as the
  * regression check for the encoder hot path.
  *
  * Usage: runMain graft.tools.S2Probe [nPoints]
  */
object S2Probe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 600000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = spark.range(0, n).select(
      (col("id") % 1700 / 10.0 - 85.0).as("lat"),
      (col("id") % 3600 / 10.0 - 180.0).as("lon")).cache()
    pts.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val z = pts.select(SpatialOps.cellId(col("lat"), col("lon"), 12).as("c"))
      .groupBy("c").count()
    time("z warm")(z.count()); time("z")(z.count())
    val s2 = pts.select(SpatialOps.s2CellId(col("lat"), col("lon"), 12).as("c"))
      .groupBy("c").count()
    time("s2 warm")(s2.count()); time("s2")(s2.count())
    val h = pts.select(SpatialOps.hilbertCellId(col("lat"), col("lon"), 12).as("c"))
      .groupBy("c").count()
    time("hilbert warm")(h.count()); time("hilbert")(h.count())
    spark.stop()
  }
}
