package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spatial.SpatialOps
object S2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = spark.range(0, 600000).select(
      (col("id") % 1700 / 10.0 - 85.0).as("lat"), (col("id") % 3600 / 10.0 - 180.0).as("lon")).cache()
    pts.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val z = pts.select(SpatialOps.cellId(col("lat"), col("lon"), 12).as("c")).groupBy("c").count()
    time("z warm")(z.count()); time("z")(z.count())
    val s2 = pts.select(SpatialOps.s2CellId(col("lat"), col("lon"), 12).as("c")).groupBy("c").count()
    println("s2 expr tree size: " + s2.queryExecution.optimizedPlan.expressions.map(_.collect{case e=>e}.size).sum)
    time("s2 warm")(s2.count()); time("s2")(s2.count())
    spark.stop()
  }
}
