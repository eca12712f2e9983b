package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: full-view materialization cost — per-field HOF derivation vs the
  * single-pass DecodeOsmSpans expression. Full materialization needs every
  * field, which is the case the single-pass decoder targets (filters with
  * narrow field footprints are better served by the per-field derivation,
  * which Catalyst prunes). */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "8"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/repo/target/bench/docs_n600000")
    def time(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
    val slowOut = java.nio.file.Files.createTempDirectory("dv-slow").toString
    val fastOut = java.nio.file.Files.createTempDirectory("dv-fast").toString
    // warm
    graft.model.OsmView.deriveHof(docs).limit(1000).collect()
    graft.model.OsmView.deriveFast(docs).limit(1000).collect()
    val tSlow = time(graft.model.OsmView.deriveHof(docs)
      .write.mode("overwrite").parquet(slowOut))
    val tFast = time(graft.model.OsmView.deriveFast(docs)
      .write.mode("overwrite").parquet(fastOut))
    println(f"""{"decode_bench":true,"cpus":$cpus,"materialize_hof_sec":$tSlow%.2f,"materialize_fast_sec":$tFast%.2f}""")
    spark.stop()
  }
}
