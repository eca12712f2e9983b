package graft.tools

import org.apache.spark.sql.functions._

/** Prints the optimized plan of the HOF winnowing pipeline
  * (winnowedFingerprintsHof — the diagnostic this probe was built for: the
  * staged projections do NOT survive under Generate/join consumers, which
  * turns the window pass O(n²) per row; production routes through the
  * codegen'd WinnowFingerprints kernel instead). */
object WinnowPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.FilterEngine.session(master = "local[4]", appName = "winnow-probe")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow-probe").toString
    Seq((1L, "some text body here that is long enough to produce several grams"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val df = graft.ops.TextOps.winnowedFingerprintsHof(
      spark.read.parquet(dir), col("text"), "fps")
    val plan = df.queryExecution.optimizedPlan.toString
    println("PROJECT_COUNT=" + "Project".r.findAllIn(plan).size)
    println("NORM_INLINED_IN_WINDOWS=" +
      plan.split("\n").head.contains("regexp_replace"))
    println(plan.take(3000))
    spark.stop()
  }
}
