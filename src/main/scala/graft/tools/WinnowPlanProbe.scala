package graft.tools

import org.apache.spark.sql.functions._

/** Prints the optimized plan of winnowedFingerprints to check whether the
  * staged projections survive CollapseProject or get re-inlined (which
  * turns the window pass O(n²) per row). */
object WinnowPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.FilterEngine.session(master = "local[4]", appName = "winnow-probe")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow-probe").toString
    Seq((1L, "some text body here that is long enough to produce several grams"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val df = graft.ops.TextOps.winnowedFingerprints(
      spark.read.parquet(dir), col("text"), "fps")
    val plan = df.queryExecution.optimizedPlan.toString
    println("PROJECT_COUNT=" + "Project".r.findAllIn(plan).size)
    println("NORM_INLINED_IN_WINDOWS=" +
      plan.split("\n").head.contains("regexp_replace"))
    println(plan.take(3000))
    spark.stop()
  }
}
