package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Kernel-vs-HOF microbench for the embedding dot product (VectorDot
  * evidence, BASELINE.md round 3). */
object VecBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.FilterEngine.session(master = "local[16]", appName = "vec-bench")
    // the sf0.1 embeddings table (2k rows) is fixed-cost-dominated; generate
    // a deterministic corpus big enough that the per-element math is the cost
    val nVec = if (args.nonEmpty) args(0).toLong else 2000000L
    val emb = graft.fixtures.DeterministicGen.embeddingsDF(spark, nVec, dim = 64)
      .cache()
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def med3(f: => Unit): Double = { f; Seq(time(f), time(f), time(f)).sorted.apply(1) }

    val kernel = Similarity.bruteTopK(emb, q, 10)
    // HOF variant of the same query (the pre-kernel formulation)
    def cosHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val d = Similarity.normHof(a) * Similarity.normHof(b)
      when(d === 0, lit(0.0)).otherwise(Similarity.dotHof(a, b) / d)
    }
    val qq = q.select(col("query_id"), col("embedding").as("q_emb"))
    val hof = emb.crossJoin(broadcast(qq))
      .withColumn("cos", cosHof(col("embedding"), col("q_emb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    val hofTopk = hof.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)

    val tK = med3(kernel.count())
    val tH = med3(hofTopk.count())
    println(f"""{"vec_bench":true,"rows":$n,"kernel_sec":$tK%.3f,"hof_sec":$tH%.3f,"speedup":${tH / tK}%.2f}""")
    spark.stop()
  }
}
