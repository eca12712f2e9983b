package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compile.Compiler
import graft.fixtures.DeterministicGen
import graft.ofl.Parser
import graft.ops.Dedup

/** Round-6 optimization harness (guide §1): isolated per-path measurements
  * with the noop sink plus `.explain("formatted")` capture, SEPARATE from
  * the frozen `graft.Bench` driver contract. Numbers from here are cited in
  * OPTIMIZATION_r06.md; plan files land in plans/r06/.
  *
  * Usage: runMain graft.tools.BenchExtra <suite> [args]
  *   spans    — HOF deriveHof vs codegen'd derive over the bench filter suite
  *   winnow   — winnowedDupPairs stage timings at a given doc count
  *   plan <name> <file> — dump the named query's formatted plan
  */
object BenchExtra {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** warm + median of 3 (the frozen bench's protocol). */
  private def median3[A](f: => A): Double = {
    f
    Seq(time(f), time(f), time(f)).sorted.apply(1)
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val suite = if (args.nonEmpty) args(0) else "spans"
    val spark = session()
    suite match {
      case "spans"  => spans(spark)
      case "winnow" => winnow(spark, if (args.length > 1) args(1).toLong else 200000L)
      case other    => sys.error(s"unknown suite '$other'")
    }
    spark.stop()
  }

  /** The bench's filter suite over the in-flight span-decode views: the HOF
    * reference (deriveHof — what `derive` was through round 5) vs the
    * codegen'd pruned decode (`derive` since round 6). Same count() action
    * as the frozen bench rows. */
  private def spans(spark: SparkSession): Unit = {
    val docs = spark.read.parquet("/root/repo/target/bench/docs_n600000")
    val hof = graft.model.OsmView.deriveHof(docs)
    val fast = graft.model.OsmView.derive(docs)
    var tHof = 0.0; var tFast = 0.0
    graft.Bench.filterSuite.foreach { src =>
      val pred = Compiler.compileEffective(Parser.parse(src))
      spark.sparkContext.setJobDescription(s"spans-hof: $src")
      tHof += median3(hof.filter(pred).count())
      spark.sparkContext.setJobDescription(s"spans-fast: $src")
      tFast += median3(fast.filter(pred).count())
    }
    println(f"""{"spans_hof_sec":$tHof%.3f,"spans_derive_sec":$tFast%.3f}""")
  }

  /** Stage-isolated winnow timings on the unbounded-vocab fixture the bench
    * monsters use: kernel-only pass (noop over the exploded rows), then the
    * full operator. */
  private def winnow(spark: SparkSession, n: Long): Unit = {
    val parts = 64
    val p = s"/root/repo/target/bench/hvdocs_dist_n${n}_vinf_p$parts"
    if (!new java.io.File(p + "/_SUCCESS").exists())
      DeterministicGen.highVocabDocsDF(spark, n, vocab = Long.MaxValue)
        .repartition(parts)
        .write.mode("overwrite").parquet(p)
    val d = spark.read.parquet(p).cache()
    d.count()
    spark.sparkContext.setJobDescription("winnow: kernel-only explode (noop)")
    val tKernel = median3(noop(
      graft.ops.TextOps.winnowedFingerprints(
        d.select(col("doc_id").as("key"), col("text").as("__text")),
        col("__text"), "fps", 8, 4)
        .select(col("key"), explode(col("fps")).as("f"))))
    spark.sparkContext.setJobDescription("winnow: full operator")
    val tFull = median3(
      Dedup.winnowedDupPairs(d, col("text"), col("doc_id"),
        k = 8, w = 4, threshold = 0.8, maxDocFreq = 1000).count())

    // cumulative stage ladder (each includes its predecessors): checkpoint,
    // + df table, + candidate gen, + sharedRare — mirrors the operator body
    def ladder(stage: String): Double = {
      def run(): Long = {
        val fmat = graft.ops.TextOps.winnowedFingerprints(
          d.select(col("doc_id").as("key"), col("text").as("__text")),
          col("__text"), "fps", 8, 4)
          .select(col("key"), size(col("fps")).as("nt"), col("fps"))
          .localCheckpoint(true)
        if (stage == "ckpt") return fmat.rdd.getNumPartitions.toLong
        val e = fmat.select(col("key"), explode(col("fps")).as("f"))
        val wDf = org.apache.spark.sql.expressions.Window.partitionBy("f")
        val ef = e.withColumn("df", count(lit(1)).over(wDf))
        if (stage == "dfs") { noop(ef.select(col("f"), col("df"))); return 0L }
        val gen = ef.filter(col("df") >= 2 && col("df") <= 1000)
        if (stage == "gen") { noop(gen); return 0L }
        val l = gen.select(col("f"), col("key").as("key_a"))
        val r = gen.select(col("f"), col("key").as("key_b"))
        val sharedRare = l.join(r, Seq("f"))
          .filter(col("key_a") < col("key_b"))
          .groupBy("key_a", "key_b").agg(count(lit(1)).as("shared_rare"))
        noop(sharedRare); 0L
      }
      spark.sparkContext.setJobDescription(s"winnow ladder: $stage")
      run() // warm
      Seq(time(run()), time(run())).min
    }
    val tCkpt = ladder("ckpt")
    val tDfs = ladder("dfs")
    val tGen = ladder("gen")
    val tShared = ladder("shared")
    d.unpersist()
    println(f"""{"n":$n,"winnow_kernel_noop_sec":$tKernel%.3f,"winnow_ckpt_sec":$tCkpt%.3f,"winnow_dfs_sec":$tDfs%.3f,"winnow_gen_sec":$tGen%.3f,"winnow_shared_sec":$tShared%.3f,"winnow_full_sec":$tFull%.3f}""")
  }
}
