package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compile.Compiler
import graft.fixtures.DeterministicGen
import graft.ofl.Parser
import graft.ops.{Dedup, Similarity}
import graft.spatial.SpatialOps

/** Dumps `.explain("formatted")` for the bench-row DataFrames touched by the
  * round-6 optimization pass into plans/r06/<name>_<tag>.txt (tag = before/
  * after, from args). The DataFrames are built exactly like the frozen
  * Bench rows build them so the plan files match what the bench times.
  *
  * Usage: runMain graft.tools.PlanDump <tag> [name...]
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "after"
    val only = args.drop(1).toSet
    val spark = BenchExtra.session()
    import spark.implicits._

    val docs = spark.read.parquet("/root/repo/target/bench/docs_n600000")
    val typedView = spark.read.parquet("/root/repo/target/bench/docs_n600000_view_h2")
    val nodes = typedView.filter(col("type") === "node")
      .select(col("doc_id"), col("lat"), col("lon"))

    def hv(n: Long): DataFrame =
      spark.read.parquet(s"/root/repo/target/bench/hvdocs_dist_n${n}_vinf_p64")

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "filter_suite_spans_decode" -> (() =>
        graft.model.OsmView.derive(docs).filter(
          Compiler.compileEffective(Parser.parse(graft.Bench.filterSuite.head)))),
      "filter_suite_typed_cold" -> (() =>
        typedView.filter(Compiler.compileEffective(
          Parser.parse(graft.Bench.filterSuite.head)))),
      "dedup_winnowed_vinf_200k" -> (() =>
        Dedup.winnowedDupPairs(hv(200000L), col("text"), col("doc_id"),
          k = 8, w = 4, threshold = 0.8, maxDocFreq = 1000)),
      "complete_ways" -> (() =>
        graft.engine.FilterEngine.completeWays(docs, "highway == residential")),
      "spatial_knn" -> (() => {
        val qs = DeterministicGen.hotspots.zipWithIndex.flatMap { case ((la, lo), i) =>
          (0 until 33).map(j => ((i * 33 + j).toLong, la + j * 0.003, lo + j * 0.002))
        }.toDF("query_id", "lat", "lon")
        SpatialOps.knn(nodes, qs, k = 10, level = 14, maxRing = 2)
      }),
      "spatial_distance_join" -> (() =>
        graft.spatial.GeomOps.withinDistanceMeters(nodes, 20.0, level = 20,
          key = "doc_id")),
      "dedup_minhash_lsh" -> (() => {
        val documents = spark.read
          .parquet(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            + "/documents.parquet")
        Dedup.minhashDupPairs(documents, col("text"), col("doc_id"),
          ngram = 3, numHashes = 16, bands = 4, threshold = 0.5)
      }),
      "dedup_simhash" -> (() => {
        val documents = spark.read
          .parquet(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            + "/documents.parquet")
        Dedup.simhashDupPairs(documents, col("text"), col("doc_id"),
          bands = 4, maxHamming = 6)
      }),
      "sim_ivf_ann" -> (() => {
        val emb = spark.read
          .parquet(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            + "/embeddings.parquet")
        val q = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding"))
        Similarity.ivfTopK(emb, q, 10, dim = 64, nCentroids = 16, nProbe = 4)
      }))

    // count-shaped variant of the spans row: the bench times `.count()`, so
    // the plan the suite actually executes has every unused decode pass
    // pruned and the tag predicate fused — the plain filter plan above
    // carries all 13 projected decode columns because nothing prunes them
    val extra: Seq[(String, () => DataFrame)] = Seq(
      "filter_suite_spans_decode_count" -> (() =>
        graft.model.OsmView.derive(docs).filter(
          Compiler.compileEffective(Parser.parse(graft.Bench.filterSuite.head)))
          .groupBy().count()),
      // winnowedDupPairs executes its candidate generation under eager
      // localCheckpoints, so the operator's RETURNED plan is truncated to
      // the verify tail; these two stage plans are built exactly like the
      // operator body builds them (df>=2 hash-agg table; retain + explode +
      // pair self-join + shared_rare aggregation)
      "dedup_winnowed_vinf_200k_dfbuild" -> (() => {
        val d = hv(200000L)
        graft.ops.TextOps.winnowedFingerprints(
          d.select(col("doc_id").as("key"), col("text").as("__text")),
          col("__text"), "fps", 8, 4)
          .select(explode(col("fps")).as("f"))
          .groupBy("f").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2)
      }),
      // the round-5 candidate shape (df as a WINDOW over the corpus-sized
      // exploded rows, self-join over the window output), reconstructed so
      // the before/after stage plans are both on disk — the operator's
      // eager checkpoints hide this stage from the end-to-end plan
      "dedup_winnowed_vinf_200k_candidates_r5window" -> (() => {
        val d = hv(200000L)
        val fmat = graft.ops.TextOps.winnowedFingerprints(
          d.select(col("doc_id").as("key"), col("text").as("__text")),
          col("__text"), "fps", 8, 4)
          .select(col("key"), size(col("fps")).as("nt"), col("fps"))
        val e = fmat.select(col("key"), explode(col("fps")).as("f"))
        val wDf = org.apache.spark.sql.expressions.Window.partitionBy("f")
        val ef = e.withColumn("df", count(lit(1)).over(wDf))
        val gen = ef.filter(col("df") >= 2 && col("df") <= 1000)
        val l = gen.select(col("f"), col("key").as("key_a"))
        val r = gen.select(col("f"), col("key").as("key_b"))
        l.join(r, Seq("f"))
          .filter(col("key_a") < col("key_b"))
          .groupBy("key_a", "key_b").agg(count(lit(1)).as("shared_rare"))
      }),
      "dedup_winnowed_vinf_200k_candidates" -> (() => {
        val d = hv(200000L)
        val fmat = graft.ops.TextOps.winnowedFingerprints(
          d.select(col("doc_id").as("key"), col("text").as("__text")),
          col("__text"), "fps", 8, 4)
          .select(col("key"), size(col("fps")).as("nt"), col("fps"))
        val bcRare = spark.sparkContext.broadcast(Array(1L, 2L, 3L))
        val retained = org.apache.spark.sql.GraftBridge.column(
          graft.exprs.LongArrayRetainSorted(
            org.apache.spark.sql.GraftBridge.expression(col("fps")), bcRare))
        val gen = fmat.select(col("key"), explode(retained).as("f"))
        val l = gen.select(col("f"), col("key").as("key_a"))
        val r = gen.select(col("f"), col("key").as("key_b"))
        l.join(r, Seq("f"))
          .filter(col("key_a") < col("key_b"))
          .groupBy("key_a", "key_b").agg(count(lit(1)).as("shared_rare"))
      }))

    val outDir = java.nio.file.Paths.get("/root/repo/plans/r06")
    java.nio.file.Files.createDirectories(outDir)
    (queries ++ extra).foreach { case (name, build) =>
      if (only.isEmpty || only(name)) {
        val df = build()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
        println(s"wrote $name ($tag): ${plan.linesIterator.size} lines")
      }
    }
    spark.stop()
  }
}
