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

    val outDir = java.nio.file.Paths.get("/root/repo/plans/r06")
    java.nio.file.Files.createDirectories(outDir)
    queries.foreach { case (name, build) =>
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
