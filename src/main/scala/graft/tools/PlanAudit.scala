package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextOps}

/** Prints formatted plans of the round-3 operators for shuffle/codegen
  * audit: counts Exchange/Sort/CartesianProduct/CodegenFallback occurrences
  * and dumps the formatted plan when asked (arg "full"). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.FilterEngine.session(master = "local[4]", appName = "plan-audit")
    import spark.implicits._
    val full = args.contains("full")
    // "noBroadcast" previews the at-scale plan shape (shuffle joins) on the
    // small fixture — e.g. whether ReuseExchange dedups the self-join sides
    if (args.contains("noBroadcast"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("key_a", "key_b")

    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      // execute THIS queryExecution (count() would plan a separate query):
      // under AQE, exchange reuse only appears in the FINAL adaptive plan
      df.queryExecution.executedPlan.executeCollect()
      val plan = df.queryExecution.executedPlan.toString
      def c(s: String) = plan.sliding(s.length).count(_ == s)
      println(f"AUDIT $name exchanges=${c("Exchange")} sorts=${c("Sort ")} " +
        s"cartesian=${c("CartesianProduct")} bnlj=${c("BroadcastNestedLoopJoin")} " +
        s"scans=${c("Scan parquet")} reused=${c("ReusedExchange") + c("ReusedQueryStage")}")
      if (full) { println(s"--- $name ---"); df.explain("formatted") }
    }

    audit("winnowed_pairs", Dedup.winnowedDupPairs(docs, col("text"), col("doc_id")))
    audit("brute_topk", Similarity.bruteTopK(emb, q, 5))
    audit("lsh_topk", Similarity.lshTopK(emb, q, 5, dim = 64, bits = 8, probes = 4))
    audit("cosine_dups", Similarity.cosineDupPairs(emb, col("vec_id"), 0.9, dim = 64, probes = 2))
    audit("dup_clusters", Dedup.dupClusters(pairs))
    audit("minhash", Dedup.minhashDupPairs(docs, col("text"), col("doc_id"),
      ngram = 3, numHashes = 16, bands = 4, threshold = 0.5))
    audit("text_fps", TextOps.winnowedFingerprints(
      docs.select(col("doc_id"), col("text")), col("text"), "fps"))
    spark.stop()
  }
}
