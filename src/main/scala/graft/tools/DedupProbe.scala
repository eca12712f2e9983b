package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Timing probe for the dedup ops on the sf0.1 documents table: 3 reps each
  * to separate plan cost from first-run JIT/codegen compilation (the bench's
  * single-shot timings for these ops are dominated by Janino compile time of
  * the very large generated projections — see BASELINE.md variance notes). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.FilterEngine.session(master = "local[32]", appName = "dedup-probe")
    val documents = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32).cache()
    documents.count()
    def t3(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROBE $name: ${ts.map(_._1).map(x => f"$x%.2f").mkString(" ")} s  rows=${ts.head._2}")
    }
    t3("dedup_exact")(Dedup.exactDedup(documents, col("text"), col("doc_id")).count())
    t3("dedup_minhash_new")(Dedup.minhashDupPairs(documents, col("text"), col("doc_id"),
      ngram = 3, numHashes = 16, bands = 4, threshold = 0.5).count())
    t3("dedup_simhash")(Dedup.simhashDupPairs(documents, col("text"), col("doc_id"),
      bands = 4, maxHamming = 6).count())
    t3("dedup_winnowed_df20")(Dedup.winnowedDupPairs(documents, col("text"), col("doc_id"),
      k = 8, w = 4, threshold = 0.5, maxDocFreq = 20).count())
    spark.stop()
  }
}
