package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** ANN recall sweep (BASELINE.md recall table): recall@10 of the LSH and IVF
  * scale paths against the brute-force kernel, at the PRODUCTION
  * parameterizations and their neighbors — the gates prove the exactness
  * configs are exact; this measures what each approximate config actually
  * trades. Also reports the scanned-candidate fraction per config (the
  * speed side of the trade) so the table reads as a frontier, not a single
  * point.
  *
  * TWO fixtures per sweep: the sf embeddings table (uniform — the
  * structureless WORST case for any bucketing ANN: no direction is more
  * populated than another, so a bucket is no better than random) and a
  * clustered mixture-of-Gaussians-like corpus
  * ([[graft.fixtures.DeterministicGen.clusteredEmbeddingsDF]] — the shape
  * real embedding spaces have, where coarse quantization earns its keep).
  * Published recall numbers must cite BOTH; the default recommendation
  * (IVF — see [[Similarity]] scaladoc) comes from the clustered table.
  *
  * Usage: runMain graft.tools.RecallProbe [sfDir]
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val uniform = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nUniform = uniform.count()
    val clustered = graft.fixtures.DeterministicGen
      .clusteredEmbeddingsDF(spark, nUniform, dim = 64)

    for ((fixtureName, emb0) <- Seq("uniform" -> uniform, "clustered" -> clustered)) {
      val emb = emb0.cache()
      val nEmb = emb.count()
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val k = 10
      val truth = Similarity.bruteTopK(emb, q, k)
        .select("query_id", "vec_id").cache()
      val truthN = truth.count()

      def recall(approx: DataFrame): Double = Similarity.recallAgainst(truth, approx)

      println(s"# fixture=$fixtureName embeddings=$nEmb queries=${truthN / k} k=$k")
      println("fixture\tkind\tconfig\trecall@10\tcand_frac")
      for (bits <- Seq(6, 8, 10); probes <- Seq(0, 4, 8, 16, 32)) {
        val r = recall(Similarity.lshTopK(emb, q, k, dim = 64,
          bits = bits, probes = probes))
        // expected scanned fraction: (1 + probes) buckets of 2^bits
        val frac = math.min(1.0, (1.0 + probes) / (1L << bits))
        println(f"$fixtureName\tlsh\tbits=$bits,probes=$probes\t$r%.3f\t$frac%.4f")
      }
      for (nc <- Seq(8, 16, 32); np <- Seq(1, 2, 4, 8)) {
        if (np <= nc) {
          val r = recall(Similarity.ivfTopK(emb, q, k, dim = 64,
            nCentroids = nc, nProbe = np))
          println(f"$fixtureName\tivf\tnc=$nc,np=$np\t$r%.3f\t${np.toDouble / nc}%.4f")
        }
      }
      truth.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
