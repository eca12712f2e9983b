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

      val nQ = truthN / k
      println(s"# fixture=$fixtureName embeddings=$nEmb queries=$nQ k=$k")
      // cand_frac is MEASURED from the operator's own candidate join
      // (lsh/ivfCandidateCount), not the uniform-bucket estimate — on
      // structured corpora the buckets are size-skewed and queries probe
      // the dense ones, so the estimate understates the real scan; the
      // uniform estimate is printed alongside for the skew to be visible
      println("fixture\tkind\tconfig\trecall@10\tcand_frac\tuniform_est")
      for (bits <- Seq(6, 8, 10); probes <- Seq(0, 4, 8, 16, 32)) {
        val r = recall(Similarity.lshTopK(emb, q, k, dim = 64,
          bits = bits, probes = probes))
        val frac = Similarity.lshCandidateCount(emb, q, dim = 64,
          bits = bits, probes = probes).toDouble / (nQ * nEmb)
        val est = math.min(1.0, (1.0 + probes) / (1L << bits))
        println(f"$fixtureName\tlsh\tbits=$bits,probes=$probes\t$r%.3f\t$frac%.4f\t$est%.4f")
      }
      for (nc <- Seq(8, 16, 32); np <- Seq(1, 2, 4, 8)) {
        if (np <= nc) {
          val cents = Similarity.ivfCentroids(emb, dim = 64, nCentroids = nc)
          val r = recall(Similarity.ivfTopK(emb, q, k, cents, nProbe = np))
          val frac = Similarity.ivfCandidateCount(emb, q, cents, nProbe = np)
            .toDouble / (nQ * nEmb)
          println(f"$fixtureName\tivf\tnc=$nc,np=$np\t$r%.3f\t$frac%.4f\t${np.toDouble / nc}%.4f")
        }
      }
      truth.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
