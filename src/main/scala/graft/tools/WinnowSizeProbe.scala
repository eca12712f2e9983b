package graft.tools

import org.apache.spark.sql.functions._

/** Sizes of the winnowed-dup-pairs intermediates on a documents table
  * (default: the sf0.1 driver table; pass `hv:N` for the high-vocabulary
  * fixture at N docs, or a parquet path): fingerprint df distribution,
  * rare-fp count, candidate-pair count — to see where the join fan-out
  * explodes on template-heavy text, and to evidence that the hv corpus
  * does NOT have that degeneracy. */
object WinnowSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.FilterEngine.session(master = "local[16]", appName = "winnow-size")
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1/documents.parquet"
    val documents = (if (src.startsWith("hvinf:"))
      graft.fixtures.DeterministicGen.highVocabDocsDF(spark, src.drop(6).toLong,
        vocab = Long.MaxValue)
    else if (src.startsWith("hv:"))
      graft.fixtures.DeterministicGen.highVocabDocsDF(spark, src.drop(3).toLong)
    else spark.read.parquet(src))
      .repartition(16).cache()
    println("PROBE docs=" + documents.count())
    val fps = graft.ops.TextOps.winnowedFingerprints(
      documents.select(col("doc_id").as("key"), col("text")), col("text"), "fps")
      .select("key", "fps").cache()
    val e = fps.select(col("key"), explode(col("fps")).as("f")).cache()
    println("PROBE fps_rows=" + e.count())
    val dfDist = e.groupBy("f").agg(count(lit(1)).as("df")).cache()
    println("PROBE distinct_fps=" + dfDist.count())
    println("PROBE mean_df=" + dfDist.agg(avg("df")).collect()(0).getDouble(0))
    for (cap <- Seq(5, 20, 100, 1000)) {
      // `/` on integral columns is DOUBLE in Spark (and the sum is null when
      // no fingerprint has df >= 2): floor+cast+coalesce keep this a long
      val pairsUpper = dfDist.filter(col("df") <= cap && col("df") >= 2)
        .agg(coalesce(sum(floor(col("df") * (col("df") - 1) / 2).cast("long")),
          lit(0L))).collect()(0).getLong(0)
      println(s"PROBE cap=$cap candidate_pair_rows_upper=$pairsUpper")
    }
    spark.stop()
  }
}
