package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Step-wise timing of the dedup_winnowed gate shape at sf0.01/local[4]. */
object WinnowGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STEP $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") < 300).select("doc_id", "text")
    val seeded = docs.filter(col("doc_id") < 40)
      .select((col("doc_id") + 900000).as("doc_id"), col("text"))
    val u = docs.unionByName(seeded)
    t("union")(u.count())
    val fps = TextOps.winnowedFingerprints(
      u.select(col("doc_id").as("key"), col("text").as("__text")),
      col("__text"), "fps", 8, 4).select("key", "fps")
    t("fps")(fps.count())
    t("fps_sizes")(fps.select(sum(size(col("fps")))).collect()(0).getLong(0))
    val e = fps.select(col("key"), explode(col("fps")).as("f"))
    t("explode")(e.count())
    val l = e.select(col("f"), col("key").as("key_a"))
    val r = e.select(col("f"), col("key").as("key_b"))
    val cand0 = l.join(r, Seq("f")).filter(col("key_a") < col("key_b"))
    t("join_fanout")(cand0.count())
    val candidates = cand0.select("key_a", "key_b").distinct()
    t("candidates")(candidates.count())
    val withFps = candidates
      .join(fps.select(col("key").as("key_a"), col("fps").as("fps_a")), "key_a")
      .join(fps.select(col("key").as("key_b"), col("fps").as("fps_b")), "key_b")
    t("reattach")(withFps.count())
    val verified = withFps.select(col("key_a"), col("key_b"),
      (size(array_intersect(col("fps_a"), col("fps_b"))).cast("double") /
        least(size(col("fps_a")), size(col("fps_b")))).as("overlap"))
      .filter(col("overlap") >= 1.0)
    t("verify")(verified.count())
    spark.stop()
  }
}
