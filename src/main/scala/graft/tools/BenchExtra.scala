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
      case "winnowdf" => winnowDf(spark, if (args.length > 1) args(1).toLong else 200000L)
      case "winnowab" => winnowAb(spark, if (args.length > 1) args(1).toLong else 200000L)
      case "spansq" => spansPerQuery(spark)
      case "coldq" => coldPerQuery(spark)
      case "knnq" => knnProbe(spark)
      case "scan" => scanProbe(spark)
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

  /** Per-query times over the pruned span-decode view (the spans_decode /
    * spans_fast bench rows), to attribute cost to decode-pass counts. */
  private def spansPerQuery(spark: SparkSession): Unit = {
    val docs = spark.read.parquet("/root/repo/target/bench/docs_n600000")
    val fast = graft.model.OsmView.derive(docs)
    graft.Bench.filterSuite.zipWithIndex.foreach { case (src, i) =>
      val pred = Compiler.compileEffective(Parser.parse(src))
      spark.sparkContext.setJobDescription(s"spansq $i: $src")
      val t = median3(fast.filter(pred).count())
      println(f"spansq_$i%-2d $t%7.3f  $src")
    }
  }

  /** Per-query times over the materialized typed view with hot columns
    * ignored (the typed_cold bench row). */
  private def coldPerQuery(spark: SparkSession): Unit = {
    val view = spark.read.parquet("/root/repo/target/bench/docs_n600000_view_h2")
    graft.Bench.filterSuite.zipWithIndex.foreach { case (src, i) =>
      val pred = Compiler.compileEffective(Parser.parse(src))
      spark.sparkContext.setJobDescription(s"coldq $i: $src")
      val t = median3(view.filter(pred).count())
      println(f"coldq_$i%-2d $t%7.3f  $src")
    }
  }

  /** Scan-floor probe: the full spans struct vs nested-pruned subfields —
    * bounds what a schema-pruning rule for DecodeOsmSpans could save. */
  private def scanProbe(spark: SparkSession): Unit = {
    val docs = spark.read.parquet("/root/repo/target/bench/docs_n600000")
    val tFull = median3(noop(docs.select(col("spans"))))
    val tKT = median3(noop(docs.select(col("spans.kind"), col("spans.text"))))
    val tK = median3(noop(docs.select(col("spans.kind"))))
    println(f"""{"scan_full_struct_sec":$tFull%.3f,"scan_kind_text_sec":$tKT%.3f,"scan_kind_sec":$tK%.3f}""")
  }

  /** knn stage probe: candidate volume and full-operator time at the bench
    * parameterization. */
  private def knnProbe(spark: SparkSession): Unit = {
    import spark.implicits._
    val typedView = spark.read.parquet("/root/repo/target/bench/docs_n600000_view_h2")
    val nodes = typedView.filter(col("type") === "node")
      .select(col("doc_id"), col("lat"), col("lon")).cache()
    val nNodes = nodes.count()
    val queries = DeterministicGen.hotspots.zipWithIndex.flatMap { case ((la, lo), i) =>
      (0 until 33).map(j => ((i * 33 + j).toLong, la + j * 0.003, lo + j * 0.002))
    }.toDF("query_id", "lat", "lon")
    val nCand = graft.spatial.SpatialOps.knnCandidateCount(
      nodes, queries, level = 14, maxRing = 2)
    val nCand0 = graft.spatial.SpatialOps.knnCandidateCount(
      nodes, queries, level = 14, maxRing = 0)
    val nCand1 = graft.spatial.SpatialOps.knnCandidateCount(
      nodes, queries, level = 14, maxRing = 1)
    val unsat0 = graft.spatial.SpatialOps.knnUnsatAfterRing(
      nodes, queries, k = 10, level = 14, ring = 0)
    val unsat1 = graft.spatial.SpatialOps.knnUnsatAfterRing(
      nodes, queries, k = 10, level = 14, ring = 1)
    val unsat2 = graft.spatial.SpatialOps.knnUnsatAfterRing(
      nodes, queries, k = 10, level = 14, ring = 2)
    val unsat4 = graft.spatial.SpatialOps.knnUnsatAfterRing(
      nodes, queries, k = 10, level = 14, ring = 4)
    val unsat8 = graft.spatial.SpatialOps.knnUnsatAfterRing(
      nodes, queries, k = 10, level = 14, ring = 8)
    println(s"nodes=$nNodes queries=${queries.count()} candidates(r2)=$nCand " +
      s"candidates(r1)=$nCand1 candidates(r0)=$nCand0 unsat(r0)=$unsat0 unsat(r1)=$unsat1 unsat(r2)=$unsat2 unsat(r4)=$unsat4 unsat(r8)=$unsat8")
    val tFull = median3(graft.spatial.SpatialOps.knn(
      nodes, queries, k = 10, level = 14, maxRing = 2).count())
    println(f"""{"knn_full_sec":$tFull%.3f,"knn_candidates":$nCand}""")
  }

  /** A/B the full winnow operator: broadcast-retain candidate path (default
    * guard) vs the shuffle-join fallback (guard forced to 0), interleaved in
    * one JVM with a GC nudge between trials so checkpoint blocks from prior
    * trials are released. */
  private def winnowAb(spark: SparkSession, n: Long): Unit = {
    val parts = 64
    val p = s"/root/repo/target/bench/hvdocs_dist_n${n}_vinf_p$parts"
    val d = spark.read.parquet(p).cache()
    d.count()
    def run(guard: Long): Double = {
      System.gc(); Thread.sleep(500)
      time(Dedup.winnowedDupPairs(d, col("text"), col("doc_id"),
        k = 8, w = 4, threshold = 0.8, maxDocFreq = 1000,
        maxBroadcastFps = guard).count())
    }
    run(20000000L); run(0L) // warm both
    val a1 = run(20000000L); val b1 = run(0L)
    val a2 = run(20000000L); val b2 = run(0L)
    val a3 = run(20000000L); val b3 = run(0L)
    println(f"""{"n":$n,"retain_sec":[$a1%.3f,$a2%.3f,$a3%.3f],"joinpath_sec":[$b1%.3f,$b2%.3f,$b3%.3f]}""")
  }

  /** A/B the df>=2 table build: hash aggregation vs radix sort + linear
    * duplicate scan, interleaved in one JVM. */
  private def winnowDf(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val parts = 64
    val p = s"/root/repo/target/bench/hvdocs_dist_n${n}_vinf_p$parts"
    val d = spark.read.parquet(p).cache()
    d.count()
    val fmat = graft.ops.TextOps.winnowedFingerprints(
      d.select(col("doc_id").as("key"), col("text").as("__text")),
      col("__text"), "fps", 8, 4)
      .select(col("key"), size(col("fps")).as("nt"), col("fps"))
      .localCheckpoint(true)
    val fs = fmat.select(explode(col("fps")).as("f"))
    val total = fs.count()
    def hashAgg() = fs.groupBy("f").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    def sortScan() = fs.as[Long].repartition(col("f")).sortWithinPartitions("f")
      .mapPartitions { it =>
        new Iterator[(Long, Long)] {
          private var hasHead = false
          private var head = 0L
          private def fill(): Unit =
            if (!hasHead && it.hasNext) { head = it.next(); hasHead = true }
          def hasNext: Boolean = { fill(); hasHead }
          def next(): (Long, Long) = {
            fill(); val v = head; hasHead = false
            var c = 1L
            var run = true
            while (run) {
              fill()
              if (hasHead && head == v) { c += 1; hasHead = false } else run = false
            }
            (v, c)
          }
        }
      }.toDF("f", "df").filter(col("df") >= 2)
    val nHash = hashAgg().count(); val nSort = sortScan().count() // warm + parity
    println(s"total=$total distinct-df2 hash=$nHash sort=$nSort")
    def m3(f: => Unit): Double = { Seq(time(f), time(f), time(f)).sorted.apply(1) }
    val tH = m3(noop(hashAgg()))
    val tS = m3(noop(sortScan()))
    val tH2 = m3(noop(hashAgg()))
    val tS2 = m3(noop(sortScan()))
    println(f"""{"n":$n,"df_hashagg_sec":[$tH%.3f,$tH2%.3f],"df_sortscan_sec":[$tS%.3f,$tS2%.3f]}""")
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
    // + df>=2 hash-agg table, + broadcast attach + gen, + sharedRare —
    // mirrors the round-6 operator body
    def ladder(stage: String): Double = {
      def run(): Long = {
        val fmat = graft.ops.TextOps.winnowedFingerprints(
          d.select(col("doc_id").as("key"), col("text").as("__text")),
          col("__text"), "fps", 8, 4)
          .select(col("key"), size(col("fps")).as("nt"), col("fps"))
          .localCheckpoint(true)
        if (stage == "ckpt") return fmat.rdd.getNumPartitions.toLong
        val dfT = fmat.select(explode(col("fps")).as("f"))
          .groupBy("f").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2)
          .localCheckpoint(true)
        if (stage == "dft") return dfT.rdd.getNumPartitions.toLong
        val e = fmat.select(col("key"), explode(col("fps")).as("f"))
        val ef = e.join(broadcast(dfT), Seq("f"))
        val gen = ef.filter(col("df") <= 1000)
        if (stage == "gen") { noop(gen); return 0L }
        val l = gen.select(col("f"), col("key").as("key_a"))
        val r = gen.select(col("f"), col("key").as("key_b"))
        val sharedRare = l.join(r, Seq("f"))
          .filter(col("key_a") < col("key_b"))
          .groupBy("key_a", "key_b").agg(count(lit(1)).as("shared_rare"))
        if (stage == "shared") { noop(sharedRare); return 0L }
        val hotFsDF = dfT.filter(col("df") > 1000).select(col("f"))
        val hotSet = hotFsDF.collect().map(_.getLong(0)).toSet
        val bcHot = spark.sparkContext.broadcast(hotSet)
        val nHotUdf = udf((fps: Seq[Long]) => fps.count(bcHot.value.contains).toLong)
        val stats = fmat.select(col("key"), col("nt").as("n_total"),
          nHotUdf(col("fps")).as("n_hot"))
        val plausible = sharedRare
          .join(stats.select(col("key").as("key_a"), col("n_total").as("nt_a"),
            col("n_hot").as("nh_a")), "key_a")
          .join(stats.select(col("key").as("key_b"), col("n_total").as("nt_b"),
            col("n_hot").as("nh_b")), "key_b")
          .filter((col("shared_rare") + least(col("nh_a"), col("nh_b"))).cast("double") >=
            lit(0.8) * least(col("nt_a"), col("nt_b")))
          .select("key_a", "key_b")
          .localCheckpoint(true)
        if (stage == "plaus") return plausible.rdd.getNumPartitions.toLong
        0L
      }
      spark.sparkContext.setJobDescription(s"winnow ladder: $stage")
      run() // warm
      Seq(time(run()), time(run())).min
    }
    val tCkpt = ladder("ckpt")
    val tDft = ladder("dft")
    val tGen = ladder("gen")
    val tShared = ladder("shared")
    val tPlaus = ladder("plaus")
    d.unpersist()
    println(f"""{"n":$n,"winnow_kernel_noop_sec":$tKernel%.3f,"winnow_ckpt_sec":$tCkpt%.3f,"winnow_dft_sec":$tDft%.3f,"winnow_gen_sec":$tGen%.3f,"winnow_shared_sec":$tShared%.3f,"winnow_plaus_sec":$tPlaus%.3f,"winnow_full_sec":$tFull%.3f}""")
  }
}
