package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compile.Compiler
import graft.engine.FilterEngine
import graft.fixtures.DeterministicGen
import graft.ofl.Parser
import graft.ops.{Dedup, Similarity}
import graft.spatial.SpatialOps

/** Benchmark main (driver contract): one JSON line with total seconds,
  * per-query seconds, and headline throughputs — filtered elements/sec over
  * the OFL expression suite and spatial-join rows/sec (BASELINE.md).
  *
  * The docs fixture is the deterministic generator at the sf implied by
  * SPARK_GRAFT_SF_DIR, materialized once as type-partitioned parquet under
  * target/bench (generation excluded from timings; reads go through the
  * vectorized parquet scan with partition pruning, like production). */
object Bench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Per-query (min, median, max) of 3 timed trials after one discarded
    * warm-up (BASELINE.md protocol). The spread goes into the emitted JSON so
    * a load-polluted run is visible IN the artifact: BENCH_r03 recorded 5-7×
    * noise on two queries and nothing in the record could prove it wasn't a
    * regression. */
  private val spreads = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
  private def trials[A](f: => A): (Double, Double, Double) = {
    f // warm
    val ts = Seq(time(f), time(f), time(f)).sorted
    (ts(0), ts(1), ts(2))
  }
  private def median3[A](name: String)(f: => A): Double = {
    val (mn, md, mx) = trials(f)
    spreads(name) = (mn, mx)
    md
  }

  /** Warm + best-of-2 (ScalingBench's protocol) for the minutes-long scale
    * rows, where a fourth execution buys little: min-of-2 is the
    * noise-robust statistic the scaling tables already use, and the
    * recorded spread still exposes a polluted run. */
  private def best2[A](name: String)(f: => A): Double = {
    f // warm
    val ts = Seq(time(f), time(f))
    spreads(name) = (ts.min, ts.max)
    ts.min
  }

  /** Fixed-work single-thread calibration probe (~0.3 s on an idle host):
    * timed before and after the suite, both emitted. Interpretation rule
    * (BASELINE.md): if either probe, or their ratio, drifts >~1.3× from the
    * idle-host band, the run was contended — rerun before citing numbers. */
  private[graft] def calibrate(): Double = {
    var acc = 0x9e3779b97f4a7c15L
    def spin(iters: Int): Long = {
      var i = 0
      while (i < iters) { // xorshift64* mix: pure ALU, no allocation
        acc ^= acc << 13; acc ^= acc >>> 7; acc ^= acc << 17
        acc *= 0x2545f4914f6cdd1dL
        i += 1
      }
      acc
    }
    spin(20000000) // JIT warm
    val t = time(spin(100000000))
    if (acc == 42L) println(acc) // defeat dead-code elimination
    t
  }

  /** Memory-STREAMING calibration leg: sums a 256 MB long array (far past
    * any LLC) sequentially, 4 passes — ~1 GB of DRAM traffic. The pure-ALU
    * probe above is blind to memory-bandwidth/page-cache contention, the
    * interference mode that actually hits shuffle-heavy queries (the r4
    * winnowed row drifted 1.4× across runs whose ALU calibration was
    * clean); this leg feels it. Emitted before/after like the ALU probe;
    * interpretation band in BASELINE.md. */
  private lazy val memBuf: Array[Long] = {
    val a = new Array[Long](32 << 20) // 256 MB
    var i = 0
    var v = 0x9e3779b97f4a7c15L
    while (i < a.length) { v ^= v << 13; v ^= v >>> 7; a(i) = v; i += 1 }
    a
  }
  private[graft] def calibrateMem(): Double = {
    def sweep(): Long = {
      var acc = 0L
      var p = 0
      while (p < 4) {
        var i = 0
        while (i < memBuf.length) { acc += memBuf(i); i += 1 }
        p += 1
      }
      acc
    }
    sweep() // JIT warm
    val t = time(sweep())
    if (sweep() == 42L) println("x") // defeat dead-code elimination
    t
  }

  /** Multi-core calibration leg: the ALU spin fanned across `threads` JVM
    * threads (work/4 each), wall ≈ threads·work / effective-cores. BOTH
    * single-thread probes are blind to co-tenant CPU STEAL — observed in
    * round 5: ALU and mem legs idle-band clean while every 32-thread suite
    * row ran 2.5-4× slow, and an 8-process burn confirmed the host's
    * effective core count had collapsed. This leg is the probe for that
    * mode; idle band in BASELINE.md. */
  private[graft] def calibratePar(threads: Int): Double = {
    final class Spinner(seed: Long) extends Thread {
      @volatile var out = 0L
      override def run(): Unit = {
        var acc = seed
        var i = 0
        while (i < 25000000) {
          acc ^= acc << 13; acc ^= acc >>> 7; acc ^= acc << 17
          acc *= 0x2545f4914f6cdd1dL
          i += 1
        }
        out = acc
      }
    }
    def fan(): Long = {
      val ts = (1 to threads).map(t => new Spinner(t.toLong))
      ts.foreach(_.start()); ts.foreach(_.join())
      ts.map(_.out).sum
    }
    fan() // JIT warm
    val t = time(fan())
    if (fan() == 42L) println("x")
    t
  }

  val filterSuite: Seq[String] = Seq(
    "highway == residential",
    "highway =~ '_link$'",
    "@tags[@key =^ 'addr:'] >= 2",
    "@id in (3, 141, 723, 1025, 2216, 3333, 4021, 5209, 6300, 7777, 8888, 9999, 10001, 20002, 30003, 40004, 50005, 60006, 70007, 80008)",
    "@way and highway == residential and @version >= 2",
    "@closed_way or (@relation and 'type' == 'multipolygon')",
    "not (highway or building or landuse)",
    "@nodes[@ref > 0] > 10",
    "@user =^ 'a' or @uid > 2500",
    "@members[@role == 'inner'] > 0")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // split parquet scans finely enough that tasks ≈ cores at SF=0.1
      // (~200 MB fixture); production sizes this to HDFS-block multiples
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- materialize the docs fixture once (excluded from timings) ---------
    // BASELINE.md ladder: ~600k elements at sf=0.1 → 10× the unit-test count
    val benchCount = DeterministicGen.elementCount(sf * 10)
    val docsPath = s"/root/repo/target/bench/docs_n$benchCount"
    if (!new java.io.File(docsPath + "/_SUCCESS").exists()) {
      // 64 hash buckets inside each type partition → enough parquet files
      // for full scan parallelism at any local[N]
      DeterministicGen.docsDF(spark, sf * 10)
        .repartition(64, col("seq"))
        .write.mode("overwrite").partitionBy("type").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)
    val nDocs = docs.count()

    // materialized typed projection (one-time cost, measured separately);
    // _h2 = metadata-tagged derived-hot-key layout (regenerates old caches)
    val viewPath = docsPath + "_view_h2"
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    if (!new java.io.File(viewPath + "/_SUCCESS").exists())
      results("materialize_view") = time(FilterEngine.materializeView(docs, viewPath))
    val typedView = spark.read.parquet(viewPath)
    val spansView = graft.model.OsmView.derive(docs)

    // --- OFL filter suite over the materialized typed projection (headline:
    // the production layout for repeated queries) -----------------------------
    val calibBefore = calibrate()
    val calibMemBefore = calibrateMem()
    val calibParBefore = calibratePar(cpus.toInt)

    // headline rows use the hot-tag pushdown columns the view materialized
    // (the production path — FilterEngine.filterView); the cold row below
    // rereads the same files through the tags ARRAY so the delta is
    // pushdown + array decode, not layout
    val hotMap = graft.engine.HotTags.forSchema(typedView.schema)
    var filterTotal = 0.0
    filterSuite.zipWithIndex.foreach { case (exprSrc, i) =>
      val pred = Compiler.compileEffective(Parser.parse(exprSrc), Compiler.noFiles, hotMap)
      val t = median3(s"filter_$i")(typedView.filter(pred).count())
      results(s"filter_$i") = t
      filterTotal += t
    }
    val filterEps = nDocs.toDouble * filterSuite.size / filterTotal

    // same suite, hot columns ignored (cold array-path compile)
    var coldTotal = 0.0
    var coldLo = 0.0; var coldHi = 0.0
    filterSuite.foreach { exprSrc =>
      val pred = Compiler.compileEffective(Parser.parse(exprSrc))
      val (mn, md, mx) = trials(typedView.filter(pred).count())
      coldTotal += md; coldLo += mn; coldHi += mx
    }
    results("filter_suite_typed_cold") = coldTotal
    spreads("filter_suite_typed_cold") = (coldLo, coldHi)
    val filterColdEps = nDocs.toDouble * filterSuite.size / coldTotal

    // same suite decoding spans in-flight (the no-materialization path).
    // median3 (warm-up + median of 3) everywhere: one-off Catalyst analysis
    // + Janino codegen compile of the big decode trees is ~5-10 s per fresh
    // query and swamped the single-shot r1 numbers; steady-state throughput
    // is the metric that predicts 100 TB behavior (compile cost is paid once
    // per query shape, not per byte).
    var spansTotal = 0.0
    var spansLo = 0.0; var spansHi = 0.0
    filterSuite.foreach { exprSrc =>
      val pred = Compiler.compileEffective(Parser.parse(exprSrc))
      val (mn, md, mx) = trials(spansView.filter(pred).count())
      spansTotal += md; spansLo += mn; spansHi += mx
    }
    results("filter_suite_spans_decode") = spansTotal
    spreads("filter_suite_spans_decode") = (spansLo, spansHi)
    val filterSpansEps = nDocs.toDouble * filterSuite.size / spansTotal

    // in-flight decode via the pruned codegen'd expression (the
    // FilterEngine.filter path): one spans pass per predicate field
    val fastView = graft.model.OsmView.derivePruned(docs)
    var fastTotal = 0.0
    var fastLo = 0.0; var fastHi = 0.0
    filterSuite.foreach { exprSrc =>
      val pred = Compiler.compileEffective(Parser.parse(exprSrc))
      val (mn, md, mx) = trials(fastView.filter(pred).count())
      fastTotal += md; fastLo += mn; fastHi += mx
    }
    results("filter_suite_spans_fast") = fastTotal
    spreads("filter_suite_spans_fast") = (fastLo, fastHi)
    val filterFastEps = nDocs.toDouble * filterSuite.size / fastTotal

    results("complete_ways") = median3("complete_ways")(
      FilterEngine.completeWays(docs, "highway == residential").count())

    // --- spatial ------------------------------------------------------------
    val nodes = typedView.filter(col("type") === "node")
      .select(col("doc_id"), col("lat"), col("lon")).cache()
    val nNodes = nodes.count()

    val polys = DeterministicGen.polygons()
      .map(p => (p.polygon_id, p.rings.map(_.map { case (la, lo) => (la, lo) })))
      .toDF("polygon_id", "rings")
      .withColumn("rings", col("rings").cast("array<array<struct<lat:double,lon:double>>>"))
    val tPip = median3("spatial_pip_join")(SpatialOps.polygonJoin(nodes, polys, level = 13).count())
    results("spatial_pip_join") = tPip

    val queries = DeterministicGen.hotspots.zipWithIndex.flatMap { case ((la, lo), i) =>
      (0 until 33).map(j => ((i * 33 + j).toLong, la + j * 0.003, lo + j * 0.002))
    }.toDF("query_id", "lat", "lon")
    // level 14 (~2.4 km cells): hotspot clusters span many cells, so the
    // candidate set stays small; under-filled sparse queries hit the exact
    // fallback automatically
    results("spatial_knn") = median3("spatial_knn")(
      SpatialOps.knn(nodes, queries, k = 10, level = 14, maxRing = 2).count())

    val tiles = DeterministicGen.rasterTiles(level = 12)
      .map(t => (t.cell, t.level)).toDF("cell", "tile_level")
    results("spatial_tile_join") = median3("spatial_tile_join")(
      SpatialOps.tileJoin(nodes, tiles, pointLevel = 16, tileLevel = 12).count())

    results("spatial_cell_density") = median3("spatial_cell_density")(
      SpatialOps.cellDensity(nodes, 12).count())

    // S2-style spherical encoder throughput: trig + face chain + unrolled
    // Hilbert transducer per row, then the same hash-agg as cell_density —
    // the delta over the Z row is the encoder's cost
    results("spatial_s2_density") = median3("spatial_s2_density")(
      nodes.select(SpatialOps.s2CellId(col("lat"), col("lon"), 12).as("cell"))
        .groupBy("cell").count().count())

    // Z-order layout: the same region bbox (Paris hotspot, ~23% of nodes)
    // answered through the pruned Z-clustered layout vs a full scan of the
    // type-partitioned view — both parquet paths. At sf0.1 these rows are
    // dispatch-bound; the 24M-point trendline lives in tools.BboxProbe
    // (BASELINE.md), same protocol as the hot-tag rows.
    val zPath = docsPath + "_zlayout"
    if (!new java.io.File(zPath + "/_SUCCESS").exists())
      graft.spatial.SpatialLayout.materialize(
        typedView.filter(col("type") === "node")
          .select(col("doc_id"), col("lat"), col("lon")),
        zPath, coarseLevel = 4, fineLevel = 16, numFiles = 32)
    val zLayout = spark.read.parquet(zPath)
    val parisBox = col("lat") >= 45.0 && col("lat") <= 53.0 &&
      col("lon") >= -2.0 && col("lon") <= 6.0
    results("spatial_bbox_pruned") = median3("spatial_bbox_pruned")(
      graft.spatial.SpatialLayout.bboxFilter(zLayout, 45.0, 53.0, -2.0, 6.0).count())
    results("spatial_bbox_scan") = median3("spatial_bbox_scan")(
      typedView.filter(col("type") === "node" && parisBox).count())

    // way-geometry materialization (add-locations-to-ways analog): refs
    // explode → node equi-join → ordered reassembly + exact-integer metrics
    results("spatial_way_geom") = median3("spatial_way_geom")(
      graft.spatial.GeomOps.wayMetrics(
        graft.spatial.GeomOps.addLocations(typedView)).count())
    // all-pairs-within-20m self-join over the hotspot-clustered nodes
    // (haversine refine, cover-cell prejoin at ~19 m cells)
    results("spatial_distance_join") = median3("spatial_distance_join")(
      graft.spatial.GeomOps.withinDistanceMeters(
        nodes, 20.0, level = 20, key = "doc_id").count())

    val spatialRps = nNodes.toDouble * 2 / (tPip + results("spatial_tile_join"))

    // --- training-data ops ----------------------------------------------------
    // single-file driver table → repartition for parallelism
    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(cpus.toInt).cache()
    documents.count()
    results("dedup_exact") = median3("dedup_exact")(
      Dedup.exactDedup(documents, col("text"), col("doc_id")).count())
    results("dedup_minhash_lsh") = median3("dedup_minhash_lsh")(
      Dedup.minhashDupPairs(documents, col("text"), col("doc_id"),
        ngram = 3, numHashes = 16, bands = 4, threshold = 0.5).count())
    results("dedup_simhash") = median3("dedup_simhash")(
      Dedup.simhashDupPairs(documents, col("text"), col("doc_id"),
        bands = 4, maxHamming = 6).count())
    // winnowed dedup runs on the high-vocabulary fixture, NOT the driver
    // documents table: that table draws from a tiny phrase vocabulary
    // (mean fingerprint df≈83 — tools.WinnowSizeProbe), so nearly every
    // pair is a true candidate and the answer itself degenerates toward
    // O(n²) — measuring the corpus, not the operator. The hv corpus has
    // realistic df (≈1) and a seeded 2% exact-dup rate (~hvCount/50 pairs).
    val hvCount = math.max(20000L, (sf * 500000).toLong)
    // cache path carries every generator parameter (ScalingBench's _vinf
    // lesson): a changed vocab/dup-rate default must never silently reuse a
    // stale fixture
    val (hvVocab, hvDupEvery, hvDupOffset) = (50000L, 50, 17)
    val hvPath =
      s"/root/repo/target/bench/hvdocs_n${hvCount}_v${hvVocab}_e${hvDupEvery}_o$hvDupOffset"
    if (!new java.io.File(hvPath + "/_SUCCESS").exists())
      DeterministicGen.highVocabDocsDF(spark, hvCount, vocab = hvVocab,
        dupEvery = hvDupEvery, dupOffset = hvDupOffset)
        .repartition(cpus.toInt * 2)
        .write.mode("overwrite").parquet(hvPath)
    val hvDocs = spark.read.parquet(hvPath).cache()
    val nHv = hvDocs.count()
    results("dedup_winnowed") = median3("dedup_winnowed")(
      Dedup.winnowedDupPairs(hvDocs, col("text"), col("doc_id"),
        k = 8, w = 4, threshold = 0.8, maxDocFreq = 1000).count())
    val winnowDps = nHv.toDouble / results("dedup_winnowed")

    // the pipeline's last stage: pairs → connected components → survivors.
    // Pairs cached so the row times CLUSTER RESOLUTION, not pair detection.
    val hvPairs = Dedup.winnowedDupPairs(hvDocs, col("text"), col("doc_id"),
      k = 8, w = 4, threshold = 0.8, maxDocFreq = 1000)
      .select("key_a", "key_b").cache()
    hvPairs.count()
    results("dedup_clusters") = median3("dedup_clusters")(
      Dedup.dedupByClusters(hvDocs, col("doc_id"), Dedup.dupClusters(hvPairs)).count())
    hvPairs.unpersist()
    hvDocs.unpersist() // don't pin the 50k-doc corpus under the text/sim rows

    results("text_analysis") = median3("text_analysis")(
      documents.select(
        graft.ops.TextOps.tokenCountWs(col("text")),
        graft.ops.TextOps.tokenCountBpe(col("text")),
        graft.ops.TextOps.qualityScore(col("text")),
        graft.ops.TextOps.langId(col("text"))).count())

    // multimodal: real PNG decode → resample → re-encode over every media
    // payload of the bench docs (payload synthesis cached out of the timing)
    val media = graft.ops.Multimodal.mediaTable(graft.model.OsmView.derive(docs)).cache()
    val nMedia = media.count()
    results("multimodal_resize") = median3("multimodal_resize")(
      graft.ops.Multimodal.resizeImages(media, 64, 64).count())
    media.unpersist()

    // audio + frame-sampling siblings over the same media spans (payload
    // synthesis cached out of the timing, like the image row): decodeAudio
    // walks real RIFF chunks + windowed features; sampleFramesReal parses
    // the container and routes every kept frame through the real PNG decoder
    val view4media = graft.model.OsmView.derive(docs)
    val audio = graft.ops.Multimodal.audioTable(view4media).cache()
    val nAudio = audio.count()
    results("multimodal_audio") = median3("multimodal_audio")(
      graft.ops.Multimodal.decodeAudio(audio, windows = 8).count())
    audio.unpersist()
    val video = graft.ops.Multimodal.videoTable(view4media).cache()
    video.count()
    results("multimodal_frames") = median3("multimodal_frames")(
      graft.ops.Multimodal.sampleFramesReal(video, every = 2).count())
    video.unpersist()

    val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    embeddings.count()
    val embQ = embeddings.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    results("sim_brute_topk") = median3("sim_brute_topk")(Similarity.bruteTopK(embeddings, embQ, 10).count())
    results("sim_lsh_ann") = median3("sim_lsh_ann")(
      Similarity.lshTopK(embeddings, embQ, 10, dim = 64, bits = 8, probes = 8).count())
    // includes coarse-quantizer training (2 Lloyd rounds) every run — the
    // operator's real cost, not just the probe-bucket scan
    results("sim_ivf_ann") = median3("sim_ivf_ann")(
      Similarity.ivfTopK(embeddings, embQ, 10, dim = 64,
        nCentroids = 16, nProbe = 4).count())
    // the production query-batch shape: centroids trained ONCE (outside the
    // timing), each trial probes only — the per-batch latency a pipeline
    // actually pays after the train/probe split
    val ivfCents = Similarity.ivfCentroids(embeddings, dim = 64, nCentroids = 16)
    results("sim_ivf_probe") = median3("sim_ivf_probe")(
      Similarity.ivfTopK(embeddings, embQ, 10, ivfCents, nProbe = 4).count())

    // --- ANN recall@10 at the PRODUCTION probe settings (the speed rows
    // above). The gate queries prove the exactness parameterizations are
    // exact; these rows measure what the approximate configs actually trade
    // (BASELINE.md carries the bits/probes and nCentroids/nProbe sweeps
    // from tools.RecallProbe). Values, not timings — kept out of `queries`.
    val truth = Similarity.bruteTopK(embeddings, embQ, 10)
      .select("query_id", "vec_id").cache()
    truth.count()
    val lshRecall = Similarity.recallAgainst(truth,
      Similarity.lshTopK(embeddings, embQ, 10, dim = 64, bits = 8, probes = 8))
    val ivfRecall = Similarity.recallAgainst(truth,
      Similarity.ivfTopK(embeddings, embQ, 10, dim = 64, nCentroids = 16, nProbe = 4))
    truth.unpersist()

    // winnow DATA-SCALING axis (per round): the same operator at 50k and
    // 200k docs on the UNBOUNDED-vocab corpus (constant work per doc — see
    // highVocabDocsDF scaladoc), so the 200k/50k wall-clock ratio isolates
    // operator scaling from corpus collision statistics AND gives the
    // bounded-vocab row above a second measurement to attribute drift
    // against: measurement noise moves both rows together; a real
    // regression moves docs/s at every size.
    //
    // Deliberately LAST in the suite (before the closing calibration
    // probes): these two rows run for minutes and their shuffle/GC
    // pressure measurably polluted the sub-second sim_*/resize rows when
    // they ran mid-suite (run5 showed 2.4-2.9× on the four sim rows with
    // clean calibration at both ends — the probes bracket the suite, not
    // each row). All steady rows are measured before the monsters start.
    // Every suite cache is released first and the dead shuffle data from
    // ~30 prior queries GC-nudged out (ScalingBench's lesson: shuffle files
    // live until ContextCleaner sees their dependencies collected), so the
    // monsters run against a clean heap, as they would as standalone jobs.
    nodes.unpersist()
    documents.unpersist()
    embeddings.unpersist()
    System.gc()
    for (n <- Seq(50000L, 200000L)) {
      // partition count FIXED (not cpus-derived) and encoded in the path:
      // the fixture is cached across runs, so a cpus-dependent layout would
      // make the 200k/50k scaling ratio depend on which run wrote it first
      val parts = 64
      val p = s"/root/repo/target/bench/hvdocs_dist_n${n}_vinf_p$parts"
      if (!new java.io.File(p + "/_SUCCESS").exists())
        DeterministicGen.highVocabDocsDF(spark, n, vocab = Long.MaxValue)
          .repartition(parts)
          .write.mode("overwrite").parquet(p)
      val d = spark.read.parquet(p).cache()
      d.count()
      results(s"dedup_winnowed_vinf_${n / 1000}k") =
        best2(s"dedup_winnowed_vinf_${n / 1000}k")(
          Dedup.winnowedDupPairs(d, col("text"), col("doc_id"),
            k = 8, w = 4, threshold = 0.8, maxDocFreq = 1000).count())
      d.unpersist()
    }

    val calibParAfter = calibratePar(cpus.toInt)
    val calibMemAfter = calibrateMem()
    val calibAfter = calibrate()

    // --- emit ------------------------------------------------------------------
    val total = results.values.sum
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val spreadJson = spreads.map { case (k, (mn, mx)) =>
      "\"" + k + f"""\":[$mn%.3f,$mx%.3f]""" }.mkString("{", ",", "}")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread_min_max":$spreadJson,"calib_before_s":$calibBefore%.3f,"calib_after_s":$calibAfter%.3f,"calib_mem_before_s":$calibMemBefore%.3f,"calib_mem_after_s":$calibMemAfter%.3f,"calib_par_before_s":$calibParBefore%.3f,"calib_par_after_s":$calibParAfter%.3f,"sim_lsh_recall_at10":$lshRecall%.3f,"sim_ivf_recall_at10":$ivfRecall%.3f,"sf":"$sfDir","cpus":$cpus,"docs_rows":$nDocs,"filter_elements_per_sec":$filterEps%.0f,"filter_cold_elements_per_sec":$filterColdEps%.0f,"filter_spans_elements_per_sec":$filterSpansEps%.0f,"filter_spans_fast_elements_per_sec":$filterFastEps%.0f,"spatial_rows_per_sec":$spatialRps%.0f,"winnow_docs_per_sec":$winnowDps%.0f,"hv_docs_rows":$nHv,"media_rows":$nMedia,"audio_rows":$nAudio}"""
    println(json)
    // belt-and-braces for the driver: a file copy free of any logger prefixing
    val out = java.nio.file.Paths.get("/root/repo/target/bench/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json + "\n")
    spark.stop()
  }
}
