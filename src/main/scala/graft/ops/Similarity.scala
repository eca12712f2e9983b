package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): codegen'd
  * [[graft.exprs.VectorDot]] dot products, window top-k.
  * Baseline: brute-force cosine top-k. Scale paths: random-hyperplane LSH
  * bucketing and IVF coarse quantization; exact re-rank inside candidate
  * buckets; deterministic seeds throughout.
  *
  * WHICH ANN TO DEFAULT TO: **IVF** ([[ivfTopK]]). Measured recall@10 at
  * comparable scanned fractions (tools.RecallProbe, BASELINE.md round-5
  * table, both the worst-case uniform fixture and a clustered
  * mixture-of-centers fixture): IVF's data-trained centroids track corpus
  * structure, while data-independent hyperplanes cannot — LSH's recall at
  * production knobs is far below IVF's on both fixtures. Use [[lshTopK]]
  * when training a quantizer is impossible (true streaming one-pass) or as
  * the signature machinery for near-dup pair detection
  * ([[cosineDupPairs]]), where exact-signature collision of duplicates is
  * the property being used, not approximate recall. For query batches,
  * train once with [[ivfCentroids]] and probe via the pretrained
  * [[ivfTopK]] overload. */
object Similarity {

  /** Codegen'd dot product (semantics identical to [[dotHof]], which stays
    * as the test oracle — the HOF form is CodegenFallback and was the hot
    * loop's bottleneck at 100 TB of embeddings). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.exprs.VectorDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** The HOF composition VectorDot replaces — kept as the equivalence
    * oracle (CodegenFallback; do not use on a scale path). */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private[graft] def normHof(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact top-k per query in two phases: a salted local top-k
    * (`pmod(vec_id, salts)` sub-groups) bounds every sort to its group's
    * rows, then the global rank orders only ≤ salts·k survivors per query.
    * EXACT: any row in a query's true global top-k has < k rows above it in
    * its own salt group, so it survives phase 1; both phases share the
    * (cos desc, vec_id) tie-break, so output rows and rn values equal the
    * single-window form. The single window — partitionBy(query_id) alone —
    * caps parallelism at the query count and fully sorts each query's
    * candidate set in ONE task (3M rows per task on the 3M-corpus scaling
    * fixture: N→4N efficiency 0.64); two-phase restores parallelism
    * queries × salts and O(rows) total work. */
  private def topKPerQuery(scored: DataFrame, k: Int, salts: Int = 64): DataFrame = {
    val wLocal = Window.partitionBy(col("query_id"), pmod(col("vec_id"), lit(salts.toLong)))
      .orderBy(col("cos").desc, col("vec_id"))
    val local = scored.withColumn("rn", row_number().over(wLocal))
      .filter(col("rn") <= k).drop("rn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    local.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "vec_id", "cos", "rn")
  }

  /** Brute-force cosine top-k: queries × corpus, exact. The corpus side
    * streams; the query side broadcasts. O(Q·N) — the ground-truth baseline
    * and the right tool when Q is small. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"))
    val scored = corpus.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
    topKPerQuery(scored, k)
  }

  /** recall@k of an approximate result against exact `truth` — both shaped
    * (query_id, vec_id, …). THE recall definition: every consumer
    * (Bench's per-round `sim_*_recall_at10` fields, RecallProbe's sweep
    * table) must route through here so the protocol cannot drift between
    * the artifact and the BASELINE table. PRECONDITION: callers should
    * `.cache()` (and materialize) `truth` before sweeping — each call
    * counts it for the denominator and joins against it, so an uncached
    * bruteTopK re-executes the full O(N·Q) scan per call. */
  def recallAgainst(truth: DataFrame, approx: DataFrame): Double = {
    val t = truth.select("query_id", "vec_id")
    val denom = t.count()
    if (denom == 0) return 0.0 // empty truth: recall is vacuous, not NaN
    // distinct: a duplicate-emitting approx path must not count a truth row
    // twice (recall > 1.0 would mask the duplication instead of surfacing it)
    approx.select("query_id", "vec_id").distinct()
      .join(t, Seq("query_id", "vec_id"), "left_semi").count().toDouble / denom
  }

  /** First `probes` XOR masks in full signature hamming order (all 1-bit
    * flips, then 2-bit, … up to all bits) — the shared multi-probe ladder of
    * [[lshTopK]] and [[cosineDupPairs]]. */
  private def hammingFlips(bits: Int, probes: Int): Seq[Long] =
    (1 to bits).iterator.flatMap(k =>
      (0 until bits).combinations(k).map(_.map(1L << _).sum))
      .take(probes).toSeq

  /** Deterministic random hyperplanes: `bits` planes of dimension `dim`. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit signature of an embedding against broadcast-literal planes —
    * one codegen'd dot product per plane, one pass. */
  def lshSignature(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotLit(emb, p) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN top-k: bucket corpus and queries by hyperplane
    * signature with `probes` multi-probe neighbor buckets (flip one bit),
    * exact cosine re-rank within candidate buckets. Recall grows with
    * probes/bits tradeoff; exactness is NOT guaranteed — that's the point of
    * the scale path. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dim: Int, bits: Int = 12, probes: Int = 4,
              seed: Long = 42L): DataFrame =
    topKPerQuery(lshJoined(corpus, queries, dim, bits, probes, seed)
      .withColumn("cos", cosine(col("embedding"), col("q_emb"))), k)

  /** The candidate join [[lshTopK]] re-ranks — one row per (query, corpus
    * vector) the probe ladder actually scans. */
  private def lshJoined(corpus: DataFrame, queries: DataFrame, dim: Int,
                        bits: Int, probes: Int, seed: Long): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val c = corpus.withColumn("bucket", lshSignature(col("embedding"), planes))
    val qSig = queries.select(col("query_id"), col("embedding").as("q_emb"))
      .withColumn("sig", lshSignature(col("q_emb"), planes))
    // multi-probe: the bucket itself + `probes` nearest buckets in full
    // signature hamming order (1-bit flips, 2-bit, … up to all bits), so
    // probes = 2^bits - 1 degrades gracefully to an exact full scan
    val probeCols = lit(0L) +: hammingFlips(bits, probes).map(lit(_))
    val qBuckets = qSig.select(col("query_id"), col("q_emb"),
      explode(array(probeCols.map(p => col("sig").bitwiseXOR(p)): _*)).as("bucket"))
    // a corpus vector has ONE bucket and a query's probe buckets are
    // distinct XOR masks, so each (query, vec) candidate joins exactly once
    c.join(qBuckets, Seq("bucket"))
  }

  /** ACTUAL candidates the LSH config scans (shares [[lshJoined]] with the
    * operator): bucket-size skew makes the uniform estimate
    * (1+probes)/2^bits wrong on structured corpora, so published
    * scanned-fraction numbers must come from here. */
  def lshCandidateCount(corpus: DataFrame, queries: DataFrame, dim: Int,
                        bits: Int = 12, probes: Int = 4,
                        seed: Long = 42L): Long =
    lshJoined(corpus, queries, dim, bits, probes, seed).count()

  // --- IVF (inverted-file) ANN: the coarse-quantizer scale path -------------

  private def dotLit(emb: Column, v: Array[Double]): Column =
    dot(emb, array(v.map(lit): _*))

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Nearest-centroid id (centroids pre-normalized, so argmax dot ≡ argmax
    * cosine). array_max over (score, -idx) structs keeps ties deterministic. */
  private def assignCol(emb: Column, cents: Array[Array[Double]]): Column =
    array_max(array(cents.zipWithIndex.map { case (c, i) =>
      struct(dotLit(emb, c).as("s"), lit(-i).as("ni"))
    }: _*)).getField("ni") * -1

  /** k-means coarse quantizer, trained distributed: deterministic seeded
    * init, `iters` Lloyd rounds (assign via broadcast-literal dot products,
    * recenter via posexplode + per-(centroid, dim) average). Centroid count
    * and dims are small; the heavy side (corpus) is never collected.
    *
    * Knobs vs recall (measured, tools.RecallProbe / BASELINE.md round-4):
    * `iters` is fixed with no movement check — standard Lloyd, and at the
    * default nCentroids=16 round 2 is already within noise of converged on
    * the bench fixture; an empty centroid keeps its stale position
    * (deterministic; it simply attracts no probes). Raising `iters` buys
    * assignment balance, not recall — recall is governed by nProbe/nCentroids
    * (the scanned fraction): nc=16 np=1/2/4/8 → 0.29/0.42/0.56/0.76 @10 on
    * the structureless uniform fixture. */
  def ivfCentroids(corpus: DataFrame, dim: Int, nCentroids: Int,
                   iters: Int = 2, seed: Long = 42L): Array[Array[Double]] = {
    var cents = hyperplanes(dim, nCentroids, seed).map(normalize)
    for (_ <- 0 until iters) {
      // recenter via posexplode + per-(centroid, dim) average. A round-6
      // experiment replaced this with `dim` avg columns in one aggregation
      // (guide §2.3 "aggregate before you shuffle") and measured SLOWER
      // (0.72 s → 0.84 s bench row): 64 aggregate buffers push the
      // aggregation past the whole-stage-codegen field budget, while the
      // exploded form's single avg stays fused and its dim× row blow-up is
      // collapsed by map-side partial aggregation before the exchange.
      val means = corpus
        .withColumn("cid", assignCol(col("embedding"), cents))
        .select(col("cid"), posexplode(col("embedding")))
        .groupBy("cid", "pos").agg(avg("col").as("v"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Number]("cid").intValue())(r.getAs[Int]("pos")) =
          r.getAs[Double]("v")
      }
      cents = next.map(normalize)
    }
    cents
  }

  /** IVF ANN top-k, fused train+probe: trains the coarse quantizer on
    * `corpus` then probes — the one-shot convenience form. At scale,
    * training (two Lloyd rounds = two full corpus scans + collects) is a
    * SEPARATE job from probing: a pipeline issuing query batches should
    * train once via [[ivfCentroids]] (persist the tiny nCentroids×dim
    * array) and call the pretrained overload per batch — equivalence is
    * spec-pinned (train-once/probe-twice == fused). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 2,
              seed: Long = 42L): DataFrame =
    ivfTopK(corpus, queries, k,
      ivfCentroids(corpus, dim, nCentroids, iters, seed), nProbe)

  /** IVF ANN top-k against PRETRAINED centroids (see [[ivfCentroids]]):
    * corpus bucketed by nearest centroid; each query probes its `nProbe`
    * best centroids and exact-ranks only those buckets. The probe list is
    * computed as a sorted literal-centroid score array — all pure Columns,
    * queries broadcast; no training job runs. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              cents: Array[Array[Double]], nProbe: Int): DataFrame =
    topKPerQuery(ivfJoined(corpus, queries, cents, nProbe)
      .withColumn("cos", cosine(col("embedding"), col("q_emb"))), k)

  /** The candidate join [[ivfTopK]] re-ranks — one row per (query, corpus
    * vector) in the probed buckets. */
  private def ivfJoined(corpus: DataFrame, queries: DataFrame,
                        cents: Array[Array[Double]], nProbe: Int): DataFrame = {
    val bucketed = corpus.withColumn("cid", assignCol(col("embedding"), cents))
    val scoreArr = array(cents.zipWithIndex.map { case (c, i) =>
      struct(dotLit(col("q_emb"), c).as("s"), lit(-i).as("ni"))
    }: _*)
    val probes = queries
      .select(col("query_id"), col("embedding").as("q_emb"))
      .withColumn("probe",
        explode(slice(reverse(array_sort(scoreArr)), 1, nProbe)))
      .withColumn("cid", col("probe").getField("ni") * -1)
      .drop("probe")
    // each (query, vec) joins at most once: a corpus vector has one cid and
    // a query's probe list is distinct centroid ids
    bucketed.join(broadcast(probes), Seq("cid"))
  }

  /** ACTUAL candidates the IVF config scans (shares [[ivfJoined]] with the
    * operator): queries preferentially probe DENSE clusters, so on
    * structured corpora the uniform estimate nProbe/nCentroids understates
    * the scan — published fractions must come from here. */
  def ivfCandidateCount(corpus: DataFrame, queries: DataFrame,
                        cents: Array[Array[Double]], nProbe: Int): Long =
    ivfJoined(corpus, queries, cents, nProbe).count()

  /** Embedding near-duplicate pairs: cosine ≥ threshold via LSH-bucket
    * self-join + exact verify (no cross product).
    *
    * `probes` > 0 reuses [[lshTopK]]'s hamming-order probe ladder on one
    * side of the self-join: a near-but-not-identical duplicate whose
    * signature differs in ≤h bits is a guaranteed candidate once `probes`
    * covers hamming distance h (`probes >= Σ_{k<=h} C(bits,k)`), so recall
    * for cos≈1 pairs that straddle a hyperplane is a knob, not luck.
    * probes = 0 keeps exact-signature candidacy (identical vectors always
    * collide — the gate parameterization).
    *
    * Scale shape: the bucket self-join ships (bucket, key) ONLY; candidate
    * pairs are dedup'd before the embeddings are re-attached by two narrow
    * key joins for the exact verify. */
  def cosineDupPairs(corpus: DataFrame, keyCol: Column, threshold: Double,
                     dim: Int, bits: Int = 10, seed: Long = 42L,
                     probes: Int = 0): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val c = corpus.select(keyCol.as("key"), col("embedding"))
      .withColumn("sig", lshSignature(col("embedding"), planes))
    val probeCols = lit(0L) +: hammingFlips(bits, probes).map(lit(_))
    val l = c.select(col("key").as("key_a"),
      explode(array(probeCols.map(p => col("sig").bitwiseXOR(p)): _*)).as("bucket"))
    val r = c.select(col("sig").as("bucket"), col("key").as("key_b"))
    val candidates = l.join(r, Seq("bucket"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b").distinct()
    val embTbl = c.select(col("key"), col("embedding"))
    candidates
      .join(embTbl.select(col("key").as("key_a"), col("embedding").as("emb_a")), "key_a")
      .join(embTbl.select(col("key").as("key_b"), col("embedding").as("emb_b")), "key_b")
      .select(col("key_a"), col("key_b"), cosine(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
