package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines. All shuffle-aware:
  * exact dedup partitions by fingerprint (one shuffle, map-side combine);
  * MinHash/SimHash candidate generation explodes band keys and equi-joins
  * within band buckets (candidates only — never the cross product), then
  * verifies exactly. */
object Dedup {

  /** Exact dedup by normalized-text fingerprint: keeps the smallest key per
    * duplicate group. One hash-partitioned shuffle on the 8-byte
    * fingerprint; survives 100TB because the state per reducer is one row
    * per group. */
  def exactDedup(docs: DataFrame, textCol: Column, keyCol: Column): DataFrame = {
    val fp = TextOps.fingerprint(textCol)
    val w = Window.partitionBy(fp).orderBy(keyCol)
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Duplicate groups (fingerprint, size, members) — the audit view. */
  def exactDupGroups(docs: DataFrame, textCol: Column, keyCol: Column): DataFrame =
    docs.groupBy(TextOps.fingerprint(textCol).as("fp"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(keyCol)).as("members"))
      .filter(col("n") > 1)

  /** Distinct word n-gram shingles of the normalized text. */
  def shingles(text: Column, n: Int): Column = {
    val tokens = filter(split(lower(trim(text)), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    when(size(tokens) < n, when(size(tokens) > 0, array(concat_ws(" ", tokens)))
        .otherwise(array().cast("array<string>")))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n))))))
  }

  /** Exact n-gram Jaccard similarity of two shingle-set columns. Both-empty
    * is null (pair dropped), matching the SQL-oracle convention (0/0) and
    * avoiding an ANSI divide-by-zero; token-less exact duplicates are the
    * exact-dedup operator's job, not a similarity score. */
  def jaccard(a: Column, b: Column): Column =
    when(size(a) === 0 && size(b) === 0, lit(null).cast("double"))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)))

  /** MinHash signature: `numHashes` min-values over per-seed shingle hashes.
    * Pure Columns: each signature slot is array_min over xxhash64(shingle ⊕
    * seed). */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column = {
    val slots = (0 until numHashes).map { i =>
      when(size(shinglesCol) === 0, lit(Long.MaxValue))
        .otherwise(array_min(transform(shinglesCol,
          s => xxhash64(s, lit(i)))))
    }
    array(slots: _*)
  }

  /** Per-band hashes of a minhash signature: band b hashes signature slots
    * [b·perBand, (b+1)·perBand) with the band index as seed. Shared by the
    * batch LSH join and the streaming near-dup state operator so their
    * banding is identical by construction. */
  private[graft] def bandHashes(sig: Column, numHashes: Int, bands: Int): Column = {
    require(bands * (numHashes / bands) == numHashes, "bands must divide numHashes")
    val perBand = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        slice(sig, b * perBand + lit(1), lit(perBand))), b))
  }

  /** MinHash-LSH near-duplicate pairs: signature → `bands` band keys →
    * equi-join within (band index, band hash) buckets → exact Jaccard
    * verification ≥ `threshold`. Returns (key_a, key_b, jaccard) with
    * key_a < key_b, deduplicated across bands.
    *
    * Scale shape: the only shuffle is the band-bucket self-join; bucket
    * sizes are bounded by collision rate, and AQE's skew-join splits
    * pathological buckets. The cross product never materializes. */
  def minhashDupPairs(docs: DataFrame, textCol: Column, keyCol: Column,
                      ngram: Int = 3, numHashes: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    // shingle + signature derivation materialized ONCE (eager
    // localCheckpoint): the plan reads it three times (banded candidate
    // generation + both verify re-attach sides), and each read would
    // otherwise re-tokenize and re-hash the corpus — numHashes array
    // traversals per doc per read (the winnowedDupPairs §8 pattern; the
    // proxy table is ~the corpus's token size, read-shared by all branches)
    val sig = docs.select(keyCol.as("key"),
      shingles(textCol, ngram).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .localCheckpoint(true)
    // band shuffle carries (key, band, bandhash) ONLY — at 100 TB shipping
    // the shingle arrays through this self-join twice would dwarf the join
    // itself; the shingles are re-attached for the surviving candidate pairs
    // (deduplicated across bands first) by two narrow key joins.
    val banded = sig.select(col("key"),
      posexplode(bandHashes(col("sig"), numHashes, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
    val l = banded.select(col("band"), col("bandhash"), col("key").as("key_a"))
    val r = banded.select(col("band"), col("bandhash"), col("key").as("key_b"))
    val candidates = l.join(r, Seq("band", "bandhash"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b").distinct()
    val shTbl = sig.select(col("key"), col("sh"))
    candidates
      .join(shTbl.select(col("key").as("key_a"), col("sh").as("sh_a")), "key_a")
      .join(shTbl.select(col("key").as("key_b"), col("sh").as("sh_b")), "key_b")
      .select(col("key_a"), col("key_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** All-pairs exact n-gram Jaccard above a threshold (quadratic — the
    * small-data oracle for LSH and a usable op below ~100k docs when
    * pre-blocked). */
  def jaccardDupPairs(docs: DataFrame, textCol: Column, keyCol: Column,
                      ngram: Int = 3, threshold: Double = 0.5): DataFrame = {
    val s = docs.select(keyCol.as("key"), shingles(textCol, ngram).as("sh"))
    val l = s.select(col("key").as("key_a"), col("sh").as("sh_a"))
    val r = s.select(col("key").as("key_b"), col("sh").as("sh_b"))
    l.crossJoin(r).filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over word tokens, pure Columns: per-bit majority vote of
    * token hashes, built with 64 aggregate() passes folded into one
    * projection. bit b of the result = 1 iff Σ_tokens sign(bit b of
    * hash(token)) > 0. */
  def simhash(text: Column): Column = {
    val tokens = filter(split(lower(trim(text)), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    val hashes = transform(tokens, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftrightunsigned(h, b).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash per document — ONE codegen'd projection pass
    * ([[graft.exprs.SimhashExpr]]). A document's simhash depends only on
    * its own tokens, so the round-5 shape — explode tokens, xxhash64,
    * hash-aggregate 64 per-bit vote sums, recombine — paid a corpus-wide
    * exchange plus 64 aggregation buffers per key for what is a pure
    * per-row function; the kernel computes the same bits in a single text
    * scan with no shuffle at all (guide §1.2 step 1: remove the pass, not
    * tune it). Equivalence with the HOF [[simhash]] form is spec-pinned;
    * null text coalesces to 0L exactly as the aggregation's empty-group
    * chain did. Returns (key, sim). */
  def simhashDF(docs: DataFrame, textCol: Column, keyCol: Column): DataFrame = {
    val sim = org.apache.spark.sql.GraftBridge.column(graft.exprs.SimhashExpr(
      org.apache.spark.sql.GraftBridge.expression(textCol)))
    docs.select(keyCol.as("key"), coalesce(sim, lit(0L)).as("sim"))
  }

  /** SimHash near-dup pairs: split the 64-bit simhash into `bands`
    * contiguous chunks (static shifts, codegen'd); docs sharing any chunk
    * are candidates; verify by Hamming distance ≤ maxHamming. Same
    * band-bucket join shape as MinHash-LSH — no cross product. */
  def simhashDupPairs(docs: DataFrame, textCol: Column, keyCol: Column,
                      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val s = simhashDF(docs, textCol, keyCol)
    val bandCols = (0 until bands).map(b =>
      shiftrightunsigned(col("sim"), b * bandBits).bitwiseAND(lit(mask)))
    val banded = s.select(col("key"), col("sim"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandval")
    val l = banded.select(col("band"), col("bandval"),
      col("key").as("key_a"), col("sim").as("sim_a"))
    val r = banded.select(col("band"), col("bandval"),
      col("key").as("key_b"), col("sim").as("sim_b"))
    l.join(r, Seq("band", "bandval"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        hamming(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("key_a", "key_b").agg(min("hamming").as("hamming"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Duplicate-cluster resolution: connected components over a dup-pairs
    * DataFrame (columns `key_a`, `key_b` — the output shape of every pair
    * operator above). Returns `(key, cluster)` for every key that appears in
    * a pair, where `cluster` is the component's minimum key. This is the
    * missing last stage of a real training-data dedup: pair detection is not
    * a dedup until pairs are transitively closed (a~b, b~c ⇒ {a,b,c} is ONE
    * group) and one canonical doc survives per group.
    *
    * Algorithm: iterative min-label propagation to fixpoint, DataFrames
    * only — each round (1) every edge offers each endpoint's label to the
    * other, keep the min per key; (2) pointer-jumping compression
    * (L(k) := L(L(k))) collapses label chains so convergence is
    * O(log diameter) rounds, not O(diameter); (3) stop when no label
    * changed. Each round is a pair of hash-shuffles on the key — no
    * cartesian, no driver-side adjacency. `localCheckpoint` between rounds
    * truncates the growing plan lineage (the SpatialOps ladder pattern);
    * AQE handles skewed hub keys.
    *
    * Driver coordination is ONE action per round: the previous round's label
    * rides through the propagation aggregate (max over a column that is null
    * on the edge-offer branches), and change detection is an `observe()`
    * metric collected by the round's eager localCheckpoint job — no separate
    * join + count pass. */
  def dupClusters(pairs: DataFrame, maxIters: Int = 50,
                  maxDriverEdges: Long = 2000000L): DataFrame = {
    val edges = pairs.select(col("key_a").as("a"), col("key_b").as("b"))
      .distinct().localCheckpoint(true)
    // Size-adaptive (round 6, the AQE-broadcast analogy): a dedup's pair
    // set is usually orders of magnitude smaller than its corpus — when the
    // DISTINCT edge set fits comfortably on the driver (same budget class
    // as a broadcast join's build side), a driver-side union-find resolves
    // components in one collect instead of O(log diameter) rounds of two
    // shuffles each; the iterative loop below remains the path for edge
    // sets above the guard. Guard sizing: the driver walk is single-thread
    // O(E) (measured ~42 s at 5.6M boxed edges), so the default stays well
    // below the crossover where the distributed loop wins at cluster
    // parallelism (the N→4N scaling evidence for big edge sets is the
    // LOOP's 0.87 — ScalingBench's 5.6M-edge fixture deliberately exceeds
    // this guard). Output is identical by construction: cluster =
    // the component's minimum key under Spark's own ordering (UTF8 binary
    // for strings — NOT String.compareTo, which disagrees on supplementary
    // code points).
    val keyField = edges.schema("a")
    val nullableKey = keyField.nullable || edges.schema("b").nullable
    val driverOrd: Option[Ordering[Any]] = keyField.dataType match {
      case org.apache.spark.sql.types.StringType =>
        Some(Ordering.fromLessThan[Any]((x, y) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(x.asInstanceOf[String])
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(
              y.asInstanceOf[String])) < 0))
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType =>
        Some(Ordering.by[Any, Long](_.asInstanceOf[Number].longValue()))
      case _ => None // exotic key type: keep the distributed path
    }
    if (driverOrd.isDefined && edges.count() <= maxDriverEdges) {
      implicit val ord: Ordering[Any] = driverOrd.get
      val es = edges.collect().map(r => (r.get(0), r.get(1)))
      val parent = new java.util.HashMap[Any, Any]()
      def find(x0: Any): Any = {
        var x = x0
        while ({ val p = parent.getOrDefault(x, x); p != x && { x = p; true } }) ()
        var y = x0 // path compression
        while ({ val p = parent.getOrDefault(y, y); p != y && { parent.put(y, x); y = p; true } }) ()
        x
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ord.lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val verts = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
      val rows = verts.iterator
        .map(v => org.apache.spark.sql.Row(v, find(v))).toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", keyField.dataType, nullableKey),
        org.apache.spark.sql.types.StructField("cluster", keyField.dataType, nullableKey)))
      return pairs.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    }
    // both edge directions in one relation: each round then offers labels
    // across edges with ONE equi-join instead of two (round 6 — halves the
    // per-round join count; the offer multiset is identical). Lazy — a
    // union of two projections of the already-checkpointed edge table costs
    // nothing to re-derive, and an eager checkpoint here measurably ADDED a
    // job per call at gate scale.
    val dir = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
    var labels = edges.select(col("a").as("key"))
      .unionByName(edges.select(col("b").as("key")))
      .distinct().withColumn("cluster", col("key")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val offers = dir.join(labels, dir("src") === labels("key"))
        .select(col("dst").as("key"), col("cluster"), lit(null).cast("long").as("old"))
      // every key occurs exactly once in `labels`, so max("old") recovers
      // that round's label (the single non-null) per key
      val prop = labels.select(col("key"), col("cluster"), col("cluster").as("old"))
        .unionByName(offers)
        .groupBy("key").agg(min("cluster").as("cluster"), max("old").as("old"))
      // pointer jumping: a label is itself a vertex key, so one extra hop
      // through the label table halves the remaining chain length
      val hop = prop.select(col("key").as("ck"), col("cluster").as("cc"))
      val obs = org.apache.spark.sql.Observation(s"dupClusters_round_$i")
      val compressed = prop.join(hop, prop("cluster") === hop("ck"), "left")
        .select(prop("key"),
          coalesce(col("cc"), prop("cluster")).as("cluster"), col("old"))
        .observe(obs, sum(when(col("cluster") =!= col("old"), 1L).otherwise(0L))
          .as("changed"))
        .drop("old")
        .localCheckpoint(true) // the round's one action; collects `changed`
      labels = compressed
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"dupClusters did not converge in $maxIters rounds (log-diameter > $maxIters?)")
    labels
  }

  /** Keeps one survivor per duplicate cluster: the cluster representative
    * (minimum key) plus every un-clustered doc. `clusters` is
    * [[dupClusters]] output; the join is a broadcast-or-shuffle hash join on
    * the key — never wider than the duplicate set. */
  def dedupByClusters(docs: DataFrame, keyCol: Column, clusters: DataFrame): DataFrame =
    docs.join(
      clusters.filter(col("key") =!= col("cluster"))
        .select(col("key").as("__dup_key")),
      keyCol === col("__dup_key"), "left_anti")

  /** Near-duplicate pairs by winnowed-fingerprint overlap
    * ([[TextOps.winnowedFingerprints]]): explode fingerprints, equi-join on
    * the fingerprint value (candidates only — never a cross product), count
    * shared fingerprints per pair, keep pairs whose overlap coefficient
    * `shared / min(|A|, |B|)` ≥ `threshold`. Returns
    * (key_a, key_b, shared, overlap) with key_a < key_b.
    *
    * Scale shape (round-6 form): the winnow kernel runs EXACTLY ONCE — the
    * compact (key, n_total, fingerprints) rows are materialized eagerly
    * (`localCheckpoint`) and every downstream branch (doc-frequency table,
    * candidate join, per-doc stats, exact verify) reads the materialized
    * narrow rows. Document frequency is a sort-free hash aggregation kept
    * at df >= 2 and broadcast BACK onto the exploded rows (guide §3.2's
    * reduce-before-shuffle, exact instead of Bloom), so the corpus-sized
    * exploded row set is never sorted and never shuffled — only rows in
    * duplicated buckets reach the pair self-join's exchange. This is the
    * guide-§8 proxy pattern: one decision pass derives the lightweight
    * rows, and nothing re-reads the text.
    *
    * Hot-fingerprint valve: boilerplate text (license headers, templates)
    * makes HOT fingerprints whose buckets go quadratic, so fingerprints
    * appearing in more than `maxDocFreq` documents are dropped from
    * CANDIDATE GENERATION only (a pair must share at least one rare
    * fingerprint to be considered; documents duplicated more than
    * `maxDocFreq` times are exact-dedup's job, not a similarity query).
    * Candidates are then PREFILTERED on a provable overlap upper bound
    * (shared-rare count from the band join + per-doc totals/hot counts),
    * and verification recomputes `shared` over ALL fingerprints of each
    * surviving pair from the materialized fingerprint table: the surviving
    * pair list is materialized (broadcast-sized), so the two re-attach
    * joins stream the table once each and no fingerprint array is ever
    * shuffled. Hot fingerprints still count toward the reported overlap.
    *
    * Corpus caveat: on template/low-vocabulary corpora the fingerprint space
    * collapses (few distinct window-min values ⇒ high document frequency for
    * EVERY fingerprint) and the true answer itself approaches O(n²) pairs;
    * raise `k` (longer grams ⇒ more distinct fingerprints), raise
    * `threshold`, or lower `maxDocFreq` before running at scale — and treat
    * a mostly-hot fingerprint distribution (see tools.WinnowSizeProbe) as a
    * signal the corpus needs exact dedup first. */
  def winnowedDupPairs(docs: DataFrame, textCol: Column, keyCol: Column,
                       k: Int = 8, w: Int = 4, threshold: Double = 0.5,
                       maxDocFreq: Int = 1000,
                       maxBroadcastFps: Long = 20000000L): DataFrame = {
    // ONE kernel pass: the per-doc fingerprint table, eagerly materialized
    // in its COMPACT form (one row per doc, primitive-long array — ~4× fewer
    // bytes than materializing the exploded rows). At 100 TB this is the §8
    // "write the proxy once" trade: the fingerprint table is ~an order
    // smaller than the text the old plan re-derived per branch, and all
    // consumers below (df table, candidate join, stats, verify) read it
    // instead of re-running the kernel.
    val fmat = TextOps.winnowedFingerprints(
      docs.select(keyCol.as("key"), textCol.as("__text")),
      col("__text"), "fps", k, w)
      .select(col("key"), size(col("fps")).as("nt"), col("fps"))
      .localCheckpoint(true)
    val e = fmat.select(col("key"), explode(col("fps")).as("f"))
    // Document frequency as a hash AGGREGATION, keeping only df >= 2 — the
    // round-6 shape. The previous window form paid a corpus-sized exchange
    // PLUS a per-partition sort, and the window itself ran once per join
    // side above the reused exchange; the aggregation ships the same bytes
    // but never sorts (guide §2.3/§2.4). df >= 2 is semantics-preserving (a
    // fingerprint held by ONE doc can never witness a pair) and on
    // high-vocabulary corpora drops ~97% of fingerprints, so the table
    // below is a small fraction of the corpus.
    val dfT = fmat.select(explode(col("fps")).as("f"))
      .groupBy("f").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .localCheckpoint(true)
    // Rare/hot membership is applied ON THE COMPACT ARRAYS, before any
    // explode (guide §3.2's reduce-before-shuffle, exact instead of Bloom —
    // a false positive is impossible, and a df=1 fingerprint dropped here
    // could never have produced a pair anyway): the df>=2 table is collected
    // (a few percent of the corpus on high-vocabulary data), split into the
    // rare set (2 <= df <= maxDocFreq, broadcast as a sorted array for the
    // codegen'd LongArrayRetainSorted kernel) and the hot set
    // (df > maxDocFreq, bounded by construction at
    // total-occurrences/maxDocFreq). Candidate generation explodes only
    // surviving fingerprints — the corpus-sized exploded row set is never
    // materialized, sorted, or shuffled. Per-doc hot counts come from the
    // same compact arrays in one projection. Guarded: above
    // `maxBroadcastFps` df>=2 fingerprints the driver collect would be the
    // bottleneck, so fall back to a shuffle-join attach — same rows, the
    // honest shape at that scale.
    val spark = docs.sparkSession
    val (gen, stats) =
      if (dfT.count() <= maxBroadcastFps) {
        // primitive typed collects (no Row boxing) — two cheap jobs over the
        // materialized df table
        val longEnc = org.apache.spark.sql.Encoders.scalaLong
        val rare = dfT.filter(col("df") <= maxDocFreq)
          .select(col("f")).as(longEnc).collect()
        java.util.Arrays.sort(rare)
        val hotArr = dfT.filter(col("df") > maxDocFreq)
          .select(col("f")).as(longEnc).collect()
        java.util.Arrays.sort(hotArr)
        val bcRare = spark.sparkContext.broadcast(rare)
        val bcHot = spark.sparkContext.broadcast(hotArr)
        def retain(bc: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
          org.apache.spark.sql.GraftBridge.column(
            graft.exprs.LongArrayRetainSorted(
              org.apache.spark.sql.GraftBridge.expression(col("fps")), bc))
        // n_hot via the same codegen'd retain kernel (no per-row Seq boxing
        // — the stats subtree is evaluated under BOTH prefilter joins)
        (fmat.select(col("key"), explode(retain(bcRare)).as("f")),
          fmat.select(col("key"), col("nt").as("n_total"),
            size(retain(bcHot)).cast("long").as("n_hot")))
      } else {
        val ef = e.join(dfT, Seq("f"))
        val hot = ef.filter(col("df") > maxDocFreq)
          .groupBy("key").agg(count(lit(1)).as("n_hot"))
        (ef.filter(col("df") <= maxDocFreq).select(col("key"), col("f")),
          fmat.select(col("key"), col("nt").as("n_total"))
            .join(hot, Seq("key"), "left")
            .select(col("key"), col("n_total"),
              coalesce(col("n_hot"), lit(0L)).as("n_hot")))
      }
    val l = gen.select(col("f"), col("key").as("key_a"))
    val r = gen.select(col("f"), col("key").as("key_b"))
    // shared-RARE count per candidate pair, computed IN the band join with a
    // map-side-combinable aggregation — no arrays shuffled, ever
    val sharedRare = l.join(r, Seq("f"))
      .filter(col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b").agg(count(lit(1)).as("shared_rare"))
    // PREFILTER (provable upper bound, never drops a qualifying pair):
    // shared_total <= shared_rare + min(n_hot_a, n_hot_b), so a pair can
    // only reach `overlap >= threshold` if that bound does. This is the
    // scale valve: incidental single-fingerprint collisions (gram-space
    // birthday pairs — measured 10M of them on a 400k-doc corpus) die here,
    // and verify cost becomes O(true near-dups · doc size).
    val plausible = sharedRare
      .join(stats.select(col("key").as("key_a"), col("n_total").as("nt_a"),
        col("n_hot").as("nh_a")), "key_a")
      .join(stats.select(col("key").as("key_b"), col("n_total").as("nt_b"),
        col("n_hot").as("nh_b")), "key_b")
      .filter((col("shared_rare") + least(col("nh_a"), col("nh_b"))).cast("double") >=
        lit(threshold) * least(col("nt_a"), col("nt_b")))
      .select("key_a", "key_b")
      // tiny (surviving pairs only): materialize so the verify joins below
      // see a broadcast-sized relation instead of re-planning the whole
      // candidate-generation DAG under each join
      .localCheckpoint(true)
    // exact verify from the FULL fingerprint sets (hot fingerprints still
    // count toward the reported overlap) — the re-attach joins stream the
    // MATERIALIZED table against the pair list, and array_intersect runs
    // only on the surviving pairs. The pair list is an ExistingRDD scan
    // after the checkpoint, so the planner has no size estimate for it and
    // would sort-merge-join — shuffling AND sorting the corpus-sized
    // fingerprint table twice; an explicit broadcast hint (guarded by the
    // materialized count, second join carries the attached fps_a arrays so
    // the cap is conservative) keeps fmat unshuffled: two streamed
    // broadcast-hash joins.
    val broadcastPairs = plausible.count() <= 100000L
    def hinted(df: DataFrame): DataFrame = if (broadcastPairs) broadcast(df) else df
    hinted(plausible)
      .join(fmat.select(col("key").as("key_a"), col("fps").as("fps_a")), "key_a")
      .transform(hinted)
      .join(fmat.select(col("key").as("key_b"), col("fps").as("fps_b")), "key_b")
      .select(col("key_a"), col("key_b"),
        size(array_intersect(col("fps_a"), col("fps_b"))).cast("long").as("shared"),
        (size(array_intersect(col("fps_a"), col("fps_b"))).cast("double") /
          least(size(col("fps_a")), size(col("fps_b")))).as("overlap"))
      .filter(col("overlap") >= threshold)
  }
}
