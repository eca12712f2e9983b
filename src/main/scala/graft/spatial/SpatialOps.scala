package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-first spatial operators (north rule; the reference has no spatial
  * code — SURVEY.md §2.6): batched cell encoding, point-in-polygon, spatial
  * join via cell-cover prejoin + exact refine (the approximate-prejoin/refine
  * shape of the Raster-Intervals/Raptor pattern), kNN via ring-expansion
  * candidates + window top-k with exact fallback, raster↔vector prefix join.
  *
  * The cell encoder is PURE Column arithmetic (shift/and/or) so it stays
  * inside whole-stage codegen — no UDF or CodegenFallback in the
  * hot path. Polygon sides are broadcast (small per BASELINE.json);
  * dense-urban-cell skew is handled by salting + AQE skew join.
  */
object SpatialOps {

  // --- cell encoder: Column mirror of ZCell.encode ---------------------------

  private def spreadCol(v0: Column): Column = {
    var v = v0.bitwiseAND(lit(0x3ffffffL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000ffff0000ffffL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
    v
  }

  private def clampCol(v: Column, hi: Long): Column =
    least(greatest(v, lit(0L)), lit(hi))

  /** Z-order cell of a point at `level` — codegen-friendly, vectorizable. */
  def cellId(lat: Column, lon: Column, level: Int): Column = {
    require(level >= 0 && level <= ZCell.MaxLevel)
    val n = 1L << level
    val x = clampCol(floor((lon + 180.0) / 360.0 * n).cast("long"), n - 1)
    val y = clampCol(floor((lit(90.0) - lat) / 180.0 * n).cast("long"), n - 1)
    shiftleft(shiftleft(spreadCol(y), 1).bitwiseOR(spreadCol(x)), 5)
      .bitwiseOR(lit(level.toLong))
  }

  private def compactCol(v0: Column): Column = {
    var v = v0.bitwiseAND(lit(0x5555555555555555L))
    v = (v.bitwiseOR(shiftrightunsigned(v, 1))).bitwiseAND(lit(0x3333333333333333L))
    v = (v.bitwiseOR(shiftrightunsigned(v, 2))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    v = (v.bitwiseOR(shiftrightunsigned(v, 4))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    v = (v.bitwiseOR(shiftrightunsigned(v, 8))).bitwiseAND(lit(0x0000ffff0000ffffL))
    v = (v.bitwiseOR(shiftrightunsigned(v, 16))).bitwiseAND(lit(0x00000000ffffffffL))
    v
  }

  /** Grid x/y of a cell (Column mirrors of ZCell.x/y). */
  def cellX(cell: Column): Column = compactCol(shiftrightunsigned(cell, 5))
  def cellY(cell: Column): Column = compactCol(shiftrightunsigned(cell, 6))

  /** Ancestor cell at a coarser level — a shift, so raster↔vector prefix
    * joins are plain integer equality (both levels statically known). */
  def cellParent(cell: Column, fromLevel: Int, toLevel: Int): Column = {
    require(toLevel <= fromLevel)
    shiftleft(shiftrightunsigned(shiftrightunsigned(cell, 5), 2 * (fromLevel - toLevel)), 5)
      .bitwiseOR(lit(toLevel.toLong))
  }

  // --- Hilbert / S2 cell encoders (native codegen'd kernels) ----------------
  //
  // Unlike the Z encoder (spread/compact ARE stateless bit math, so the
  // Column form above is the right shape), the Hilbert position is a
  // sequential transducer; an unrolled Column form duplicates each level's
  // state subtree into every later level (no let-binding in Catalyst) and
  // measured 52× slower than the Z row at level 12. Both encoders
  // therefore go through a native Expression whose doGenCode is one static
  // call into the scalar kernel — see graft.exprs.CellIdExprs scaladoc for
  // the numbers and HilbertS2Spec for the bit-equality + codegen pins.

  /** Planar Hilbert cell at `level` — [[HCell.encode]] as a codegen'd
    * kernel: same equirect grid as [[cellId]] (identical floor/clamp
    * arithmetic, so the cell GEOMETRY matches ZCell's), Hilbert curve
    * position as the address. [[cellParent]] applies unchanged — the
    * `(pos << 5) | level` layout and the prefix property are shared. */
  def hilbertCellId(lat: Column, lon: Column, level: Int): Column =
    org.apache.spark.sql.GraftBridge.column(graft.exprs.HilbertCellIdExpr(
      org.apache.spark.sql.GraftBridge.expression(lat.cast("double")),
      org.apache.spark.sql.GraftBridge.expression(lon.cast("double")), level))

  /** S2-style spherical cell at `level` — [[S2Cell.encode]] as a codegen'd
    * kernel (cube-face selection + gnomonic uv + quadratic st + per-face
    * Hilbert). [[cellParent]] applies unchanged (face bits ride above the
    * position); the DuckDB oracle re-derives the full chain in SQL
    * (`spatial_s2_cell` / `spatial_s2_tile`). */
  def s2CellId(lat: Column, lon: Column, level: Int): Column =
    org.apache.spark.sql.GraftBridge.column(graft.exprs.S2CellIdExpr(
      org.apache.spark.sql.GraftBridge.expression(lat.cast("double")),
      org.apache.spark.sql.GraftBridge.expression(lon.cast("double")), level))

  /** Multi-level tile-density pyramid in ONE pass — the rollup a tiling
    * engine builds before serving (zoom z densities for z ∈ [minLevel,
    * maxLevel]). Each point explodes to its cell at every level, then one
    * hash aggregation: equivalent to `maxLevel − minLevel + 1` separate
    * [[cellDensity]] jobs but reads and shuffles the input ONCE, and
    * map-side partial aggregation collapses the per-level duplication
    * before the exchange (cells per partition, not rows × levels). The
    * level rides in the cell value's low 5 bits, so one output column
    * serves every zoom. */
  def tilePyramid(points: DataFrame, minLevel: Int, maxLevel: Int): DataFrame = {
    require(0 <= minLevel && minLevel <= maxLevel && maxLevel <= ZCell.MaxLevel)
    val cells = array((minLevel to maxLevel)
      .map(l => cellId(col("lat"), col("lon"), l)): _*)
    points.select(explode(cells).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n"))
  }

  /** Radius (spherical-cap) join on the S2 grid: every (query, point) pair
    * within `radiusMeters` great-circle distance. Queries
    * (`query_id`, `lat`, `lon`) are driver-collected (broadcast-small, the
    * [[polygonJoin]] contract); each cap covers via
    * [[S2Cell.coverCap]] (provable superset, conservative
    * circumradius descent). Covers keep their OWN achieved level (round 6 —
    * normalizing to the batch's coarsest level let one polar/large-radius
    * query degrade join-key selectivity for every other query): points are
    * encoded once at the finest present level, parent-shifted to each
    * present level, and the broadcast (query_id, level, cell) list
    * equi-joins on (level, cell); exact haversine refines. No cross
    * product at any scale: candidate volume is each query's cover cells ×
    * cell occupancy, not |queries| × |points|. */
  def s2RadiusJoin(points: DataFrame, queries: DataFrame, radiusMeters: Double,
                   level: Int = 10, maxCellsPerQuery: Int = 256): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val qs = queries.select(col("query_id").cast("long"),
        col("lat").cast("double"), col("lon").cast("double")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val covers = qs.map { case (id, la, lo) =>
      (id, S2Cell.coverCap(la, lo, radiusMeters, level, maxCellsPerQuery))
    }
    // PER-LEVEL join keys (round 6): covers keep their own achieved level
    // instead of all normalizing to the globally coarsest one — one
    // polar/large-radius query no longer degrades join-key selectivity for
    // the whole batch. Each point explodes to its ancestor cell at every
    // level PRESENT in the batch (usually 1-2), and the broadcast cover
    // list joins on (level, cell); candidate volume is each query's own
    // cover × occupancy. Exact haversine refine is unchanged, so results
    // are identical.
    if (qs.isEmpty) // empty query set ⇒ empty result with the right schema
      return points.withColumn("query_id", lit(0L)).limit(0)
    val levels = covers.map(_._2._2).distinct.sorted
    val coverDF = covers.toSeq.flatMap { case (id, (cells, l)) =>
      cells.map(c => (id, l, c)).distinct
    }.toDF("query_id", "qlevel", "pcell")
    val qll = qs.toSeq.toDF("query_id", "q_lat", "q_lon")
    val fineL = levels.max
    // encode each point ONCE at the finest present level; coarser present
    // levels are a shift (S2Cell.parent's bit layout matches cellParent's)
    val fineCell = s2CellId(col("lat"), col("lon"), fineL)
    val pLevelCells = array(levels.map(l =>
      struct(lit(l).as("qlevel"), cellParent(fineCell, fineL, l).as("pcell"))): _*)
    points.withColumn("__lc", explode(pLevelCells))
      .withColumn("qlevel", col("__lc").getField("qlevel"))
      .withColumn("pcell", col("__lc").getField("pcell"))
      .drop("__lc")
      .join(broadcast(coverDF), Seq("qlevel", "pcell"))
      .join(broadcast(qll), "query_id")
      .filter(haversineMeters(col("lat"), col("lon"),
        col("q_lat"), col("q_lon")) <= radiusMeters)
      .drop("pcell", "qlevel", "q_lat", "q_lon")
  }

  /** Great-circle distance in meters (haversine), pure Column math. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = 6371008.8
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * r) * asin(sqrt(a))
  }

  // --- point-in-polygon --------------------------------------------------------

  /** Even-odd ray cast over all rings (outer + holes). Driver-side scalar —
    * kept as the independent brute-force ORACLE the distributed join is
    * tested against (SpatialSpec); the executor hot path is [[pipFlat]]. */
  def pipScala(lat: Double, lon: Double, rings: Seq[Seq[(Double, Double)]]): Boolean = {
    var inside = false
    rings.foreach { ring =>
      var j = ring.length - 1
      var i = 0
      while (i < ring.length) {
        val (yi, xi) = ring(i)
        val (yj, xj) = ring(j)
        if ((yi > lat) != (yj > lat) &&
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
        j = i; i += 1
      }
    }
    inside
  }

  /** struct rings (array<array<struct<lat,lon>>>) → [lat, lon] double arrays
    * for the UDF boundary. */
  private def ringsAsArrays(rings: Column): Column =
    transform(rings, ring => transform(ring,
      p => array(p.getField("lat"), p.getField("lon"))))

  /** Ray cast over flattened rings (ring = [lat0,lon0,lat1,lon1,…]):
    * allocation-free hot loop for the candidate-refine path. */
  def pipFlat(lat: Double, lon: Double, rings: Array[Array[Double]]): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var j = n - 1
      var i = 0
      while (i < n) {
        val yi = ring(2 * i); val xi = ring(2 * i + 1)
        val yj = ring(2 * j); val xj = ring(2 * j + 1)
        if ((yi > lat) != (yj > lat) &&
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
        j = i; i += 1
      }
      r += 1
    }
    inside
  }

  /** Spatial join: points (lat, lon, …) × polygons (polygon_id, rings) →
    * matched pairs (point columns + polygon_id). Cell-cover equi-join
    * prejoin (broadcast polygon side) + exact PIP refine. Each point lands
    * in exactly one cell, so no dedup is needed. `level` trades candidate
    * count vs cover size (~12 for city-block polygons).
    *
    * The polygon side is BROADCAST-SMALL by contract (BASELINE.json), so its
    * rings are parsed ONCE on the driver into primitive double arrays and
    * captured by the refine UDF's closure; the broadcast join ships only
    * (cell, polygon_id). The previous shape carried the rings column through
    * the join and re-materialized nested Seq[Seq[Seq[Double]]] per CANDIDATE
    * ROW — at 24M points that allocation rate saturated memory bandwidth and
    * capped executor scaling at ~1.4× for 4× cores. */
  def polygonJoin(points: DataFrame, polygons: DataFrame, level: Int = 14): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val parsed: Array[(Long, Array[Array[Double]])] = polygons
      .select(col("polygon_id").cast("long"), ringsAsArrays(col("rings")))
      .collect()
      .map { row =>
        val rings = row.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](1)
          .map { ring =>
            val flat = new Array[Double](ring.length * 2)
            var i = 0
            ring.foreach { p => flat(2 * i) = p(0); flat(2 * i + 1) = p(1); i += 1 }
            flat
          }.toArray
        row.getLong(0) -> rings
      }
    val polyMap: Map[Long, Array[Array[Double]]] = parsed.toMap
    val polyCells = parsed.toSeq.flatMap { case (pid, rings) =>
      val outer = rings.head
      val lats = outer.indices.collect { case i if i % 2 == 0 => outer(i) }
      val lons = outer.indices.collect { case i if i % 2 == 1 => outer(i) }
      ZCell.coverBBox(lats.min, lats.max, lons.min, lons.max, level)
        .map(c => (c, pid))
    }.toDF("cell", "polygon_id")
    val pipFast = udf { (lat: Double, lon: Double, pid: Long) =>
      pipFlat(lat, lon, polyMap(pid))
    }
    points.withColumn("cell", cellId(col("lat"), col("lon"), level))
      .join(broadcast(polyCells), Seq("cell"))
      .filter(pipFast(col("lat"), col("lon"), col("polygon_id")))
      .drop("cell")
  }

  // --- kNN ------------------------------------------------------------------------

  private def ringCellsUdf(level: Int, maxRing: Int) = udf { (lat: Double, lon: Double) =>
    val c = ZCell.encode(lat, lon, level)
    (0 to maxRing).flatMap(d => ZCell.ring(c, d))
  }

  /** Edges of the region covered by rings 0..maxRing around the point's
    * cell, as (latTop, latBot, lonLeft, lonRight); null = that side reaches
    * a pole / wraps fully, so no uncovered region lies beyond it. Lon edges
    * are returned UNWRAPPED (may exceed ±180): trig metrics are periodic,
    * and planar metrics measure unwrapped offsets — both stay correct. */
  private def coverEdgesUdf(level: Int, maxRing: Int) = udf { (lat: Double, lon: Double) =>
    val c = ZCell.encode(lat, lon, level)
    val n = 1 << level
    val cx = ZCell.x(c); val cy = ZCell.y(c)
    val latTop = if (cy - maxRing <= 0) None
      else Some(90.0 - (cy - maxRing).toDouble / n * 180.0)
    val latBot = if (cy + maxRing >= n - 1) None
      else Some(90.0 - (cy + maxRing + 1).toDouble / n * 180.0)
    val fullWrap = 2 * maxRing + 1 >= n
    val lonLeft = if (fullWrap) None
      else Some((cx - maxRing).toDouble / n * 360.0 - 180.0)
    val lonRight = if (fullWrap) None
      else Some((cx + maxRing + 1).toDouble / n * 360.0 - 180.0)
    (latTop, latBot, lonLeft, lonRight)
  }

  /** Distance model for kNN: point-to-point distance PLUS true lower bounds
    * on the distance to a parallel (lat edge) and a meridian (lon edge) —
    * the boundary bounds must never over-estimate or the exactness guarantee
    * breaks (e.g. the closest point on a meridian lies poleward of the
    * query, so a same-latitude projection is an over-estimate on the
    * sphere). */
  sealed trait SpatialMetric {
    def dist(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column
    /** ≤ true min distance from (qlat,qlon) to the parallel latEdge. */
    def toParallel(qlat: Column, qlon: Column, latEdge: Column): Column
    /** ≤ true min distance from (qlat,qlon) to the meridian lonEdge. */
    def toMeridian(qlat: Column, qlon: Column, lonEdge: Column): Column
  }

  /** Great-circle meters. Meridian bound: d = R·asin(cosφ·sin Δλ) (the
    * cross-track distance to the meridian's great circle — exact for
    * Δλ ≤ 90°, an under-estimate beyond, which is safe). */
  case object HaversineMetric extends SpatialMetric {
    private val R = 6371008.8
    def dist(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
      haversineMeters(lat1, lon1, lat2, lon2)
    def toParallel(qlat: Column, qlon: Column, latEdge: Column): Column =
      haversineMeters(qlat, qlon, latEdge, qlon) // same-lon projection is exact
    def toMeridian(qlat: Column, qlon: Column, lonEdge: Column): Column =
      lit(R) * asin(cos(radians(qlat)) * abs(sin(radians(lonEdge - qlon))))
  }

  /** Squared planar degrees (for deterministic cross-engine oracles on a
    * flat model; wrap-ignorant by definition). Edge projections are exact. */
  case object PlanarDegrees2Metric extends SpatialMetric {
    def dist(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
      (lat2 - lat1) * (lat2 - lat1) + (lon2 - lon1) * (lon2 - lon1)
    def toParallel(qlat: Column, qlon: Column, latEdge: Column): Column =
      (latEdge - qlat) * (latEdge - qlat)
    def toMeridian(qlat: Column, qlon: Column, lonEdge: Column): Column =
      (lonEdge - qlon) * (lonEdge - qlon)
  }

  /** Candidate rows the first knn ring pass scans (diagnostics — shares the
    * cover construction with [[knn]]). */
  def knnCandidateCount(points: DataFrame, queries: DataFrame,
                        level: Int, maxRing: Int): Long = {
    val pCells = points.withColumn("cell", cellId(col("lat"), col("lon"), level))
    val qs = queries.select(col("query_id"), col("lat").as("qlat"), col("lon").as("qlon"))
    val qCells = qs.withColumn("cell",
      explode(ringCellsUdf(level, maxRing)(col("qlat"), col("qlon"))))
    pCells.join(broadcast(qCells), Seq("cell")).count()
  }

  /** Diagnostics: how many queries the given ring cannot certify (mirrors
    * one [[knn]] attempt's certification decision). */
  def knnUnsatAfterRing(points: DataFrame, queries: DataFrame, k: Int,
                        level: Int, ring: Int,
                        metric: SpatialMetric = HaversineMetric,
                        tieBreak: String = "doc_id"): Long = {
    val pCells = points.withColumn("cell", cellId(col("lat"), col("lon"), level))
    val qs = queries.select(col("query_id"), col("lat").as("qlat"), col("lon").as("qlon"))
    val qCells = qs.withColumn("cell",
      explode(ringCellsUdf(level, ring)(col("qlat"), col("qlon"))))
    val candidates = pCells.join(broadcast(qCells), Seq("cell")).drop("cell")
      .withColumn("dist_m", metric.dist(col("qlat"), col("qlon"), col("lat"), col("lon")))
    val wLocal = Window
      .partitionBy(col("query_id"), pmod(hash(col(tieBreak)), lit(64)))
      .orderBy(col("dist_m"), col(tieBreak))
    val wGlobal = Window.partitionBy(col("query_id"))
      .orderBy(col("dist_m"), col(tieBreak))
    val topk = candidates.withColumn("rn", row_number().over(wLocal))
      .filter(col("rn") <= k).drop("rn")
      .withColumn("rn", row_number().over(wGlobal)).filter(col("rn") <= k)
    val edges = coverEdgesUdf(level, ring)(col("qlat"), col("qlon"))
    val dBound = least(
      metric.toParallel(col("qlat"), col("qlon"), col("edges").getField("_1")),
      metric.toParallel(col("qlat"), col("qlon"), col("edges").getField("_2")),
      metric.toMeridian(col("qlat"), col("qlon"), col("edges").getField("_3")),
      metric.toMeridian(col("qlat"), col("qlon"), col("edges").getField("_4")))
    val stats = topk.groupBy("query_id")
      .agg(count(lit(1)).as("cnt"), max(col("dist_m")).as("kth"))
    qs.withColumn("edges", edges)
      .join(stats, Seq("query_id"), "left")
      .filter(col("cnt").isNull || col("cnt") < k ||
        (dBound.isNotNull && col("kth") > dBound))
      .count()
  }

  /** k nearest points for each query row (query_id, lat, lon): ring-expanded
    * candidate cells (broadcast query side) + exact re-rank with a per-query
    * window top-k. EXACTNESS GUARANTEE: a query's ring result is kept only
    * when its kth candidate distance is ≤ a LOWER BOUND on the distance to
    * the uncovered region's boundary (≥ k candidates alone does NOT imply
    * the true k nearest are inside the rings). Queries the first pass cannot
    * certify retry with the ring radius doubled, up to `widenSteps` times —
    * each retry is another cell-join over a SHRINKING query set, so a skewed
    * query batch never forces a full-corpus cross join just because a few
    * queries sit in sparse regions; only queries still uncertified after the
    * widening ladder fall back to the exact scan. The per-step unsatisfied
    * set is localCheckpoint'ed (small — the query side is broadcast-sized by
    * contract) so step lineages don't compound; driver-side probing stays an
    * emptiness check per step. */
  def knn(points: DataFrame, queries: DataFrame, k: Int,
          level: Int = 10, maxRing: Int = 2,
          metric: SpatialMetric = HaversineMetric,
          tieBreak: String = "doc_id", widenSteps: Int = 2,
          rankSalts: Int = 64): DataFrame = {
    val pCells = points.withColumn("cell", cellId(col("lat"), col("lon"), level))
    val dist = metric.dist(col("qlat"), col("qlon"), col("lat"), col("lon"))

    // Exact top-k per query in two phases (the Similarity.topKPerQuery
    // shape): a salted local rank bounds every sort to its salt group, then
    // the global rank orders ≤ rankSalts·k survivors per query. EXACT: a
    // row in the true global top-k has < k rows above it in its own salt
    // group, so it survives phase 1; both phases share the
    // (dist_m, tieBreak) order. The single-window form (rankSalts = 1) —
    // partitionBy(query_id) alone — fully sorts each query's candidate set
    // in ONE task: that is the parallelism cap that cost brute top-k 0.36
    // efficiency at scale, and the brute fallback below scans the whole
    // corpus per query, where it matters most (ScalingBench ops `knn` row:
    // 0.94 efficiency at 1×2→4×2 with the two-phase rank).
    def rankTopK(scored: DataFrame): DataFrame = {
      val wGlobal = Window.partitionBy(col("query_id"))
        .orderBy(col("dist_m"), col(tieBreak))
      val local =
        if (rankSalts <= 1) scored
        else {
          val wLocal = Window
            .partitionBy(col("query_id"), pmod(hash(col(tieBreak)), lit(rankSalts)))
            .orderBy(col("dist_m"), col(tieBreak))
          scored.withColumn("rn", row_number().over(wLocal))
            .filter(col("rn") <= k).drop("rn")
        }
      local.withColumn("rn", row_number().over(wGlobal))
        .filter(col("rn") <= k).drop("rn")
    }

    /** One ring pass: (certified top-k, uncertified queries). The ranked
      * top-k is localCheckpoint'ed (≤ queries·k rows): both its consumers —
      * the certification stats below and the output union — would otherwise
      * re-execute the whole candidate join + rank. */
    def attempt(qs: DataFrame, ring: Int): (DataFrame, DataFrame) = {
      val qCells = qs.withColumn("cell",
        explode(ringCellsUdf(level, ring)(col("qlat"), col("qlon"))))
      val candidates = pCells.join(broadcast(qCells), Seq("cell")).drop("cell")
        .withColumn("dist_m", dist)
      val topk = rankTopK(candidates).localCheckpoint()

      // per-query decision: lower-bound distance to each uncovered-side edge
      val edges = coverEdgesUdf(level, ring)(col("qlat"), col("qlon"))
      val dBound = least(
        metric.toParallel(col("qlat"), col("qlon"), col("edges").getField("_1")),
        metric.toParallel(col("qlat"), col("qlon"), col("edges").getField("_2")),
        metric.toMeridian(col("qlat"), col("qlon"), col("edges").getField("_3")),
        metric.toMeridian(col("qlat"), col("qlon"), col("edges").getField("_4")))
      val stats = topk.groupBy("query_id")
        .agg(count(lit(1)).as("cnt"), max(col("dist_m")).as("kth"))
      val unsat = qs.withColumn("edges", edges)
        .join(stats, Seq("query_id"), "left")
        .filter(col("cnt").isNull || col("cnt") < k ||
          (dBound.isNotNull && col("kth") > dBound))
        .select("query_id", "qlat", "qlon")
      (topk, unsat)
    }

    var remaining = queries.select(
      col("query_id"), col("lat").as("qlat"), col("lon").as("qlon"))
    // (A ring-0 pre-pass to certify dense queries cheaply was measured and
    // rejected: it certified 27/99 bench queries but added a full pass for
    // the rest — 4.2 s vs 3.1 s against the ×4 ladder alone.)
    var ring = maxRing
    val pieces = Seq.newBuilder[DataFrame]
    var step = 0
    var allSatisfied = false
    while (step <= widenSteps && !allSatisfied) {
      val (topk, unsatRaw) = attempt(remaining, ring)
      val unsat = unsatRaw.localCheckpoint() // small; truncates step lineage
      if (unsat.isEmpty) {
        pieces += topk
        allSatisfied = true
      } else {
        pieces += topk.join(broadcast(unsat.select("query_id")),
          Seq("query_id"), "left_anti")
        remaining = unsat
        // ×4 widening (round 6): a query the certification rejected at ring
        // r usually sits in a region an order of magnitude sparser than the
        // certified ones — ×2 widening re-ran the full join+rank ladder for
        // a slowly-shrinking straggler set (measured 43 → 22 → 0 unsat over
        // three passes at the bench shape; ×4 reaches the same coverage in
        // two). Each pass is a full candidate join, so fewer, wider passes
        // win; the exact brute fallback still bounds the worst case.
        ring = math.max(ring * 4, ring + 1)
        step += 1
      }
    }
    if (!allSatisfied) {
      val brute = rankTopK(points.crossJoin(broadcast(remaining))
        .withColumn("dist_m", dist))
      pieces += brute
    }
    pieces.result().reduce(_ unionByName _)
  }

  // --- raster ↔ vector ---------------------------------------------------------------

  /** Joins vector points to raster tiles keyed by coarse cell: the point's
    * fine cell is shifted to the tile level (prefix equality — no geometry
    * test needed because cells nest exactly). */
  def tileJoin(points: DataFrame, tiles: DataFrame,
               pointLevel: Int = 16, tileLevel: Int = 12): DataFrame = {
    val p = points.withColumn("tile_cell",
      cellParent(cellId(col("lat"), col("lon"), pointLevel), pointLevel, tileLevel))
    p.join(tiles.withColumnRenamed("cell", "tile_cell"), Seq("tile_cell"))
  }

  /** Salted repartition for dense urban cells: spreads each hot cell over
    * `salt` partitions keyed by a row-stable hash, for two-phase per-cell
    * aggregation (partial agg per (cell, salt), final agg per cell). */
  def saltedByCell(df: DataFrame, cellCol: Column, saltBuckets: Int,
                   rowKey: Column): DataFrame =
    df.repartition(cellCol, pmod(hash(rowKey), lit(saltBuckets)))

  /** Per-cell density. One hash aggregation: Spark's built-in PARTIAL
    * (map-side) aggregation is already the two-phase skew defense for an
    * algebraic aggregate like count — each task emits one row per distinct
    * cell it saw, so a hotspot cell contributes at most `numPartitions`
    * rows to the exchange regardless of its point count. The explicit
    * (cell, salt) pre-aggregation this replaces added a full second
    * exchange for a property the partial already guarantees (guide §2.3
    * "aggregate before you shuffle"; round-6 measurement in
    * OPTIMIZATION_r06.md). Manual salting ([[saltedByCell]]) remains the
    * tool for NON-algebraic per-cell work (collect_list-style state),
    * where map-side combining cannot cap the hot key. `saltBuckets` is
    * kept for source compatibility and ignored. */
  def cellDensity(points: DataFrame, level: Int, saltBuckets: Int = 16): DataFrame =
    points
      .withColumn("cell", cellId(col("lat"), col("lon"), level))
      .groupBy("cell").agg(count(lit(1)).as("n"))
}
