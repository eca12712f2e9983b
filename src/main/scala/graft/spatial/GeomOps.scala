package graft.spatial

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Way-geometry materialization and distance joins — the geometry layer the
  * reference's data model implies but never materializes (SURVEY.md §2.6).
  *
  * The reference keeps way geometry POSITIONAL: a way row carries ordered
  * node refs (`way.nodes()`, reference include/object_filter.hpp:1243-1252)
  * and closedness is ref equality (`hpp:952-955`); actual coordinates live
  * on the node rows. libosmium resolves them with its single-node
  * `add_locations_to_ways` handler; at 100 TB that resolution is a
  * distributed equi-join, which is what [[addLocations]] is:
  *
  *   refs  = ways × posexplode(nds)            (one row per (way, pos, ref))
  *   join  = refs ⋈ nodes on ref               (shuffle equi-join, AQE skew-split:
  *                                              heavily shared junction nodes are
  *                                              the natural skew key)
  *   ways' = groupBy(way).agg(sort_array(collect_list(struct(pos, …))))
  *                                             (partial-agg reassembly; the sort
  *                                              is per-way over ≤ a few thousand
  *                                              points, never a global order)
  *
  * Nothing here collects to the driver and no stage is quadratic: the join
  * ships (ref, way_id, pos) + (ref, lat, lon) rows only, and reassembly is
  * one hash aggregation keyed by way id.
  *
  * Derived measures ([[wayMetrics]]) are EXACT-INTEGER on 1e7-scaled
  * coordinates (the fixture's native resolution — OSM itself stores lat/lon
  * as 1e7-scaled ints) so the DuckDB gate compares BIGINTs, not
  * trig-library floats: bbox, Manhattan path length, and the shoelace
  * cross-product sum for closed rings (1e5 scale keeps every term below
  * 2^63). [[wayLengthMeters]] is the production haversine length —
  * float-valued, spec-tested against a driver-side reference instead of
  * hash-gated.
  */
object GeomOps {

  /** Resolve each way's ordered node refs against node coordinates.
    *
    * Input: an OsmView-shaped frame (`type`, `id`, `nds`, `lat`, `lon`).
    * Output: one row per way — (way_id, pts, n_refs, n_resolved) where
    * `pts` is array<struct<pos,ref,lat,lon>> in nds order (lat/lon null for
    * refs with no matching node, mirroring libosmium's undefined location).
    */
  def addLocations(view: DataFrame): DataFrame = {
    val nodes = view
      .filter(col("type") === "node" && col("lat").isNotNull)
      .select(col("id").as("ref"), col("lat").as("n_lat"), col("lon").as("n_lon"))
    val refs = view
      .filter(col("type") === "way")
      .select(col("id").as("way_id"), posexplode_outer(col("nds")))
      .withColumnRenamed("col", "ref")
    refs
      .join(nodes, Seq("ref"), "left")
      .groupBy("way_id")
      .agg(
        // when() keeps zero-nds ways as empty arrays: collect_list drops
        // nulls, and posexplode_outer emitted (null, null) for them
        sort_array(collect_list(when(col("pos").isNotNull,
          struct(col("pos"), col("ref"),
            col("n_lat").as("lat"), col("n_lon").as("lon"))))).as("pts"),
        count(col("ref")).as("n_refs"),
        count(col("n_lat")).as("n_resolved"))
  }

  /** Exact-integer geometry measures over [[addLocations]] output. Unresolved
    * refs are skipped (measures run over the resolved subsequence, in order):
    *  - bbox min/max lat/lon in 1e7-scaled units (null when nothing resolved)
    *  - `path_e7`: Σ |Δlat| + |Δlon| over consecutive resolved points (0 when
    *    fewer than 2)
    *  - `area2_e5`: |shoelace cross-product sum| in 1e5-scaled units, twice
    *    the enclosed area, for geometrically closed rings (≥ 4 resolved
    *    points, first == last); null otherwise
    */
  def wayMetrics(geoms: DataFrame): DataFrame = {
    val resolved = filter(col("pts"), p => p.getField("lat").isNotNull)
    val latE7 = transform(resolved, p => round(p.getField("lat") * 1e7).cast("long"))
    val lonE7 = transform(resolved, p => round(p.getField("lon") * 1e7).cast("long"))
    val base = geoms.withColumn("la", latE7).withColumn("lo", lonE7)
    val n = size(col("la"))
    val pathE7 = when(n >= 2,
      aggregate(sequence(lit(1), n - 1), lit(0L), (acc, i) =>
        acc + abs(get(col("la"), i) - get(col("la"), i - 1))
            + abs(get(col("lo"), i) - get(col("lo"), i - 1))))
      .otherwise(lit(0L))
    // E7 → E5 is exact: fixture coordinates are multiples of 1e5 in E7 units
    // (and real OSM at E5 loses only sub-meter precision in the AREA term,
    // whose fixed-point scale is a knob, not a semantic)
    val laE5 = transform(col("la"), v => (v / 100L).cast("long"))
    val loE5 = transform(col("lo"), v => (v / 100L).cast("long"))
    val isClosed = n >= 4 &&
      get(col("la"), lit(0)) === get(col("la"), n - 1) &&
      get(col("lo"), lit(0)) === get(col("lo"), n - 1)
    val shoelace = aggregate(sequence(lit(0), n - 2), lit(0L), (acc, i) =>
      acc + get(loE5, i) * get(laE5, i + 1) - get(loE5, i + 1) * get(laE5, i))
    base.select(
      col("way_id"), col("n_refs"), col("n_resolved"), col("pts"),
      array_min(col("la")).as("min_lat_e7"),
      array_max(col("la")).as("max_lat_e7"),
      array_min(col("lo")).as("min_lon_e7"),
      array_max(col("lo")).as("max_lon_e7"),
      pathE7.as("path_e7"),
      when(isClosed, abs(shoelace)).otherwise(lit(null).cast("long")).as("area2_e5"))
  }

  /** Production path length: haversine meters summed over consecutive
    * resolved points. Float-valued — verified by GeomOpsSpec against a
    * driver-side reference, not hash-gated. */
  def wayLengthMeters(geoms: DataFrame): DataFrame = {
    val resolved = filter(col("pts"), p => p.getField("lat").isNotNull)
    val base = geoms.withColumn("rp", resolved)
    val n = size(col("rp"))
    val len = when(n >= 2,
      aggregate(sequence(lit(1), n - 1), lit(0.0), (acc, i) =>
        acc + SpatialOps.haversineMeters(
          get(col("rp"), i - 1).getField("lat"), get(col("rp"), i - 1).getField("lon"),
          get(col("rp"), i).getField("lat"), get(col("rp"), i).getField("lon"))))
      .otherwise(lit(0.0))
    base.select(col("way_id"), col("n_resolved"), len.as("length_m"))
  }

  // --- relation geometry -------------------------------------------------------

  /** Relation-level geometry aggregation — the third level of the OSM
    * hierarchy (nodes → ways → relations): resolve each relation's
    * way-type members against [[wayMetrics]] output and aggregate
    * exact-integer measures. One row per relation:
    *  - `n_members` / `n_way_members`: member counts (all / mtype=way)
    *  - `n_ways_resolved`: way members whose geometry row exists
    *  - `sum_path_e7`: Σ path_e7 over resolved member ways (duplicate
    *    members count once per membership, like osmium's member iteration)
    *  - bbox union (min/max of the member ways' bboxes; null when no
    *    resolved member way has any resolved point)
    *
    * Scale shape: members explode to (rel_id, pos, ref) rows; the join
    * against way geometries is an equi-join on the way id (metrics side
    * carries a handful of BIGINTs, never the pts arrays); reassembly is one
    * hash aggregation per relation. Popular member ways (a coastline
    * segment in thousands of relations) are the natural skew key → AQE. */
  def relationGeoms(view: DataFrame, ways: DataFrame): DataFrame = {
    val m = view.filter(col("type") === "relation")
      .select(col("id").as("rel_id"), posexplode_outer(col("members")))
      .select(col("rel_id"), col("pos"),
        col("col").getField("mtype").as("mtype"),
        col("col").getField("ref").as("mref"))
    val w = ways.select(col("way_id").as("mref"), lit(1).as("w_ok"),
      col("path_e7").as("w_path"),
      col("min_lat_e7").as("w_min_lat"), col("max_lat_e7").as("w_max_lat"),
      col("min_lon_e7").as("w_min_lon"), col("max_lon_e7").as("w_max_lon"))
    m.join(w, m("mtype") === "way" && m("mref") === w("mref"), "left")
      .groupBy("rel_id")
      .agg(
        count(col("pos")).as("n_members"),
        count(when(col("mtype") === "way", 1)).as("n_way_members"),
        count(col("w_ok")).as("n_ways_resolved"),
        coalesce(sum(col("w_path")), lit(0L)).as("sum_path_e7"),
        min(col("w_min_lat")).as("min_lat_e7"),
        max(col("w_max_lat")).as("max_lat_e7"),
        min(col("w_min_lon")).as("min_lon_e7"),
        max(col("w_max_lon")).as("max_lon_e7"))
  }

  /** Stitch open way segments into closed rings (the multipolygon-assembly
    * core, osmium's area::Assembler analog): repeatedly append the segment
    * (forward or reversed) whose endpoint matches the current ring's open
    * end, closing when head meets tail. Deterministic: segments are
    * consumed in input order, ties broken by the lowest-index candidate.
    * Returns (closed rings, number of unclosable CHAINS — a run of joined
    * segments that never closed counts once). Pure driver/executor-side
    * Scala over ONE relation's members — bounded per group, never a
    * distributed step. */
  def stitchRings(segments: Seq[Seq[(Double, Double)]])
      : (Seq[Seq[(Double, Double)]], Int) = {
    val segs = segments.filter(_.length >= 2).map(_.toVector).toBuffer
    val rings = Seq.newBuilder[Seq[(Double, Double)]]
    var leftovers = 0
    while (segs.nonEmpty) {
      var ring = segs.remove(0)
      var open = true
      var progress = true
      while (open && progress) {
        if (ring.head == ring.last && ring.length >= 4) {
          rings += ring; open = false
        } else {
          val end = ring.last
          val i = segs.indexWhere(s => s.head == end || s.last == end)
          if (i >= 0) {
            val s = segs.remove(i)
            ring = ring ++ (if (s.head == end) s.tail else s.reverse.tail)
          } else {
            // tail is a dead end — try growing at the HEAD (a chain whose
            // continuation attaches before the seed segment)
            val start = ring.head
            val j = segs.indexWhere(s => s.head == start || s.last == start)
            if (j < 0) progress = false
            else {
              val s = segs.remove(j)
              ring = (if (s.last == start) s.init else s.reverse.init) ++ ring
            }
          }
        }
      }
      if (open) leftovers += 1 // unclosable chain: count it, drop it
    }
    (rings.result(), leftovers)
  }

  /** Multipolygon assembly over [[addLocations]] output: per relation,
    * collect the member ways' resolved point sequences (ways with ANY
    * unresolved ref are excluded — a gap makes the ring geometry
    * undefined), stitch them into closed rings with [[stitchRings]], and
    * report ring count, leftover count, and the exact-integer Σ|shoelace|
    * over closed rings (E5 units, same fixed-point scheme as
    * [[wayMetrics]]). The stitcher runs inside a UDF on one relation's
    * collected members — the only per-group state, bounded by relation
    * size, never a shuffle of the whole table. */
  def assembleMultipolygons(view: DataFrame, geoms: DataFrame): DataFrame = {
    val m = view.filter(col("type") === "relation")
      .select(col("id").as("rel_id"), posexplode(col("members")))
      .filter(col("col").getField("mtype") === "way")
      .select(col("rel_id"), col("pos"), col("col").getField("ref").as("mref"))
    val fullyResolved = geoms
      .filter(col("n_refs") === col("n_resolved") && col("n_refs") >= 2)
      .select(col("way_id").as("mref"),
        transform(col("pts"), p =>
          array(round(p.getField("lat") * 1e7).cast("long"),
            round(p.getField("lon") * 1e7).cast("long"))).as("seg"))
    val collected = m.join(fullyResolved, Seq("mref"))
      .groupBy("rel_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("seg")))).as("segs"))
    val stitch = udf { (segs: Seq[Row]) =>
      val seqs = segs.map(_.getSeq[scala.collection.Seq[Long]](1)
        .map(p => (p(0).toDouble, p(1).toDouble)).toSeq)
      val (rings, leftover) = stitchRings(seqs)
      val area2E5 = rings.map { ring =>
        val xs = ring.map(p => math.round(p._2) / 100)
        val ys = ring.map(p => math.round(p._1) / 100)
        math.abs((0 until xs.size - 1).map(i =>
          xs(i) * ys(i + 1) - xs(i + 1) * ys(i)).sum)
      }.sum
      (rings.size, leftover, area2E5)
    }
    collected
      .withColumn("mp", stitch(col("segs")))
      .select(col("rel_id"),
        col("mp._1").as("n_rings"), col("mp._2").as("n_leftover"),
        col("mp._3").as("rings_area2_e5"))
  }

  // --- distance join ---------------------------------------------------------

  private def wrap180(x: Double): Double = {
    val w = ((x + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    w
  }

  /** Cells at `level` intersecting the bounding box of the radius-`rLatDeg`
    * disc around (lat, lon). `lonHalfWidthDeg` is the disc's half-extent in
    * longitude (≥ rLatDeg near the equator, growing with |lat| on the
    * sphere); callers pass an OVER-estimate, preserving the superset
    * guarantee. Distinct by [[ZCell.coverBBox]] construction. */
  private[graft] def discCover(lat: Double, lon: Double, rLatDeg: Double,
                               lonHalfWidthDeg: Double, level: Int): Seq[Long] = {
    val latMin = math.max(-90.0, lat - rLatDeg)
    val latMax = math.min(90.0, lat + rLatDeg)
    if (lonHalfWidthDeg >= 180.0)
      ZCell.coverBBox(latMin, latMax, -180.0, 180.0, level)
    else {
      val lo = wrap180(lon - lonHalfWidthDeg)
      val hi = wrap180(lon + lonHalfWidthDeg)
      // lo > hi after wrapping ⇒ coverBBox's antimeridian form
      ZCell.coverBBox(latMin, latMax, lo, hi, level)
    }
  }

  private val MetersPerLatDeg = math.Pi * 6371008.8 / 180.0 // ≈ 111194.93

  /** All point pairs within `radius` of each other: neighbor-cell cover
    * prejoin + exact refine — never a cross product.
    *
    * Probe side keys each point by its own cell; build side explodes each
    * point to every cell intersecting its radius-disc bounding box
    * ([[discCover]] — a provable superset, so if dist(a,b) ≤ r then a's
    * cell is in b's cover). Equi-join on cell + `key_a < key_b` emits each
    * qualifying pair EXACTLY once (a point's home cell is unique and the
    * cover is distinct). The exploded side ships (cell, key, lat, lon)
    * only; `level` trades explode factor (cover size ≈ (2·r/cell+1)²)
    * against candidate density — pick cell edge ≈ radius. Dense hotspot
    * cells are the natural skew key → AQE skew-join splits them; output
    * size is the answer's own pair count (quadratic only inside a radius
    * disc, which is the query's semantics, not a plan artifact).
    *
    * Planar-degrees form: radius and coordinates in degrees on the flat
    * model (wrap-ignorant refine — matches [[SpatialOps.PlanarDegrees2Metric]],
    * deterministic for cross-engine oracles). */
  def withinDistanceDeg(points: DataFrame, radiusDeg: Double, level: Int,
                        key: String = "id"): DataFrame = {
    val d2 = (col("lat_b") - col("lat_a")) * (col("lat_b") - col("lat_a")) +
      (col("lon_b") - col("lon_a")) * (col("lon_b") - col("lon_a"))
    withinDistance(points, level, key, radiusDeg, radiusDeg,
      d2 <= lit(radiusDeg * radiusDeg))
  }

  /** Great-circle form: radius in meters, haversine refine. The cover uses
    * the exact spherical disc bounding box (lon half-width
    * asin(sin r / cos φ)); discs reaching past a pole cover the full
    * longitude range. */
  def withinDistanceMeters(points: DataFrame, radiusMeters: Double, level: Int,
                           key: String = "id"): DataFrame = {
    val rLatDeg = radiusMeters / MetersPerLatDeg
    val dist = SpatialOps.haversineMeters(
      col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b"))
    withinDistance(points, level, key, rLatDeg, Double.NaN,
      dist <= lit(radiusMeters))
  }

  /** Shared candidate machinery. `lonHalfWidthDeg = NaN` selects the
    * spherical per-point widening (cos at the disc's extreme |lat|). */
  private def withinDistance(points: DataFrame, level: Int, key: String,
                             rLatDeg: Double, lonHalfWidthDeg: Double,
                             refine: Column): DataFrame = {
    require(level >= 0 && level <= ZCell.MaxLevel)
    val spherical = lonHalfWidthDeg.isNaN
    val coverUdf = udf { (lat: Double, lon: Double) =>
      val hw =
        if (!spherical) lonHalfWidthDeg
        else {
          // Exact spherical bounding box of the disc: it stays inside
          // meridians λ ± asin(sin r / cos φ) (the min distance from the
          // center to that meridian's great circle is R·asin(cosφ·sin hw) —
          // HaversineMetric.toMeridian — which equals r at this hw). Discs
          // reaching past a pole's cos wrap fully.
          val sinR = math.sin(math.toRadians(rLatDeg))
          val cosPhi = math.cos(math.toRadians(lat))
          if (sinR >= cosPhi) 180.0
          else math.toDegrees(math.asin(sinR / cosPhi))
        }
      discCover(lat, lon, rLatDeg, hw, level)
    }
    val a = points.select(col(key).as("key_a"),
      col("lat").as("lat_a"), col("lon").as("lon_a"))
      .withColumn("cell", SpatialOps.cellId(col("lat_a"), col("lon_a"), level))
    val b = points.select(col(key).as("key_b"),
      col("lat").as("lat_b"), col("lon").as("lon_b"))
      .withColumn("cell", explode(coverUdf(col("lat_b"), col("lon_b"))))
    a.join(b, Seq("cell"))
      .filter(col("key_a") < col("key_b"))
      .filter(refine)
      .select(col("key_a"), col("key_b"),
        col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b"))
  }
}
