package graft.spatial

/** Hilbert-positioned cells over the SAME equirectangular grid as [[ZCell]]
  * — identical cell GEOMETRY (level-l cell (x, y) covers the same lat/lon
  * rectangle either way), different cell ADDRESS: the Hilbert curve
  * position replaces the Morton interleave. Value layout mirrors ZCell's,
  * `(hilbertPos << 5) | level`, so level/parent/range machinery carries
  * over unchanged — the Hilbert prefix property (a child's position at a
  * finer level has its parent's position as a 2-bits-per-level prefix,
  * HilbertSpec pins it) is exactly what makes `parent` a shift and a cover
  * cell a contiguous `[d << s, (d+1) << s)` value range of descendants.
  *
  * Purpose: the fine SORT column of a clustered layout
  * ([[SpatialLayout.materialize]] `curve = "hilbert"`). A bbox covers the
  * same cell SET on both curves (geometry is shared), but merging those
  * cells into value ranges fragments differently — Hilbert's
  * edge-adjacency yields fewer, longer runs (measured in
  * tools.CurveProbe), i.e. a smaller pushed Or-of-ranges filter for equal
  * prune precision. Grid/cover arithmetic is DELEGATED to ZCell (decode
  * its cover cells to (x, y), re-address through the curve) so the two
  * encoders cannot drift.
  */
object HCell {
  val MaxLevel: Int = ZCell.MaxLevel

  def encode(lat: Double, lon: Double, level: Int): Long = {
    val z = ZCell.encode(lat, lon, level)
    (HilbertCurve.xy2d(level, ZCell.x(z), ZCell.y(z)) << 5) | level.toLong
  }

  def level(cell: Long): Int = (cell & 0x1fL).toInt
  def pos(cell: Long): Long = cell >>> 5

  def x(cell: Long): Int = HilbertCurve.d2xy(level(cell), pos(cell))._1
  def y(cell: Long): Int = HilbertCurve.d2xy(level(cell), pos(cell))._2

  /** Ancestor at a coarser level — a shift (Hilbert prefix property). */
  def parent(cell: Long, parentLevel: Int): Long = {
    val l = level(cell)
    require(parentLevel >= 0 && parentLevel <= l, s"parent level $parentLevel > $l")
    ((pos(cell) >>> (2 * (l - parentLevel))) << 5) | parentLevel.toLong
  }

  /** Sorted, disjoint `[lo, hi)` ranges of `fine`-level CELL VALUES covering
    * the bbox — the Hilbert analog of [[ZCell.coverRanges]], with the same
    * budget rule (cover taken at the finest level whose CELL COUNT stays ≤
    * `maxCells`, so both curves prune with identical precision and the
    * comparison isolates range fragmentation) and the same superset
    * guarantee: the cover SET comes from [[ZCell.coverBBox]] (shared grid
    * arithmetic, antimeridian wrap included), each cover cell re-addressed
    * to the contiguous value range of its fine-level Hilbert descendants. */
  def coverRanges(latMin: Double, latMax: Double, lonMin: Double,
                  lonMax: Double, fine: Int, maxCells: Int): Seq[(Long, Long)] = {
    require(fine >= 0 && fine <= MaxLevel && maxCells >= 1)
    var l = fine
    while (l > 0 && ZCell.coverCount(latMin, latMax, lonMin, lonMax, l) > maxCells) l -= 1
    val shift = 2 * (fine - l) + 5
    ZCell.mergeRanges(ZCell.coverBBox(latMin, latMax, lonMin, lonMax, l)
      .map { c =>
        val d = HilbertCurve.xy2d(l, ZCell.x(c), ZCell.y(c))
        ((d << shift) | fine.toLong, ((d + 1L) << shift) | fine.toLong)
      })
  }
}
