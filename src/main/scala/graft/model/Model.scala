package graft.model

/** Engine data model — the contract shape (BASELINE.json `input_hint`):
  * an Iceberg-layout table of interleaved text + media documents,
  *
  * {{{ docs(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>) }}}
  *
  * One OSM element per document; header fields, tags, node-refs, members and
  * interleaved media payloads are ordered spans (encoding: FIXTURES.md §1).
  * The per-row invariant vs the reference is span-sequence equality
  * (kind, text, media_ref, order): a filter selects rows, never rewrites
  * spans. The physical table carries two extra columns — `type`
  * (node/way/relation, the partition column driving entity-bits partition
  * pruning) and `seq` (monotone input order for byte-stable output).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class OsmDocRow(doc_id: String, spans: Seq[Span], `type`: String, seq: Long)

/** Driver-side typed OSM element (test fixtures and the semantics oracle).
  * Field inventory mirrors the reference's evaluation surface
  * (include/object_filter.hpp:821-956, 1196-1309). */
final case class OsmElement(
    otype: String,                       // "node" | "way" | "relation"
    id: Long,                            // signed (negative ids exist)
    version: Long,
    visible: Boolean,
    changeset: Long,
    uid: Long,
    user: String,
    timestamp: String,                   // model-only in v1 (language.md:94-100)
    lat: Option[Double],                 // nodes only
    lon: Option[Double],
    tags: Vector[(String, String)],      // ordered, duplicates possible
    nds: Vector[Long],                   // ways only, ordered
    members: Vector[(String, Long, String)], // (type, ref, role), ordered
    mediaRefs: Vector[String],           // interleaved media payload URIs
    seq: Long) {

  def docId: String = otype.head.toString + id

  /** Span encoding per FIXTURES.md §1 — fixed kind order mirroring OPL
    * serialization; `offset` is the char offset in the reconstructed line. */
  def toSpans: Vector[Span] = {
    val b = Vector.newBuilder[Span]
    var off = 0
    def add(kind: String, text: String, mediaRef: String = ""): Unit = {
      b += Span(kind, text, mediaRef, off)
      off += (if (text.nonEmpty) text.length else mediaRef.length) + 1
    }
    add("type", otype)
    add("id", id.toString)
    add("version", version.toString)
    add("visible", visible.toString)
    add("changeset", changeset.toString)
    add("uid", uid.toString)
    add("user", user)
    add("timestamp", timestamp)
    lat.foreach(v => add("lat", math.round(v * 1e7).toString))
    lon.foreach(v => add("lon", math.round(v * 1e7).toString))
    tags.foreach { case (k, v) => add("tag", s"$k=$v") }
    nds.foreach(r => add("nd", r.toString))
    members.foreach { case (t, r, role) => add("member", s"$t/$r/$role") }
    mediaRefs.foreach(u => add("media", "", u))
    b.result()
  }

  def toDocRow: OsmDocRow = OsmDocRow(docId, toSpans, otype, seq)
}
