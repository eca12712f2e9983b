package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass span decoder: spans array → the full typed OSM struct in ONE
  * traversal, with a field `mask` so callers that need only a few fields
  * (in-flight filters) skip the parse work for the rest. The pure-Column
  * derivation ([[graft.model.OsmView.derive]]) needs ~12 higher-order-function
  * passes over the same array (one per field), each of them CodegenFallback;
  * this expression is whole-stage-codegen capable: `doGenCode` emits a static
  * call into [[SpanDecode.decode]], keeping the surrounding filter/project
  * pipeline fused (no fallback glue, no InternalRow conversion boundary).
  *
  * Unset mask bits leave their field null/empty — callers must only read the
  * fields they asked for ([[graft.model.OsmView.derivePruned]] builds one
  * single-field decode per column so Catalyst column pruning drops whole
  * passes). Semantics per field are identical to the HOF derivation
  * (absent header span ⇒ null) and equivalence is tested against it.
  */
case class DecodeOsmSpans(child: Expression, mask: Int = SpanDecode.AllFields)
  extends UnaryExpression {

  override def dataType: DataType = DecodeOsmSpans.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "decode_osm_spans"

  override protected def withNewChildInternal(newChild: Expression): DecodeOsmSpans =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SpanDecode.decode(input.asInstanceOf[ArrayData], mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.SpanDecode.decode($c, $mask);")
}

object DecodeOsmSpans {
  val schema: StructType = StructType(Seq(
    StructField("type", StringType, nullable = true),
    StructField("id", LongType, nullable = true),
    StructField("version", LongType, nullable = true),
    StructField("visible", BooleanType, nullable = true),
    StructField("changeset", LongType, nullable = true),
    StructField("uid", LongType, nullable = true),
    StructField("user", StringType, nullable = true),
    StructField("timestamp", StringType, nullable = true),
    StructField("lat", DoubleType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false))), containsNull = false)),
    StructField("nds", ArrayType(LongType, containsNull = false)),
    StructField("members", ArrayType(StructType(Seq(
      StructField("mtype", StringType, nullable = false),
      StructField("ref", LongType, nullable = false),
      StructField("role", StringType, nullable = false))), containsNull = false)),
    StructField("media_refs", ArrayType(StringType, containsNull = false))))
}

/** The decode kernel, kept in a top-level object so scalac emits a static
  * forwarder (`graft.exprs.SpanDecode.decode(...)`) that generated Java can
  * call directly. Kind dispatch compares UTF8Strings against interned
  * constants (first-byte switch, then memcmp) — no per-span String
  * allocation; field text is materialized only for fields the mask asks for.
  */
object SpanDecode {

  // one bit per output field, in schema ordinal order
  final val FType = 1 << 0
  final val FId = 1 << 1
  final val FVersion = 1 << 2
  final val FVisible = 1 << 3
  final val FChangeset = 1 << 4
  final val FUid = 1 << 5
  final val FUser = 1 << 6
  final val FTimestamp = 1 << 7
  final val FLat = 1 << 8
  final val FLon = 1 << 9
  final val FTags = 1 << 10
  final val FNds = 1 << 11
  final val FMembers = 1 << 12
  final val FMediaRefs = 1 << 13
  final val AllFields: Int = (1 << 14) - 1

  /** view column name → mask bit (ordinal order matches the schema). */
  val fieldBits: Seq[(String, Int)] = Seq(
    "type" -> FType, "id" -> FId, "version" -> FVersion, "visible" -> FVisible,
    "changeset" -> FChangeset, "uid" -> FUid, "user" -> FUser,
    "timestamp" -> FTimestamp, "lat" -> FLat, "lon" -> FLon, "tags" -> FTags,
    "nds" -> FNds, "members" -> FMembers, "media_refs" -> FMediaRefs)

  private val K_TAG = UTF8String.fromString("tag")
  private val K_TYPE = UTF8String.fromString("type")
  private val K_TIMESTAMP = UTF8String.fromString("timestamp")
  private val K_ND = UTF8String.fromString("nd")
  private val K_MEMBER = UTF8String.fromString("member")
  private val K_MEDIA = UTF8String.fromString("media")
  private val K_ID = UTF8String.fromString("id")
  private val K_VERSION = UTF8String.fromString("version")
  private val K_VISIBLE = UTF8String.fromString("visible")
  private val K_CHANGESET = UTF8String.fromString("changeset")
  private val K_UID = UTF8String.fromString("uid")
  private val K_USER = UTF8String.fromString("user")
  private val K_LAT = UTF8String.fromString("lat")
  private val K_LON = UTF8String.fromString("lon")
  private val TRUE = UTF8String.fromString("true")

  private final val ArrayFields = FTags | FNds | FMembers | FMediaRefs

  def decode(spans: ArrayData, mask: Int): InternalRow = {
    val n = spans.numElements()
    var typ: UTF8String = null
    var id: Any = null; var version: Any = null
    var changeset: Any = null; var uid: Any = null
    var visible: Any = null
    var user: UTF8String = null
    var ts: UTF8String = null
    var lat: Any = null; var lon: Any = null
    val tags = if ((mask & FTags) != 0) new java.util.ArrayList[AnyRef]() else null
    val nds = if ((mask & FNds) != 0) new java.util.ArrayList[AnyRef]() else null
    val members = if ((mask & FMembers) != 0) new java.util.ArrayList[AnyRef]() else null
    val media = if ((mask & FMediaRefs) != 0) new java.util.ArrayList[AnyRef]() else null

    // Early exit: header fields occur at most once, so once every requested
    // SCALAR field has been seen there is nothing left to find — a mask with
    // no array bits (the derivePruned per-field passes) stops scanning
    // instead of walking the tag/nd/member tail. Order-independent: the exit
    // fires only on found fields, never on an assumed layout. (On duplicate
    // header spans this keeps the FIRST value — the HOF reference's
    // get(filter(...), 0) semantics.)
    val scalarOnly = (mask & ArrayFields) == 0
    var want = mask & ~ArrayFields

    var i = 0
    while (i < n && !(scalarOnly && want == 0)) {
      val span = spans.getStruct(i, 4)
      val kind = span.getUTF8String(0)
      val b0: Int = if (kind.numBytes() > 0) kind.getByte(0).toInt else 0
      b0 match {
        case 't' => // tag | type | timestamp
          if (kind.equals(K_TAG)) {
            if (tags != null) {
              // clone once (the input buffer may be reused), then split the
              // byte array in place: '=' is single-byte in UTF-8, so a byte
              // scan is exact and no String decode/encode round-trip is paid
              val t = span.getUTF8String(1).clone()
              val b = t.getBytes
              val nb = b.length
              var eq = 0
              while (eq < nb && b(eq) != '=') eq += 1
              if (eq >= nb)
                tags.add(new GenericInternalRow(Array[Any](t, UTF8String.EMPTY_UTF8)))
              else
                tags.add(new GenericInternalRow(Array[Any](
                  UTF8String.fromBytes(b, 0, eq),
                  UTF8String.fromBytes(b, eq + 1, nb - eq - 1))))
            }
          } else if (kind.equals(K_TYPE)) {
            if ((mask & FType) != 0 && typ == null) {
              typ = span.getUTF8String(1).clone(); want &= ~FType
            }
          } else if (kind.equals(K_TIMESTAMP)) {
            if ((mask & FTimestamp) != 0 && ts == null) {
              ts = span.getUTF8String(1).clone(); want &= ~FTimestamp
            }
          }
        case 'n' => // nd
          if (kind.equals(K_ND) && nds != null)
            nds.add(java.lang.Long.valueOf(span.getUTF8String(1).toLongExact()))
        case 'm' => // member | media
          if (kind.equals(K_MEMBER)) {
            if (members != null) {
              val t = span.getUTF8String(1).clone()
              val b = t.getBytes
              var a = 0
              while (b(a) != '/') a += 1
              var c = a + 1
              while (b(c) != '/') c += 1
              members.add(new GenericInternalRow(Array[Any](
                UTF8String.fromBytes(b, 0, a),
                UTF8String.fromBytes(b, a + 1, c - a - 1).toLongExact(),
                UTF8String.fromBytes(b, c + 1, b.length - c - 1))))
            }
          } else if (kind.equals(K_MEDIA)) {
            // copy: the input row buffer may be reused by the upstream iterator
            if (media != null) media.add(span.getUTF8String(2).clone())
          }
        case 'i' =>
          if (kind.equals(K_ID) && (mask & FId) != 0 && id == null) {
            id = span.getUTF8String(1).toLongExact(); want &= ~FId
          }
        case 'v' => // version | visible
          if (kind.equals(K_VERSION)) {
            if ((mask & FVersion) != 0 && version == null) {
              version = span.getUTF8String(1).toLongExact(); want &= ~FVersion
            }
          } else if (kind.equals(K_VISIBLE)) {
            if ((mask & FVisible) != 0 && visible == null) {
              visible = span.getUTF8String(1).equals(TRUE); want &= ~FVisible
            }
          }
        case 'c' =>
          if (kind.equals(K_CHANGESET) && (mask & FChangeset) != 0 && changeset == null) {
            changeset = span.getUTF8String(1).toLongExact(); want &= ~FChangeset
          }
        case 'u' => // uid | user
          if (kind.equals(K_UID)) {
            if ((mask & FUid) != 0 && uid == null) {
              uid = span.getUTF8String(1).toLongExact(); want &= ~FUid
            }
          } else if (kind.equals(K_USER)) {
            if ((mask & FUser) != 0 && user == null) {
              user = span.getUTF8String(1).clone(); want &= ~FUser
            }
          }
        case 'l' => // lat | lon
          if (kind.equals(K_LAT)) {
            if ((mask & FLat) != 0 && lat == null) {
              lat = span.getUTF8String(1).toLongExact() / 1e7; want &= ~FLat
            }
          } else if (kind.equals(K_LON)) {
            if ((mask & FLon) != 0 && lon == null) {
              lon = span.getUTF8String(1).toLongExact() / 1e7; want &= ~FLon
            }
          }
        case _ => // unknown span kinds pass through untouched
      }
      i += 1
    }

    new GenericInternalRow(Array[Any](
      typ, id, version, visible, changeset, uid, user, ts, lat, lon,
      if (tags == null) null else new GenericArrayData(tags.toArray()),
      if (nds == null) null else new GenericArrayData(nds.toArray()),
      if (members == null) null else new GenericArrayData(members.toArray()),
      if (media == null) null else new GenericArrayData(media.toArray())))
  }
}
