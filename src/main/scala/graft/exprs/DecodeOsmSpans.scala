package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass span decoder: spans array → the full typed OSM struct in ONE
  * traversal. The pure-Column derivation ([[graft.model.OsmView.derive]])
  * needs ~12 higher-order-function passes over the same array (one per
  * field), each of them CodegenFallback — this expression replaces them with
  * one linear scan per row. Wins when all fields are needed (full-view
  * materialization: 1.8×, see tools.DecodeBench); for narrow filters the
  * per-field HOF derivation wins because Catalyst prunes untouched fields.
  * Semantics are identical; equivalence is tested against the HOF
  * derivation. (SURVEY.md §8 backlog item, measured both ways.)
  */
case class DecodeOsmSpans(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DecodeOsmSpans.schema
  override def nullable: Boolean = false
  override def prettyName: String = "decode_osm_spans"

  override protected def withNewChildInternal(newChild: Expression): DecodeOsmSpans =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val spans = input.asInstanceOf[ArrayData]
    val n = spans.numElements()
    var typ: UTF8String = null
    var id = 0L; var version = 0L; var changeset = 0L; var uid = 0L
    var visible = true
    var user: UTF8String = UTF8String.EMPTY_UTF8
    var ts: UTF8String = UTF8String.EMPTY_UTF8
    var lat: Any = null; var lon: Any = null
    val tags = new java.util.ArrayList[InternalRow]()
    val nds = new java.util.ArrayList[AnyRef]()
    val members = new java.util.ArrayList[InternalRow]()
    val media = new java.util.ArrayList[AnyRef]()

    var i = 0
    while (i < n) {
      val span = spans.getStruct(i, 4)
      val kind = span.getUTF8String(0).toString
      kind match {
        case "tag" =>
          val t = span.getUTF8String(1).toString
          val eq = t.indexOf('=')
          val (k, v) = if (eq < 0) (t, "") else (t.substring(0, eq), t.substring(eq + 1))
          tags.add(new GenericInternalRow(Array[Any](
            UTF8String.fromString(k), UTF8String.fromString(v))))
        case "nd" =>
          nds.add(java.lang.Long.valueOf(span.getUTF8String(1).toString.toLong))
        case "member" =>
          val t = span.getUTF8String(1).toString
          val a = t.indexOf('/'); val b = t.indexOf('/', a + 1)
          members.add(new GenericInternalRow(Array[Any](
            UTF8String.fromString(t.substring(0, a)),
            t.substring(a + 1, b).toLong,
            UTF8String.fromString(t.substring(b + 1)))))
        case "media" =>
          // copy: the input row buffer may be reused by the upstream iterator
          media.add(span.getUTF8String(2).clone())
        case "type"      => typ = span.getUTF8String(1).clone()
        case "id"        => id = span.getUTF8String(1).toString.toLong
        case "version"   => version = span.getUTF8String(1).toString.toLong
        case "visible"   => visible = span.getUTF8String(1).toString == "true"
        case "changeset" => changeset = span.getUTF8String(1).toString.toLong
        case "uid"       => uid = span.getUTF8String(1).toString.toLong
        case "user"      => user = span.getUTF8String(1).clone()
        case "timestamp" => ts = span.getUTF8String(1).clone()
        case "lat"       => lat = span.getUTF8String(1).toString.toLong / 1e7
        case "lon"       => lon = span.getUTF8String(1).toString.toLong / 1e7
        case _           => // unknown span kinds pass through untouched
      }
      i += 1
    }

    new GenericInternalRow(Array[Any](
      typ, id, version, visible, changeset, uid, user, ts, lat, lon,
      new GenericArrayData(tags.toArray()),
      new GenericArrayData(nds.toArray()),
      new GenericArrayData(members.toArray()),
      new GenericArrayData(media.toArray())))
  }
}

object DecodeOsmSpans {
  val schema: StructType = StructType(Seq(
    StructField("type", StringType, nullable = true),
    StructField("id", LongType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("visible", BooleanType, nullable = false),
    StructField("changeset", LongType, nullable = false),
    StructField("uid", LongType, nullable = false),
    StructField("user", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = false),
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
