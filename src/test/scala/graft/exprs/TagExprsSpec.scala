package graft.exprs

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import graft.SparkTestSession

/** Parity pins for the codegen'd tag kernels against the HOF forms they
  * replaced on the compiler's cold path (Compiler.tagValue / HasKey):
  * identical values on present/absent/duplicate/null-key/null-array inputs,
  * and codegen capability (no CodegenFallback). */
class TagExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val tagsType = "array<struct<key:string,value:string>>"

  private def frame = {
    val rows = Seq(
      (1L, Seq(("highway", "residential"), ("name", "x"))),
      (2L, Seq(("name", "y"), ("highway", "primary"), ("highway", "second"))),
      (3L, Seq.empty[(String, String)]),
      (5L, Seq(("building", "yes"))),
      (6L, Seq((null: String, "v"), ("highway", "service"))),
      (7L, Seq((null: String, "v"))))
      .toDF("id", "tags")
      .withColumn("tags", col("tags").cast(tagsType))
    val nullRow = Seq(4L).toDF("id")
      .withColumn("tags", lit(null).cast(tagsType))
    rows.unionByName(nullRow)
  }

  private def lookupNew(k: String) =
    GraftBridge.column(TagLookup(GraftBridge.expression(col("tags")), k))
  private def lookupHof(k: String) =
    get(filter(col("tags"), t => t.getField("key") === k), lit(0))
      .getField("value")
  private def existsNew(k: String) =
    GraftBridge.column(TagExists(GraftBridge.expression(col("tags")), k))
  private def existsHof(k: String) =
    exists(col("tags"), t => t.getField("key") === k)

  test("TagLookup equals the HOF first-match lookup on all edge shapes") {
    for (k <- Seq("highway", "name", "building", "missing")) {
      val got = frame.select(col("id"), lookupNew(k), lookupHof(k))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      got.foreach { case (id, n, h) =>
        assert(n === h, s"key=$k id=$id: kernel=$n hof=$h")
      }
    }
  }

  test("TagExists equals the HOF exists incl. three-valued null-key logic") {
    for (k <- Seq("highway", "building", "missing")) {
      val got = frame.select(col("id"), existsNew(k), existsHof(k))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getBoolean(1),
          if (r.isNullAt(2)) null else r.getBoolean(2)))
      got.foreach { case (id, n, h) =>
        assert(n === h, s"key=$k id=$id: kernel=$n hof=$h")
      }
    }
  }

  test("both kernels are codegen-capable (no CodegenFallback)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
    val dt = org.apache.spark.sql.types.DataType.fromDDL(tagsType)
    val lk = TagLookup(BoundReference(0, dt, nullable = true), "highway")
    val ex = TagExists(BoundReference(0, dt, nullable = true), "highway")
    assert(!lk.isInstanceOf[CodegenFallback] && !ex.isInstanceOf[CodegenFallback])
    assert(lk.genCode(new CodegenContext).code.toString.contains("TagKernel.lookup"))
    assert(ex.genCode(new CodegenContext).code.toString.contains("TagKernel.exists"))
  }
}
