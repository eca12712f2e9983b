package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.SparkTestSession
import graft.fixtures.DeterministicGen

/** Round-trip: OsmElement → spans → OsmView.derive (Catalyst HOFs) must
  * reproduce every typed field, and the docs table must preserve the
  * span-sequence invariant (kind, text, media_ref, order). */
class CodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("typed view round-trips the generator elements (sf=0.001)") {
    val els = DeterministicGen.elements(0.001)
    val view = OsmView.derive(DeterministicGen.docsDF(spark, 0.001))
    val rows = view.collect().map(r => r.getAs[Long]("seq") -> r).toMap
    assert(rows.size === els.size)

    els.foreach { el =>
      val r = rows(el.seq)
      assert(r.getAs[String]("doc_id") === el.docId)
      assert(r.getAs[String]("type") === el.otype, el)
      assert(r.getAs[Long]("id") === el.id)
      assert(r.getAs[Long]("version") === el.version)
      assert(r.getAs[Boolean]("visible") === el.visible)
      assert(r.getAs[Long]("changeset") === el.changeset)
      assert(r.getAs[Long]("uid") === el.uid)
      assert(r.getAs[String]("user") === el.user)
      assert(r.getAs[String]("timestamp") === el.timestamp)
      val tags = r.getAs[scala.collection.Seq[Row]]("tags")
        .map(t => (t.getAs[String]("key"), t.getAs[String]("value"))).toVector
      assert(tags === el.tags, s"tags of ${el.docId}")
      assert(r.getAs[scala.collection.Seq[Long]]("nds").toVector === el.nds)
      val members = r.getAs[scala.collection.Seq[Row]]("members")
        .map(m => (m.getAs[String]("mtype"), m.getAs[Long]("ref"),
          m.getAs[String]("role"))).toVector
      assert(members === el.members, s"members of ${el.docId}")
      assert(r.getAs[scala.collection.Seq[String]]("media_refs").toVector === el.mediaRefs)
      el.lat match {
        case Some(v) => assert(math.abs(r.getAs[Double]("lat") - v) < 1e-7)
        case None    => assert(r.isNullAt(r.fieldIndex("lat")))
      }
    }
  }

  test("span-sequence equality survives a filter (rows selected, spans untouched)") {
    import org.apache.spark.sql.functions._
    val docs = DeterministicGen.docsDF(spark, 0.001)
    val filtered = docs.filter(col("type") === "way")
    val before = docs.filter(col("type") === "way")
      .select("doc_id", "spans").collect()
      .map(r => r.getString(0) -> r.getSeq[Row](1)).toMap
    filtered.select("doc_id", "spans").collect().foreach { r =>
      assert(r.getSeq[Row](1) === before(r.getString(0)))
    }
  }

  test("single-pass deriveFast equals the HOF derivation field-for-field") {
    val docs = DeterministicGen.docsDF(spark, 0.001)
    val slow = OsmView.deriveHof(docs).collect()
      .map(r => r.getAs[Long]("seq") -> r).toMap
    val fast = OsmView.deriveFast(docs).collect()
    assert(fast.length === slow.size)
    fast.foreach { f =>
      val s = slow(f.getAs[Long]("seq"))
      s.schema.fieldNames.foreach { c =>
        assert(f.getAs[Any](c) === s.getAs[Any](c),
          s"field $c of seq=${f.getAs[Long]("seq")}")
      }
    }
    // the expensive decode must appear exactly once in the optimized plan
    // (use a parquet-backed frame: a LocalRelation would be constant-folded)
    val dir = java.nio.file.Files.createTempDirectory("graft-fastplan").toString
    docs.write.mode("overwrite").parquet(dir)
    val optimized = OsmView.deriveFast(spark.read.parquet(dir))
      .queryExecution.optimizedPlan.toString
    val occurrences = "decode_osm_spans".r.findAllIn(optimized).size
    assert(occurrences === 1, s"decode duplicated in plan:\n$optimized")
  }

  test("per-field pruned decode equals the HOF derivation field-for-field") {
    val docs = DeterministicGen.docsDF(spark, 0.001)
    val slow = OsmView.deriveHof(docs).collect()
      .map(r => r.getAs[Long]("seq") -> r).toMap
    val pruned = OsmView.derivePruned(docs).collect()
    assert(pruned.length === slow.size)
    pruned.foreach { f =>
      val s = slow(f.getAs[Long]("seq"))
      s.schema.fieldNames.foreach { c =>
        assert(f.getAs[Any](c) === s.getAs[Any](c),
          s"field $c of seq=${f.getAs[Long]("seq")}")
      }
    }
  }

  test("decode expression is codegen-capable (no CodegenFallback)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
    import graft.exprs.DecodeOsmSpans
    val expr = DecodeOsmSpans(BoundReference(0,
      DeterministicGen.docsDF(spark, 0.001).schema("spans").dataType, nullable = true))
    assert(!expr.isInstanceOf[CodegenFallback])
    val code = expr.genCode(new CodegenContext) // must not throw
    assert(code.code.toString.contains("graft.exprs.SpanDecode.decode"))
  }

  test("generator is deterministic for a given (seed, sf)") {
    val a = DeterministicGen.elements(0.001)
    val b = DeterministicGen.elements(0.001)
    assert(a === b)
    // and contains the edge populations the corpus needs
    assert(a.exists(_.id < 0), "negative ids present")
    assert(a.exists(e => e.otype == "way" && e.nds.nonEmpty && e.nds.head == e.nds.last), "closed ways")
    assert(a.exists(e => e.otype == "way" && e.nds.size == 1), "degenerate 1-node ways")
    assert(a.exists(_.user.isEmpty), "empty user")
    assert(a.exists(_.tags.isEmpty), "untagged elements")
    assert(a.exists(_.mediaRefs.nonEmpty), "interleaved media spans")
    assert(a.exists(!_.visible), "invisible elements")
  }
}
