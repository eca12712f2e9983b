package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.fixtures.DeterministicGen
import graft.ofl.{EntityBits, OflTypeException, Parser}
import graft.oracle.OracleEval

/** End-to-end engine semantics on the deterministic fixture, including the
  * --complete-ways two-pass spec (SURVEY.md §3.2) simulated literally on the
  * driver as the oracle. */
class FilterEngineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private lazy val elements = DeterministicGen.elements(0.001)
  private lazy val docs = DeterministicGen.docsDF(spark, 0.001).cache()

  test("explain output matches the -v format") {
    val q = FilterEngine.parse("@closed_way or (@relation and 'type' == 'multipolygon')")
    assert(q.explain ===
      "BOOL_OR\n BOOL_ATTR[closed_way]\n BOOL_AND\n  BOOL_ATTR[relation]\n  CHECK_TAG[type][equal][multipolygon]\n" +
      "entities: way relation\n")
  }

  test("never-match expression aborts like the reference") {
    intercept[OflTypeException](FilterEngine.filter(docs, "@node and @way"))
  }

  test("complete-ways equals the literal two-pass simulation (abs-id membership)") {
    val expr = "highway == residential or @relation"
    val ast = Parser.parse(expr)
    val allowed = EntityBits.names(EntityBits.entities(ast)).toSet

    // pass 1: restricted reader + match; collect (type, |id|); ways add node refs
    val ids = scala.collection.mutable.Set[(String, Long)]()
    elements.foreach { el =>
      if (allowed.contains(el.otype) && OracleEval.matches(ast, el)) {
        ids += ((el.otype, math.abs(el.id)))
        if (el.otype == "way") el.nds.foreach(r => ids += (("node", math.abs(r))))
      }
    }
    // pass 2: unrestricted scan, emit iff (type, |id|) in set
    val expected = elements.filter(el => ids.contains((el.otype, math.abs(el.id))))
      .map(_.docId).toSet

    val got = FilterEngine.completeWays(docs, expr)
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(got === expected)
    // sanity: complete-ways output is a superset of the plain filter's
    val plain = FilterEngine.filter(docs, expr)
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(plain.subsetOf(got))
  }

  test("writeOrdered produces byte-stable input-order output with intact spans") {
    val out = java.nio.file.Files.createTempDirectory("graft-out").toString
    val filtered = FilterEngine.filter(docs, "@way and @tags > 0")
    FilterEngine.writeOrdered(filtered, out)
    val back = spark.read.parquet(out).collect()
    val seqs = back.map(_.getAs[Long]("seq"))
    assert(seqs.sameElements(seqs.sorted), "ordered by seq")
    // span-sequence invariant on survivors
    val bySeq = elements.map(e => e.seq -> e).toMap
    back.foreach { r =>
      val el = bySeq(r.getAs[Long]("seq"))
      val spans = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("spans")
        .map(s => (s.getAs[String]("kind"), s.getAs[String]("text"),
          s.getAs[String]("media_ref")))
      assert(spans.toVector === el.toSpans.map(s => (s.kind, s.text, s.media_ref)))
    }
  }

  test("JSON-lines docs round-trip: `-o -` output re-read as `-` input filters identically") {
    // stage 1: a broad filter streamed out the way `-o -` does (toJSON on
    // the full filter output — typed view columns included, which the
    // schema-directed reader must IGNORE on the way back in)
    val jsonl = java.nio.file.Files.createTempFile("graft-stdin-spec-", ".jsonl")
    val lines = FilterEngine.filter(docs, "@way or @node")
      .orderBy("seq").toJSON.collect()
    java.nio.file.Files.write(jsonl, String.join("\n", lines: _*).getBytes("UTF-8"))

    // stage 2: re-read as a docs table and apply a narrower filter
    val back = FilterEngine.readDocsJson(spark, jsonl.toString)
    assert(back.columns.toSeq === Seq("doc_id", "spans", "type", "seq"),
      "reader restricts to the docs contract")
    val got = FilterEngine.filter(back, "highway == residential and @version >= 2")
      .select("doc_id").collect().map(_.getString(0)).toSet
    val expected = FilterEngine.filter(docs,
      "(@way or @node) and highway == residential and @version >= 2")
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(got === expected)
  }

  test("driver entry (flagship query) returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("partition pruning reaches the parquet scan for type-restricted filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    docs.write.mode("overwrite").partitionBy("type").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val plan = FilterEngine.filter(onDisk, "@closed_way")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(type"),
      s"expected partition filter on type in:\n$plan")
    assert(!plan.contains("PartitionFilters: []"), "partition filter must not be empty")
  }
}
