package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkTestSession
import graft.driver.TpchOsm
import graft.engine.FilterEngine

/** The optimizer rule that lets PLAIN Spark queries (exists() over the tags
  * array, written by a user who's never seen graft's compiler) hit the hot
  * t_<key> columns: semantics equal the unrewritten query on every shape
  * (has-key, key+value, either operand order, under Not), the rewritten
  * filter reaches the parquet scan as pushed predicates, and the rule is a
  * no-op on non-hot keys, non-tags arrays, and metadata-less views. */
class HotTagRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val hotViewPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rewrite-view").toString
    FilterEngine.materializeView(TpchOsm.docs(spark, "/root/testdata/sf0.001"), dir)
    dir
  }

  /** Fresh session (shared context, own optimizer) with the rule injected —
    * the per-session registration path; GraftExtensions covers cluster-wide. */
  private lazy val hotSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(HotTagRewrite)
    s
  }

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s.metadata.getOrElse("PushedFilters", "")
    }.getOrElse("")

  test("has-key exists() rewrites to IsNotNull(t_key) and pushes") {
    val view = hotSession.read.parquet(hotViewPath)
    val q = view.filter(exists(col("tags"), t => t.getField("key") === "highway"))
      .select("id")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("isnotnull(t_highway"), s"not rewritten:\n$opt")
    assert(!opt.contains("exists("), s"exists survived:\n$opt")
    assert(pushedFilters(q).contains("IsNotNull(t_highway)"),
      s"rewritten predicate not pushed: ${pushedFilters(q)}")
    // semantics: equal to the same query in a rule-free session
    val cold = spark.read.parquet(hotViewPath)
      .filter(exists(col("tags"), t => t.getField("key") === "highway"))
      .select("id")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ===
      cold.collect().map(_.getLong(0)).sorted.toSeq)
    assert(cold.count() > 0)
  }

  test("key+value exists() rewrites to IsNotNull AND EqualTo, sound under Not") {
    val view = hotSession.read.parquet(hotViewPath)
    def pred(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      exists(col("tags"), t => c(t))
    val shapes = Seq(
      pred(t => t.getField("key") === "highway" && t.getField("value") === "residential"),
      pred(t => lit("highway") === t.getField("key") && t.getField("value") === "residential"),
      pred(t => t.getField("value") === "residential" && t.getField("key") === "highway"))
    shapes.foreach { p =>
      val q = view.filter(p).select("id")
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("t_highway") && !opt.contains("exists("),
        s"shape not rewritten:\n$opt")
      assert(pushedFilters(q).contains("EqualTo(t_highway,residential)"),
        s"equality not pushed: ${pushedFilters(q)}")
      val cold = spark.read.parquet(hotViewPath).filter(p).select("id")
      assert(q.collect().map(_.getLong(0)).sorted.toSeq ===
        cold.collect().map(_.getLong(0)).sorted.toSeq)
    }
    // negation: absent key must stay FALSE (not null) after rewriting —
    // IsNotNull conjunct makes the equality two-valued
    val notQ = view.filter(!pred(t =>
      t.getField("key") === "highway" && t.getField("value") === "residential"))
    val notCold = spark.read.parquet(hotViewPath).filter(!exists(col("tags"),
      t => t.getField("key") === "highway" && t.getField("value") === "residential"))
    assert(notQ.count() === notCold.count())
    assert(notQ.count() + view.filter(shapes.head).count() === view.count(),
      "rewritten Not() partition does not complement the positive set")
  }

  test("SQL-text exists() gets the same rewrite") {
    hotSession.read.parquet(hotViewPath).createOrReplaceTempView("hv")
    val q = hotSession.sql(
      "SELECT id FROM hv WHERE exists(tags, t -> t.key = 'highway')")
    assert(q.queryExecution.optimizedPlan.toString.contains("isnotnull(t_highway"))
    val cold = spark.read.parquet(hotViewPath)
      .filter(exists(col("tags"), t => t.getField("key") === "highway"))
    assert(q.count() === cold.count())
  }

  test("no-op on cold keys, non-tags arrays, and metadata-less tables") {
    val view = hotSession.read.parquet(hotViewPath)
    // a key that isn't materialized hot: exists survives, result unchanged
    val coldKey = view.filter(exists(col("tags"),
      t => t.getField("key") === "zz_never_hot"))
    assert(coldKey.queryExecution.optimizedPlan.toString.contains("exists("))
    assert(coldKey.count() === 0)
    // an exists over a DIFFERENT array column is untouched
    val other = view.filter(exists(col("nds"), x => x === 17L))
    assert(other.queryExecution.optimizedPlan.toString.contains("exists("))
    // a table without hot metadata: rule leaves the plan alone
    import hotSession.implicits._
    val plain = Seq((1L, Seq(("highway", "residential")))).toDF("id", "tags")
      .withColumn("tags", col("tags").cast("array<struct<key:string,value:string>>"))
    val pq = plain.filter(exists(col("tags"), t => t.getField("key") === "highway"))
    // (the local relation gets constant-folded, so pin the ABSENCE of a
    // hot-column rewrite rather than the exists survivor)
    assert(!pq.queryExecution.optimizedPlan.toString.contains("t_highway"))
    assert(pq.count() === 1)
  }

  test("backs off over a join of two hot views (ambiguous provenance)") {
    // a pushable single-side predicate gets pushed below the join by the
    // optimizer BEFORE this rule fires (one tags column in scope there —
    // rewrite is then unambiguous and fine); to pin the guard we need a
    // filter that STAYS above the join: a disjunction mixing both sides
    def q(s: org.apache.spark.sql.SparkSession) = {
      val base = s.read.parquet(hotViewPath)
      base.as("a").join(base.as("b"), Seq("id"))
        .filter(exists(col("a.tags"), t => t.getField("key") === "highway") ||
          col("b.version") > 5)
    }
    val hot = q(hotSession)
    // two tags columns in scope at the surviving Filter: the rule cannot
    // associate t_highway with its source array, so the exists must SURVIVE
    assert(hot.queryExecution.optimizedPlan.toString.contains("exists("),
      "rule rewrote across ambiguous relations")
    assert(hot.count() === q(spark).count())
  }

  test("the hot view enforces a never-null tags array (rule contract)") {
    assert(spark.read.parquet(hotViewPath)
      .filter(col("tags").isNull).count() === 0L)
  }

  test("GraftExtensions registers the rule without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
