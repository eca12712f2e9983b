package graft.tools

import org.apache.spark.sql.DataFrame
import graft.compile.Compiler
import graft.ofl.Parser

/** Per-query timing of the OFL filter suite over the three span views
  * (HOF derive, full-decode deriveFast, per-field derivePruned) to localize
  * which predicates dominate the in-flight decode cost. */
object SpanFilterProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.FilterEngine.session(master = "local[32]", appName = "span-probe")
    val docs = spark.read.parquet("/root/repo/target/bench/docs_n600000")
    def t(f: => Any): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val views: Seq[(String, DataFrame)] = Seq(
      "pruned" -> graft.model.OsmView.derivePruned(docs),
      "fast" -> graft.model.OsmView.deriveFast(docs))
    for (q <- graft.Bench.filterSuite) {
      val pred = Compiler.compileEffective(Parser.parse(q))
      val times = views.map { case (n, v) =>
        v.filter(pred).count() // warm
        f"$n=${t(v.filter(pred).count())}%.2f"
      }
      println(s"PROBE ${times.mkString(" ")}  :: $q")
    }
    // plan of the worst offender on the pruned path
    val pred = Compiler.compileEffective(Parser.parse("not (highway or building or landuse)"))
    println(views.head._2.filter(pred).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
