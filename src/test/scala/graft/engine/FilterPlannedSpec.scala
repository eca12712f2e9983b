package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.compile.Compiler
import graft.fixtures.DeterministicGen
import graft.model.OsmView

/** The semi-join plan for huge id files must be result-identical to the
  * InSet plan, choose joins only above the threshold, and keep entity-mask
  * semantics. */
class FilterPlannedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private lazy val view = OsmView.derive(DeterministicGen.docsDF(spark, 0.001)).cache()

  private val idFile: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("graft-bigids", ".txt")
    p.toFile.deleteOnExit()
    p
  }

  test("semi-join plan equals the InSet plan (in and not-in, with residual)") {
    DeterministicGen.idListFile(0.001, idFile)
    val loader = Compiler.fileLoader(_ => idFile)
    Seq("@id in (<'ids') and @way",
        "@id not in (<'ids') and @tags > 0",
        "@uid in (<'ids')").foreach { expr =>
      val inset = FilterEngine.filterView(view, expr, loader)
        .select("doc_id").collect().map(_.getString(0)).toSet
      val planned = FilterEngine.filterPlanned(view, expr, loader,
        semiJoinThreshold = 0) // force the join path
        .select("doc_id").collect().map(_.getString(0)).toSet
      assert(planned === inset, s"for <$expr>")
      // and the join really is in the plan
      val p = FilterEngine.filterPlanned(view, expr, loader, semiJoinThreshold = 0)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("LeftSemi") || p.contains("LeftAnti"), p)
    }
  }

  test("below the threshold the InSet path is kept (no join in plan)") {
    DeterministicGen.idListFile(0.001, idFile)
    val loader = Compiler.fileLoader(_ => idFile)
    val p = FilterEngine.filterPlanned(view, "@id in (<'ids')", loader,
      semiJoinThreshold = 1000000).queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), p)
  }

  test("entity mask still applies when the list conjunct becomes a join") {
    DeterministicGen.idListFile(0.001, idFile)
    val loader = Compiler.fileLoader(_ => idFile)
    val types = FilterEngine.filterPlanned(view,
      "@id in (<'ids') and @nodes > 0", loader, semiJoinThreshold = 0)
      .select("type").distinct().collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("way")))
  }
}
