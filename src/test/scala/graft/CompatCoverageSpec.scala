package graft

import java.nio.file.{Files, Paths}
import graft.engine.{CompatCoverage, Flow, TuktuCompat}

/** Keeps the COVERAGE.md FQCN tally honest: every name the dispatcher
  * matches in case position must be classified in [[CompatCoverage]]
  * (executes or rejects), and vice versa — a name added to one side
  * without the other fails here, so the tally cannot drift. */
class CompatCoverageSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** FQCN literals in case position of the dispatcher source: `case "x"`,
    * alternation continuations `| "x"`, and grouped `("x"` openings. The
    * `tuktu.ml.processors.` prefix literal (the generic Deserialize rule)
    * is positional, not a concrete name. */
  private def dispatcherNames: Set[String] = {
    val src = new String(Files.readAllBytes(
      Paths.get("src/main/scala/graft/engine/TuktuCompat.scala")))
    val casePos = """(?m)(?:case\s+(?:\w+\s*@\s*)?\(?|^\s*\|\s*)"(tuktu\.[A-Za-z0-9_.]+)"""".r
    casePos.findAllMatchIn(src).map(_.group(1)).toSet - CompatCoverage.mlDeserializePrefix
  }

  test("every dispatcher case name is classified, every classified name dispatched") {
    val inSource = dispatcherNames
    val classified = CompatCoverage.all
    val unclassified = inSource -- classified
    val stale = classified -- inSource
    assert(unclassified.isEmpty, s"dispatcher names missing from CompatCoverage: $unclassified")
    assert(stale.isEmpty, s"CompatCoverage names absent from the dispatcher: $stale")
  }

  test("executes and rejects are disjoint; mode-limited names execute") {
    assert(CompatCoverage.executes.intersect(CompatCoverage.rejects.keySet).isEmpty)
    assert(CompatCoverage.modeLimited.keySet.subsetOf(CompatCoverage.executes))
  }

  test("each by-name rejection throws with porting guidance, not a generic unknown-name error") {
    val df = spark.range(1).toDF("x")
    CompatCoverage.rejects.keys.foreach { fqcn =>
      val node = Flow.Node(id = "r", name = fqcn,
        config = mapper.createObjectNode(), next = Nil, result = "result")
      val e = intercept[Exception](TuktuCompat.processor(df, node))
      assert(e.isInstanceOf[UnsupportedOperationException] ||
        e.isInstanceOf[IllegalArgumentException], s"$fqcn: ${e.getClass}")
      assert(!e.getMessage.contains("unsupported compat processor"),
        s"$fqcn fell through to the generic unknown-name case")
    }
  }
}
