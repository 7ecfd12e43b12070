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

  test("the COVERAGE.md round-list tally equals the declared query ledger") {
    // the r13/r14 off-by-one class: a query shipped in SparkEntry.queries
    // but dropped from (or double-counted in) the COVERAGE.md round list
    // must fail here, not in round review. The list's contract: tallies
    // are non-decreasing, each entry's closing "A → B" lands on B = its
    // declared tally and chains from the previous arrow's target, and the
    // final tally IS the query ledger.
    val md = new String(Files.readAllBytes(Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val decl = """(?m)^r\d+(?:-tail)? = (\d+) \(""".r
      .findAllMatchIn(md).map(_.group(1).toInt).toSeq
    assert(decl.nonEmpty, "COVERAGE.md round list not found")
    assert(decl == decl.sorted, s"round tallies must be non-decreasing: $decl")
    assert(decl.last == SparkEntry.queries.size,
      s"COVERAGE.md final tally ${decl.last} != SparkEntry.queries.size " +
        s"${SparkEntry.queries.size} — update the round list")
    // U+2192 built from the codepoint: the md is UTF-8, and a literal
    // arrow in the source is hostage to the compiler's -encoding flag
    val arrows = ("""(\d+) """ + "\u2192" + """ (\d+)\)[,.]""").r
      .findAllMatchIn(md).map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(arrows.nonEmpty, "round-list arrow tallies not found")
    arrows.zip(arrows.tail).foreach { case ((_, b), (a2, _)) =>
      assert(b == a2, s"round-list arrow chain broken: … → $b then $a2 → …")
    }
    assert(arrows.last._2 == decl.last,
      s"last arrow lands on ${arrows.last._2}, declared tally ${decl.last}")
    // every declared query carries its DuckDB oracle (the "0 rows-only"
    // status the ledger reports)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"queries without oracle: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}; " +
        s"stale oracles: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
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
