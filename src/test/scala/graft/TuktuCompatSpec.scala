package graft

import java.nio.file.{Files, Paths}
import graft.engine.Flow

/** Verbatim reference configs through the compat layer — including the
  * reference's own configs/flowtests/dummy.json and config JSONs
  * transcribed from its processor test corpus. */
class TuktuCompatSpec extends SparkSpec {
  import spark.implicits._

  test("the reference's dummy.json flow config runs verbatim") {
    val json = new String(Files.readAllBytes(
      Paths.get("/root/reference/configs/flowtests/dummy.json")))
    val out = Flow.run(spark, json)
    val df = out.values.head
    assert(df.columns.toSeq == Seq("test"))
    assert(df.select("test").as[String].collect().toSeq == Seq("test"))
  }

  test("FieldFilterProcessor with reference config schema (path/result/default)") {
    val flow = """
    { "generators": [
        {"id": "g", "name": "list", "config": {"rows": [
          {"key1": "val1", "key2": "val2"}, {"key2": "only2"}
        ]}, "next": ["ff"]} ],
      "processors": [
        {"id": "ff", "name": "tuktu.processors.FieldFilterProcessor",
         "result": "result",
         "config": {"fields": [ {"default": "", "path": ["key1"], "result": "res1"} ]},
         "next": []} ] }"""
    val out = Flow.runSingle(spark, flow).orderBy("res1").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("", "val1"))
  }

  test("FieldCopy + FieldRemove + ReplaceProcessor reference schemas chained") {
    val flow = """
    { "generators": [
        {"id": "g", "name": "list", "config": {"rows": [
          {"key1": "val1", "key2": "val2"}
        ]}, "next": ["cp"]} ],
      "processors": [
        {"id": "cp", "name": "tuktu.processors.FieldCopyProcessor",
         "config": {"fields": [ {"path": ["key2"], "result": "key4"} ]}, "next": ["rm"]},
        {"id": "rm", "name": "tuktu.processors.FieldRemoveProcessor",
         "config": {"fields": ["key2"]}, "next": ["rep"]},
        {"id": "rep", "name": "tuktu.processors.ReplaceProcessor", "result": "result",
         "config": {"field": "key1", "sources": ["[0-9]+"], "targets": ["2"]},
         "next": []} ] }"""
    val row = Flow.runSingle(spark, flow).head
    val cols = Flow.runSingle(spark, flow).columns.toSet
    assert(cols == Set("key1", "key4", "result"))
    assert(row.getAs[String]("result") == "val2") // val1 → [0-9]+ → val2
    assert(row.getAs[String]("key4") == "val2")
  }

  test("RunningCountProcessor with step_size in input order") {
    val flow = """
    { "generators": [
        {"id": "g", "name": "tuktu.generators.ListGenerator", "result": "one",
         "config": {"values": ["a", "b", "c"]}, "next": ["rc"]} ],
      "processors": [
        {"id": "rc", "name": "tuktu.processors.RunningCountProcessor",
         "result": "result", "config": {"step_size": 3}, "next": []} ] }"""
    val out = Flow.runSingle(spark, flow).orderBy("result").collect()
    assert(out.map(_.getAs[Long]("result")).toSeq == Seq(0L, 3L, 6L))
  }

  test("PacketRegexFilterProcessor or/and/negate semantics from the test corpus") {
    val rows = """{"rows": [
      {"key1": "een", "key2": "twee"}, {"key1": "half", "key2": "een"}, {"key1": "1", "key2": "2"}
    ]}"""
    def flow(exprs: String) = s"""
    { "generators": [ {"id": "g", "name": "list", "config": $rows, "next": ["f"]} ],
      "processors": [
        {"id": "f", "name": "tuktu.processors.PacketRegexFilterProcessor",
         "config": {"expressions": $exprs}, "next": []} ] }"""
    // two ORs: matches either regex on key1
    val ors = Flow.runSingle(spark, flow(
      """[{"type":"simple","and_or":"or","expression":"[0-9]+","field":"key1"},
         {"type":"simple","and_or":"or","expression":"een","field":"key1"}]"""))
      .select("key1").as[String].collect().toSet
    assert(ors == Set("een", "1"))
    // negate: rows NOT matching
    val negs = Flow.runSingle(spark, flow(
      """[{"type":"negate","and_or":"or","expression":"een","field":"key1"}]"""))
      .select("key1").as[String].collect().toSet
    assert(negs == Set("half", "1"))
    // two default ('and')-typed TOP-LEVEL entries still combine with OR:
    // the reference evaluates expressions.exists(...) at the top level
    // (BaseProcessors.scala:501); and_or only applies to NESTED arrays
    val topOr = Flow.runSingle(spark, flow(
      """[{"type":"simple","and_or":"and","expression":"[0-9]+","field":"key1"},
         {"type":"simple","and_or":"and","expression":"een","field":"key1"}]"""))
      .select("key1").as[String].collect().toSet
    assert(topOr == Set("een", "1"))
    // nested sub-expression array combined with and_or=and
    val nestedAnd = Flow.runSingle(spark, flow(
      """[{"type":"simple","and_or":"and","expression":
            [{"type":"simple","expression":"een","field":"key1"},
             {"type":"simple","expression":"twee","field":"key2"}],
          "field":""}]"""))
      .select("key1").as[String].collect().toSet
    assert(nestedAnd == Set("een"))
  }
}
