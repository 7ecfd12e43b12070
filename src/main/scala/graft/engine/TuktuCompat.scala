package graft.engine

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/**
 * Compatibility layer: executes flow nodes whose `name` is a reference FQCN
 * (e.g. `tuktu.processors.FieldFilterProcessor`) with the reference's OWN
 * config schema, adapted onto the operator library — so existing flow
 * configs run unchanged through [[Flow]]. Config schemas transcribed from
 * the reference documentation (the documentation/processors .json.md files) and test
 * corpus (test/tuktu/test/processor/tests/BaseProcessorTestSuite.scala).
 */
object TuktuCompat {

  private def arr(n: JsonNode, k: String): Seq[JsonNode] =
    Option(n.get(k)).map(_.elements().asScala.toSeq).getOrElse(Nil)
  private def str(n: JsonNode, k: String): Option[String] = Option(n.get(k)).map(_.asText)
  private def pathOf(n: JsonNode): String =
    n.get("path").elements().asScala.map(_.asText).mkString(".")

  def isCompat(name: String): Boolean = name.startsWith("tuktu.")

  // ---------------------------------------------------------------- generators
  def generator(spark: SparkSession, node: Flow.Node): DataFrame = {
    val c = node.config
    node.name match {
      // ref: app/tuktu/generators/DummyGenerator.scala:120-139
      case "tuktu.generators.ListGenerator" =>
        import spark.implicits._
        arr(c, "values").map(_.asText).toDF(node.result)
      // ref: DummyGenerator.scala:34-86 (batch mode)
      case "tuktu.generators.DummyGenerator" =>
        val n = Option(c.get("max_amount")).map(_.asLong).getOrElse(1L)
        val v = str(c, "message").orElse(str(c, "value")).getOrElse("")
        spark.range(n).select(lit(v).as(node.result))
      case other => throw new IllegalArgumentException(s"unsupported compat generator: $other")
    }
  }

  // ---------------------------------------------------------------- processors
  def processor(df: DataFrame, node: Flow.Node): DataFrame = {
    val c = node.config
    node.name match {
      // ref: BaseProcessors.scala:120 — {fields:[{path:[...], result, default?}]}
      case "tuktu.processors.FieldFilterProcessor" =>
        df.select(arr(c, "fields").map { f =>
          val p = pathOf(f)
          val out = f.get("result").asText
          Option(f.get("default")) match {
            case Some(d) if df.columns.contains(p.split('.').head) =>
              coalesce(col(p), lit(d.asText)).alias(out)
            case Some(d) => lit(d.asText).alias(out) // path absent entirely
            case None    => col(p).alias(out)
          }
        }: _*)

      // ref: BaseProcessors.scala:144 — {fields:["k1","k2"]}
      case "tuktu.processors.FieldRemoveProcessor" =>
        df.drop(arr(c, "fields").map(_.asText): _*)

      // ref: BaseProcessors.scala:160 — {fields:[{path:[...], result}]}
      case "tuktu.processors.FieldCopyProcessor" =>
        arr(c, "fields").foldLeft(df) { (d, f) =>
          d.withColumn(f.get("result").asText, col(pathOf(f)))
        }

      // ref: BaseProcessors.scala:574 — {value, is_numeric?} + node result
      case "tuktu.processors.FieldConstantAdderProcessor" =>
        val v = Expr.interpolate(str(c, "value").getOrElse(""))
        df.withColumn(node.result,
          if (Option(c.get("is_numeric")).exists(_.asBoolean)) v.cast(LongType) else v)

      // ref: BaseProcessors.scala:213 — {field, sources:[regex], targets:[str]};
      // writes the replaced value to the node's result field (per test corpus)
      case "tuktu.processors.ReplaceProcessor" =>
        val field = str(c, "field").get
        val pairs = arr(c, "sources").map(_.asText).zip(arr(c, "targets").map(_.asText))
        df.withColumn(node.result,
          pairs.foldLeft(col(field)) { case (e, (s, t)) => regexp_replace(e, s, t) })

      // ref: BaseProcessors.scala:184 — {step_size?} ; numbering in input order
      // (= current layout order: partition order, then row order within)
      case "tuktu.processors.RunningCountProcessor" =>
        val step = Option(c.get("step_size")).map(_.asLong).getOrElse(1L)
        Ops.indexByLayout(df, node.result)
          .withColumn(node.result, col(node.result) * step)

      // ref: BaseProcessors.scala:374 — {type: simple|negate, expression}
      case "tuktu.processors.PacketFilterProcessor" =>
        val pred = Expr.predicate(df, str(c, "expression").get)
        df.filter(if (str(c, "type").contains("negate")) !pred else pred)

      // ref: BaseProcessors.scala:501 — {expressions:[{type, and_or, expression, field}]}
      // Top level is expressions.exists(...): a pure OR over the entries.
      // and_or only combines a NESTED sub-expression array (expression: [...]).
      case "tuktu.processors.PacketRegexFilterProcessor" =>
        def build(e: JsonNode): Column =
          if (e.get("expression").isArray) {
            // ref BaseProcessors.scala:501 ignores `type:negate` on nested
            // expression arrays — negate applies to string leaves only.
            val children = e.get("expression").elements().asScala.toSeq.map(build)
            if (str(e, "and_or").contains("or")) children.reduceOption(_ || _).getOrElse(lit(false))
            else children.reduceOption(_ && _).getOrElse(lit(true))
          } else {
            val leaf = col(e.get("field").asText).rlike(e.get("expression").asText)
            if (str(e, "type").contains("negate")) !leaf else leaf
          }
        val cond = arr(c, "expressions").map(build).reduceOption(_ || _).getOrElse(lit(true))
        df.filter(cond)

      case other => throw new IllegalArgumentException(s"unsupported compat processor: $other")
    }
  }
}
