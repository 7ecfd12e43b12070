package graft

import org.apache.spark.sql.functions._
import graft.engine.Expr

/** Transliteration of the reference's expression-grammar truth tables
  * (test/tuktu/test/api/ParsingTests.scala) against the Column compiler. */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (null.asInstanceOf[String], 1.723e3, -182, "myString", "String", "string",
      Seq("1", "2"), "", Seq.empty[String])
  ).toDF("nul", "d", "i", "s", "sub1", "sub2", "arr", "emptyS", "emptyA")

  private def evalBool(e: String): Boolean =
    df.select(Expr.predicate(df, e).as("r")).head.getBoolean(0)
  private def evalNum(e: String): Double =
    df.select(Expr.arithmetic(df, e).cast("double").as("r")).head.getDouble(0)

  test("arithmetic: numbers incl scientific notation") {
    assert(evalNum("1e3") == 1e3)
    assert(evalNum("17.3") == 17.3)
    assert(evalNum("-1.7e-2") == -1.7e-2)
    assert(evalNum(".7e2") == .7e2)
  }

  test("arithmetic: operation and bracket order") {
    assert(evalNum("17 + 23 + 18") == 58)
    assert(evalNum("1.7e2 - 1.8e1 * 2 + 12") == 1.7e2 - 1.8e1 * 2 + 12)
    assert(evalNum("3 + 3 * 3 ^ 3") == 3 + 3 * math.pow(3, 3))
    assert(evalNum("2 + 2 * 2 ^ 2 ^ 3") == 514) // right-assoc pow
    assert(evalNum("-2^3") == -8)
    assert(evalNum("17 + (1.7e2 - 1.8e1) * (2 + 7) - 23") == 17 + (1.7e2 - 1.8e1) * (2 + 7) - 23)
    assert(evalNum("((17)) + ((1.7e2 - 1.8e1) * (2 + 7) - (23))") == 1362.0)
  }

  test("arithmetic: scalar functions") {
    assert(evalNum(" abs ( -0.5 ) ") == 0.5)
    assert(evalNum(" floor ( -0.5 ) ") == -1.0)
    assert(evalNum(" ceil ( -0.5 ) ") == 0.0)
    assert(evalNum(" sqrt ( abs( -0.5 ) ) ") == math.sqrt(0.5))
    assert(evalNum(" exp ( - (1 - 2) ^ 2 ) ") == math.exp(-1))
    assert(evalNum("tanh(0.5)") == math.tanh(0.5))
  }

  test("arithmetic: aggregates over a field (group context)") {
    val data = Seq(1.0, 2.0, 3.0, 4.0).toDF("a")
    def agg(e: String): Double =
      data.agg(Expr.aggregate(data, e).cast("double").as("r")).head.getDouble(0)
    assert(agg("17 + min(a)") == 18)
    assert(agg("17 + max(a)") == 21)
    assert(agg("sum(a) * 1.7e1") == 170)
    assert(agg("(avg(a) - 2) * 17") == 8.5)
    assert(agg("count(a) * 2") == 8)
    assert(agg("median(a)") == 2.5)
    assert(agg("stdev(a)") == math.sqrt(1.25)) // population stdev
    assert(agg("distinct(a)") == 4)
  }

  test("predicate: literals, negation, priority") {
    assert(evalBool("true"))
    assert(!evalBool("!true"))
    assert(evalBool("!!true"))
    assert(!evalBool("!!!(!!(!!true))"))
    assert(!evalBool("true && false"))
    assert(evalBool("true && !false"))
    assert(evalBool("true || false && false"))   // && binds tighter
    assert(!evalBool("(true || false) && false"))
    assert(evalBool("(true && false == false)"))
  }

  test("predicate: epsilon number comparisons (nearlyEqual)") {
    assert(evalBool("1.7e1 == 17"))
    assert(evalBool(".2 + .1 == .3"))
    assert(evalBool(".2 + .1 <= .3"))
    assert(evalBool(".2 + .1 >= .3"))
    assert(!evalBool(".2 + .1 > .3"))
    assert(!evalBool(".2 + .1 < .3"))
    assert(!evalBool(".2 + .1 != .3"))
    assert(evalBool(".0 == -0"))
    assert(evalBool("-.1 / .3 + 0.333333333333333333 == .1 / -.3 + 0.333333333333333333"))
  }

  test("predicate: string comparisons and functions") {
    assert(evalBool(""""AbS" == "AbS""""))
    assert(evalBool(""""AbS" != "Abs""""))
    assert(!evalBool("""!("ABS" != "abs")"""))
    assert(evalBool("""toUpperCase("abc") == "ABC""""))
    assert(evalBool("""toLowerCase(toLowerCase(toUpperCase("AbC"))) == "abc""""))
  }

  test("predicate: null comparison table") {
    assert(!evalBool(""""ABC" == null"""))
    assert(!evalBool("null != null"))
    assert(evalBool("${nul} == null"))
    assert(evalBool("${nul} == ${nul}"))      // null == null → true
    assert(evalBool("${nul} <= ${nul}"))
    assert(!evalBool("${nul} < ${nul}"))
    assert(!evalBool("${nul} == ${d}"))       // one-sided null → false
    assert(evalBool("${nul} != ${d}"))        // != with null → true
  }

  test("predicate: boolean field functions (string args are field paths)") {
    assert(evalBool("""isNull("nul")"""))
    assert(!evalBool("""isNull("i")"""))
    assert(evalBool("""isNumeric("d") && isNumeric("i")"""))
    assert(!evalBool("""isNumeric("s")"""))
    assert(evalBool("""containsFields("d", "i", "s")"""))
    assert(!evalBool("""containsFields("d", "nul")""")) // null field = absent
    assert(evalBool("""containsSubstring("myString", "String")"""))
    assert(!evalBool("""containsSubstring("myString", "string")"""))
    assert(evalBool("""containsSubstring(toLowerCase(${s}), toLowerCase(${sub1}), toLowerCase(${sub2}))"""))
    assert(evalBool("""isEmptyValue("emptyS") && isEmptyValue("emptyA")"""))
    assert(!evalBool("""isEmptyValue("s")"""))
    assert(evalBool("""size("s") == 8"""))
    assert(evalBool("""size("arr") == 2"""))
  }

  test("predicate: interpolated fields and in") {
    assert(evalBool("${d} == 1.723e3 && ${i} == -182"))
    assert(evalBool("toLowerCase(${sub1}) == toLowerCase(${sub2})"))
    assert(evalBool("${emptyS} == ${emptyS}"))
    assert(evalBool("""${sub1} in ${s}"""))   // substring containment
    assert(!evalBool("""${sub2} in ${s}"""))
    assert(evalBool(""""1" in ${arr}"""))     // array membership
    assert(!evalBool(""""3" in ${arr}"""))
  }

  test("string-grammar functions: SplitGet and capitalize") {
    // ref utils.scala SplitGet: rv.split(splitChar)(splitIndex) — 0-based,
    // separator is a regex
    assert(evalBool("""SplitGet(${s}, "Str", 0) == "my""""))
    assert(evalBool("""SplitGet("a;b;c", ";", 1) == "b""""))
    assert(evalBool("""SplitGet("a1b22c", "[0-9]+", 2) == "c""""))
    // GetOrNull: present value renders as string; absent -> "null"
    // (ref utils.scala:123-127)
    assert(evalBool("""GetOrNull(${s}) == "myString""""))
    assert(evalBool("""GetOrNull(${nul}) == "null""""))
    assert(evalBool("""GetOrNull(${i}) == "-182""""))
    // SQL: strings quoted with '' doubling, numbers verbatim, null -> NULL
    // (ref utils.scala:97-106)
    assert(evalBool("""SQL(${s}) == "'myString'""""))
    assert(evalBool("""SQL("it's") == "'it''s'""""))
    assert(evalBool("""SQL(${nul}) == "NULL""""))
    assert(evalBool("""SQL(${i}) == "-182""""))
    assert(evalBool("""capitalize("hello world") == "Hello world""""))
  }

  test("SQL() string escaping matches commons-lang escapeJava (ref utils.scala:103)") {
    val samples = Seq(
      "plain", "it's", "say \"hi\"", "tab\there", "line\nbreak\rcr", "back\\slash",
      "bellbs\bff\f", "café résumé", "中文࿿x",
      "emoji 😀 end", "")
    val d2 = samples.toDF("t")
    val got = d2.select(Expr.escapeJavaSql(col("t"))).collect().map(_.getString(0))
    val want = samples.map(s =>
      org.apache.commons.lang.StringEscapeUtils.escapeJava(s.replace("'", "''")))
    got.zip(want).zip(samples).foreach { case ((g, w), s) =>
      assert(g == w, s"for input ${s.getBytes("UTF-8").mkString(",")}")
    }
  }

  test("interpolate: template strings") {
    val out = df.select(Expr.interpolate("v=${i}; s=${s}!").as("r")).head.getString(0)
    assert(out == "v=-182; s=myString!")
  }

  test("capitalize is first-char-only (not initcap)") {
    val d2 = Seq("hello world").toDF("t")
    assert(d2.select(Expr.capitalize(col("t"))).head.getString(0) == "Hello world")
  }
}
