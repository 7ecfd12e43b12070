package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.Expr

/** Property tests: the compiled Column evaluation of random arithmetic
  * expressions equals direct Scala evaluation of the same AST (the reference
  * evaluates on Doubles — SURVEY.md §5 test plan item 4). */
class ExprPropertySpec extends SparkSpec {
  // plain-scalacheck sampling (scalatestplus bridge not on the classpath)
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  import spark.implicits._

  // render + locally evaluate a random arithmetic expression tree
  private sealed trait T
  private case class Leaf(v: Double) extends T
  private case class Node(op: Char, l: T, r: T) extends T
  private case class Un(fn: String, e: T) extends T

  private val leafGen: Gen[T] =
    Gen.chooseNum(-50.0, 50.0).map(v => Leaf(math.rint(v * 100) / 100))
  private def treeGen(depth: Int): Gen[T] =
    if (depth == 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      3 -> (for {
        op <- Gen.oneOf('+', '-', '*')
        l <- treeGen(depth - 1); r <- treeGen(depth - 1)
      } yield Node(op, l, r)),
      1 -> (for {
        fn <- Gen.oneOf("abs", "floor", "ceil")
        e <- treeGen(depth - 1)
      } yield Un(fn, e)))

  private def render(t: T): String = t match {
    case Leaf(v)       => if (v < 0) s"($v)" else v.toString
    case Node(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case Un(fn, e)     => s"$fn(${render(e)})"
  }
  private def evalLocal(t: T): Double = t match {
    case Leaf(v) => v
    case Node('+', l, r) => evalLocal(l) + evalLocal(r)
    case Node('-', l, r) => evalLocal(l) - evalLocal(r)
    case Node('*', l, r) => evalLocal(l) * evalLocal(r)
    case Node(_, _, _)   => sys.error("unreachable")
    case Un("abs", e)    => math.abs(evalLocal(e))
    case Un("floor", e)  => math.floor(evalLocal(e))
    case Un("ceil", e)   => math.ceil(evalLocal(e))
    case Un(_, _)        => sys.error("unreachable")
  }

  private lazy val one = Seq(1).toDF("x")

  test("compiled arithmetic equals local evaluation on random expressions") {
    for (t <- samples(treeGen(4), 60)) {
      val expected = evalLocal(t)
      val actual = one.select(Expr.arithmetic(one, render(t)).cast("double")).head.getDouble(0)
      assert(actual == expected, s"expr ${render(t)}")
    }
  }

  test("predicate comparisons agree with double semantics on random pairs") {
    val pairGen = for {
      a <- Gen.chooseNum(-10.0, 10.0); b <- Gen.chooseNum(-10.0, 10.0)
    } yield (a, b)
    for ((a, b) <- samples(pairGen, 40)) {
      def p(s: String): Boolean =
        one.select(Expr.predicate(one, s)).head.getBoolean(0)
      val (sa, sb) = (s"($a)", s"($b)")
      assert(p(s"$sa < $sb || $sa >= $sb")) // totality
      assert(p(s"$sa == $sa"))              // reflexivity
      assert(p(s"$sa <= $sb") == (a < b || graft.plans.NearlyEqual.compute(a, b)))
      assert(p(s"$sa > $sb") == (a > b && !graft.plans.NearlyEqual.compute(a, b)))
    }
  }

  test("escapeJavaSql matches commons-lang escapeJava on random unicode strings") {
    val charGen = Gen.frequency(
      5 -> Gen.asciiPrintableChar,
      2 -> Gen.oneOf('\'', '"', '\\', '\n', '\t', '\r', '\b', '\f'),
      2 -> Gen.choose(0x00a0.toChar, 0x2fff.toChar),
      1 -> Gen.choose(0.toChar, 0x1f.toChar))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val inputs = samples(strGen, 200)
    val df = inputs.toDF("t")
    val got = df.select(Expr.escapeJavaSql(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0))
    inputs.zip(got).foreach { case (in, g) =>
      val want = org.apache.commons.lang.StringEscapeUtils.escapeJava(in.replace("'", "''"))
      assert(g == want, s"for ${in.map(_.toInt).mkString(",")}")
    }
  }
}
