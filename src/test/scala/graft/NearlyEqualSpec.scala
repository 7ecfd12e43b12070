package graft

import org.apache.spark.sql.functions._

/** Native nearly_equal expression: SQL registration via SparkSessionExtensions,
  * interpreted + codegen paths, agreement with the Column-level helper. */
class NearlyEqualSpec extends SparkSpec {
  import spark.implicits._

  test("nearly_equal registered as a SQL function with epsilon semantics") {
    val r = spark.sql(
      """SELECT nearly_equal(0.1 + 0.2, 0.3) AS a,
                nearly_equal(1.0, 1.0000001) AS b,
                nearly_equal(0.0, -0.0) AS c,
                nearly_equal(CAST(NULL AS DOUBLE), 1.0) AS d""").head
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
    assert(r.getBoolean(2))
    assert(r.isNullAt(3)) // null-intolerant at the expression layer
  }

  test("codegen path over a real column agrees with the Column-level helper") {
    val d = (1 to 1000).map(i => i * 0.01).toDF("v")
    val native = d.filter(expr("nearly_equal(v, 5.0)")).count()
    val column = d.filter(graft.engine.Expr.nearlyEqual(col("v"), lit(5.0))).count()
    assert(native == column && native == 1L)
  }
}
