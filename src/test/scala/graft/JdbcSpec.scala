package graft

import java.nio.file.Files
import graft.sources.{Sinks, Sources}

/** SQLGenerator / SQLProcessor against a REAL embedded database: Derby ships
  * with Spark (hive-metastore dependency), so the JDBC write → read round
  * trip and partitioned parallel reads are exercised end-to-end, not
  * pattern-only. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbc sink → source round-trip (SQLProcessor ⇄ SQLGenerator)") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    Sinks.jdbc(df, url, "t_round", mode = "overwrite")
    val back = Sources.jdbc(spark, url, "t_round")
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("partitioned parallel jdbc read splits the key range across tasks") {
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "v")
    Sinks.jdbc(df, url, "t_part", mode = "overwrite")
    val back = Sources.jdbc(spark, url, "t_part",
      partitionColumn = Some("id"), lowerBound = 1, upperBound = 101, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4) // the scan itself is parallel
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 5050L)
  }

  test("SQLGenerator FQCN runs a query config against the database") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    Sinks.jdbc(df, url, "t_gen", mode = "overwrite")
    val flow = s"""
    { "generators": [
        {"id": "g", "name": "tuktu.nosql.generators.SQLGenerator",
         "config": {"url": "$url", "user": "", "password": "",
           "driver": "org.apache.derby.jdbc.EmbeddedDriver",
           "query": "SELECT \\"id\\", \\"v\\" FROM t_gen WHERE \\"id\\" > 1"},
         "next": []} ] }"""
    val out = graft.engine.Flow.run(spark, flow).values.head
      .orderBy("ID").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((2L, "y"), (3L, "z")))
  }
}
