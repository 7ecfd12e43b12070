package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Fixed-point PageRank behavior on known graphs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  test("pageRank: star graph concentrates rank on the hub") {
    // 4 spokes each link only to the hub; hub links back to every spoke
    val edges = (Seq(("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d")) ++
      Seq("a", "b", "c", "d").map(sp => (sp, "hub"))).map { case (s0, d0) => (s0, d0, 1L) }
      .toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w", iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("hub") > pr("a") * 2, s"hub must dominate: $pr")
    assert(Seq("a", "b", "c", "d").map(pr).distinct.size == 1,
      "spokes are symmetric, ranks must be identical integers")
    // mass conservation up to integer-truncation dust (< 1 ulp per node per
    // iteration plus the teleport rounding): within 100 units of S here
    val total = pr.values.sum
    assert(S - total >= 0 && S - total < 100, s"mass: $total")
  }

  test("pageRank: directed cycle is exactly uniform") {
    val nodes = Seq("n0", "n1", "n2", "n3", "n4")
    val edges = nodes.zip(nodes.tail :+ nodes.head)
      .map { case (s0, d0) => (s0, d0, 1L) }.toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w", iters = 7)
      .collect().map(r => r.getLong(1)).toSet
    assert(pr.size == 1, s"cycle ranks must be one integer value: $pr")
  }

  test("pageRank: edge weights steer contribution proportionally") {
    // b receives a 3x-weighted edge from a; c a 1x edge. After 1 iteration,
    // b's contribution share is exactly 3/4 of a's mass (integer div).
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r0 = S / 3 // uniform start over 3 nodes
    val expB = (S * 15 / 100) / 3 + 85L * ((r0 * 3) / 4) / 100
    val expC = (S * 15 / 100) / 3 + 85L * ((r0 * 1) / 4) / 100
    assert(pr("b") == expB && pr("c") == expC, s"$pr")
  }

  test("hits: pure hub and pure authority separate") {
    // h1, h2 both point at authority x; x points nowhere else; a stray
    // edge y -> h1 keeps every node in both score vectors
    val edges = Seq(("h1", "x", 1L), ("h2", "x", 1L), ("y", "h1", 1L))
      .toDF("src", "dst", "w")
    val out = Graph.hits(edges, "src", "dst", "w", iters = 3, scale = 1000000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (hubs, auths) = (out.map { case (k, v) => k -> v._1 },
      out.map { case (k, v) => k -> v._2 })
    // x is the dominant authority and a zero hub (no out-edges)
    assert(auths("x") > auths("h1") && auths("x") > auths("h2"), s"$auths")
    assert(hubs("x") == 0L)
    // h1 and h2 are the dominant hubs; both point only at x with equal
    // weight, but y's endorsement of h1 does not change h1's HUB score
    // (hub depends on out-edges), so they stay exactly equal
    assert(hubs("h1") == hubs("h2") && hubs("h1") > hubs("y"), s"$hubs")
  }

  test("hits: L1 normalization conserves scaled mass up to truncation") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 3L),
      ("a", "c", 1L)).toDF("src", "dst", "w")
    val out = Graph.hits(edges, "src", "dst", "w", iters = 4).collect()
    val hubSum = out.map(_.getLong(1)).sum
    val authSum = out.map(_.getLong(2)).sum
    assert(1000000L - hubSum >= 0 && 1000000L - hubSum < out.length,
      s"hub mass $hubSum")
    assert(1000000L - authSum >= 0 && 1000000L - authSum < out.length,
      s"auth mass $authSum")
  }

  test("hits: rejects scale below the node count instead of nulling scores") {
    // 4 nodes with scale=2: the uniform init `scale div n` is 0 for every
    // node, which zeroed the first L1 total and nulled every score under
    // the normalizing div; the guard now fails fast with guidance
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("d", "a", 1L)).toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException] {
      Graph.hits(edges, "src", "dst", "w", iters = 3, scale = 2L).collect()
    }
    assert(ex.getMessage.contains("node count"))
    // scale == n is the boundary the guard admits, and it stays non-null
    val out = Graph.hits(edges, "src", "dst", "w", iters = 3, scale = 4L)
      .collect()
    assert(out.length == 4 && out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("hits: empty edge set yields an empty result, not a driver crash") {
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(Graph.hits(empty, "src", "dst", "w", iters = 3).collect().isEmpty)
  }

  test("triangles: counts K4 exactly and zeros the pendant") {
    // complete graph on {a,b,c,d} has C(4,3)=4 triangles, 3 per node;
    // pendant p-a sits in none. Direction/duplicates must not matter.
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d", "p" -> "a", "b" -> "a" /* dup, reversed */)
    val edges = k4.map { case (s0, d0) => (s0, d0) }.toDF("src", "dst")
    val out = Graph.triangles(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("a", "b", "c", "d").forall(out(_) == 3L), s"$out")
    assert(out("p") == 0L)
  }

  test("triangles: triangle-free bipartite graph counts zero everywhere") {
    val edges = (for { l <- Seq("l1", "l2"); r <- Seq("r1", "r2", "r3") }
      yield (l, r)).toDF("src", "dst")
    val out = Graph.triangles(edges, "src", "dst").collect()
    assert(out.length == 5 && out.forall(_.getLong(1) == 0L))
  }
}
