package graft

import graft.ml.{HMM, HmmModel}

/** HMM train/decode: supervised fit recovers planted dynamics; Viterbi
  * decodes the generating states; likelihood ranks typical > atypical. */
class HMMSpec extends SparkSpec {
  import spark.implicits._

  // two states with distinct emissions: state0 → symbol 0/1, state1 → 2/3
  private def genSeq(seed: Int, len: Int): Seq[(Int, Int)] = {
    val rnd = new scala.util.Random(seed)
    var s = 0
    (0 until len).map { _ =>
      s = if (rnd.nextDouble() < 0.85) s else 1 - s
      val sym = (if (s == 0) 0 else 2) + (if (rnd.nextDouble() < 0.9) 0 else 1)
      (s, sym)
    }
  }

  private lazy val train = (0 until 20).flatMap { i =>
    genSeq(i, 50).zipWithIndex.map { case ((s, o), t) => (i.toLong, t.toLong, s, o) }
  }.toDF("seq", "t", "state", "symbol")

  private lazy val model: HmmModel =
    HMM.fitSupervised(train, "seq", "t", "state", "symbol", nStates = 2, nSymbols = 4)

  test("supervised fit recovers the planted transition structure") {
    // self-transitions dominate (0.85 stay probability)
    assert(math.exp(model.a(0)(0)) > 0.7 && math.exp(model.a(1)(1)) > 0.7)
    // state 0 emits symbols {0,1}, state 1 emits {2,3}
    assert(math.exp(model.b(0)(0)) + math.exp(model.b(0)(1)) > 0.95)
    assert(math.exp(model.b(1)(2)) + math.exp(model.b(1)(3)) > 0.95)
  }

  test("distributed Viterbi decode recovers most generating states") {
    implicit val s = spark
    val test = genSeq(99, 60).zipWithIndex.map { case ((st, o), t) => (0L, t.toLong, st, o) }
    val df = test.toDF("seq", "t", "state", "symbol")
    val out = HMM.decodeAll(df, "seq", "t", "symbol", model).head
    val decoded = out.getSeq[Int](1)
    val truth = test.map(_._3)
    val acc = decoded.zip(truth).count { case (a, b) => a == b } / truth.size.toDouble
    assert(acc >= 0.85, s"accuracy $acc")
  }

  test("likelihood ranks a typical sequence above a shuffled one") {
    val typical = genSeq(7, 40).map(_._2)
    val shuffled = new scala.util.Random(3).shuffle(typical)
    assert(model.logLikelihood(typical) > model.logLikelihood(shuffled))
  }
}
