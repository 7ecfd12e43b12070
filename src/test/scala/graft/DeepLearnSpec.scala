package graft

import graft.ml.DeepLearn
import graft.ml.DeepLearn._
import org.apache.spark.sql.functions._

/** Seeded deep-learning family (ref modules/deeplearn): reference
  * construction contracts (seed streams, integer-division init, tied
  * weights), training behavior on planted data, the spark.ml MLP scale
  * path, and the quantized distributed forward pass. */
class DeepLearnSpec extends SparkSpec {
  import spark.implicits._

  // planted two-class binary data, Sugomori-demo shaped: class 0 lights
  // the low half, class 1 the high half, one noisy bit each
  private val nIn = 20
  private def vec(half: Int, noise: Int): Array[Int] =
    Array.tabulate(nIn) { j =>
      val on = if (half == 0) j < nIn / 2 else j >= nIn / 2
      if (j == noise) (if (on) 0 else 1) else if (on) 1 else 0
    }
  private val trainX: Array[Array[Int]] =
    (0 until 8).map(i => vec(0, i)).toArray ++ (0 until 8).map(i => vec(1, nIn / 2 + i))
  private val trainY: Array[Array[Int]] =
    (Array.fill(8)(Array(1, 0)) ++ Array.fill(8)(Array(0, 1)))

  test("standalone autoencoder/RBM keep the reference init contract: zero weights, draws consumed") {
    // `1 / n_visible` is INTEGER division in the reference (dA.scala:24,
    // RBM.scala:24): scale 0 for n_visible > 1, yet one uniform is drawn
    // per cell — the rng position after construction proves both halves
    val rng = new NetRng(1234L)
    val da = Autoencoder(5, 3, rng)
    assert(da.w.flatten.forall(_ == 0.0))
    assert(da.hbias.forall(_ == 0.0) && da.vbias.forall(_ == 0.0))
    // a fresh stream advanced by exactly 3*5 draws must now agree
    val ref = new java.util.Random(1234L)
    (0 until 15).foreach(_ => ref.nextDouble())
    assert(rng.uniform(0, 1) == ref.nextDouble())

    val rng2 = new NetRng(1234L)
    val rbm = Rbm(4, 2, rng2)
    assert(rbm.w.flatten.forall(_ == 0.0))
    val ref2 = new java.util.Random(1234L)
    (0 until 8).foreach(_ => ref2.nextDouble())
    assert(rng2.uniform(0, 1) == ref2.nextDouble())

    // n_visible = 1 is the one standalone case with a live scale (a = 1)
    val rng3 = new NetRng(1234L)
    val da1 = Autoencoder(1, 2, rng3)
    val ref3 = new java.util.Random(1234L)
    assert(da1.w(0)(0) == ref3.nextDouble() * 2 - 1)
    assert(da1.w(1)(0) == ref3.nextDouble() * 2 - 1)
  }

  test("stacked construction ties pretrainer weights to the sigmoid layers") {
    val sda = new StackedDenoisingAutoencoder(nIn, Seq(12, 8), 2)
    assert(sda.autoencoders(0).w eq sda.layers(0).w)
    assert(sda.autoencoders(1).hbias eq sda.layers(1).b)
    // stack layers use the REAL-division 1.0/nIn scale: weights nonzero
    assert(sda.layers(0).w.flatten.exists(_ != 0.0))
    assert(sda.layers(0).w.flatten.forall(w => math.abs(w) <= 1.0 / nIn))
    val dbn = new DeepBeliefNet(nIn, Seq(12, 8), 2)
    assert(dbn.rbms(0).w eq dbn.layers(0).w)
    // same seed → same stream → same first-layer weights across net kinds
    assert(dbn.layers(0).w.flatten.toSeq == sda.layers(0).w.flatten.toSeq)
  }

  test("binomial guard: out-of-range p returns 0 without consuming a draw") {
    val a = new NetRng(7L)
    val b = new NetRng(7L)
    assert(a.bernoulli(1.5) == 0 && a.bernoulli(-0.1) == 0)
    assert(a.uniform(0, 1) == b.uniform(0, 1)) // streams still aligned
  }

  test("denoising autoencoder training reduces reconstruction error on planted patterns") {
    def err(m: Autoencoder): Double =
      trainX.map { x =>
        val z = m.reconstruct(x)
        x.indices.map(i => math.abs(x(i) - z(i))).sum
      }.sum
    val rng = new NetRng(1234L)
    val layer = new SigmoidLayer(nIn, 8, rng) // real-division init
    val da = Autoencoder.tied(layer)
    val before = err(da)
    for (_ <- 0 until 60; x <- trainX) da.trainStep(x, 0.1, 0.3, trainX.length, rng)
    val after = err(da)
    assert(after < before * 0.7, s"before=$before after=$after")
  }

  test("RBM CD-1 training reduces reconstruction error on planted patterns") {
    def err(m: Rbm): Double =
      trainX.map { x =>
        val z = m.reconstruct(x)
        x.indices.map(i => math.abs(x(i) - z(i))).sum
      }.sum
    val rng = new NetRng(1234L)
    val layer = new SigmoidLayer(nIn, 8, rng)
    val rbm = Rbm.tied(layer)
    val before = err(rbm)
    for (_ <- 0 until 60; x <- trainX) rbm.cdStep(x, 0.1, k = 1, trainX.length, rng)
    val after = err(rbm)
    assert(after < before * 0.7, s"before=$before after=$after")
  }

  test("SdA pretrain+finetune recovers the planted classes; runs are seed-deterministic") {
    def trained(): StackedDenoisingAutoencoder = {
      val net = new StackedDenoisingAutoencoder(nIn, Seq(12, 8), 2)
      net.pretrain(trainX, lr = 0.1, epochs = 30)
      net.finetune(trainX, trainY, lr = 0.1, epochs = 120)
      net
    }
    val net = trained()
    val preds = trainX.map(net.predictClass)
    assert(preds.take(8).forall(_ == 0) && preds.drop(8).forall(_ == 1),
      preds.mkString(","))
    // unseen noisy variants classify too
    assert(net.predictClass(vec(0, 3)) == 0 && net.predictClass(vec(1, nIn - 1)) == 1)
    // same seed, same stream, same numbers
    val again = trained()
    assert(net.predict(trainX(0)).toSeq == again.predict(trainX(0)).toSeq)
    // softmax output is a distribution
    val p = net.predict(trainX(0))
    assert(math.abs(p.sum - 1.0) < 1e-12 && p.forall(_ >= 0))
  }

  test("DBN pretrain+finetune recovers the canonical demo classes") {
    // the canonical public DBN demo setup (Sugomori's test data, the
    // de-facto behavior check for the reference's transcription): 6-dim
    // two-cluster inputs, [3,3] hidden, CD-1, long greedy pretraining
    val xs: Array[Array[Int]] = Array(
      Array(1, 1, 1, 0, 0, 0), Array(1, 0, 1, 0, 0, 0), Array(1, 1, 1, 0, 0, 0),
      Array(0, 0, 1, 1, 1, 0), Array(0, 0, 1, 1, 0, 0), Array(0, 0, 1, 1, 1, 0))
    val ys: Array[Array[Int]] = Array(
      Array(1, 0), Array(1, 0), Array(1, 0), Array(0, 1), Array(0, 1), Array(0, 1))
    val net = new DeepBeliefNet(6, Seq(3, 3), 2, cdK = 1)
    net.pretrain(xs, lr = 0.1, epochs = 1000)
    net.finetune(xs, ys, lr = 0.1, epochs = 500)
    val preds = xs.map(net.predictClass)
    assert(preds.take(3).forall(_ == 0) && preds.drop(3).forall(_ == 1),
      preds.mkString(","))
    // held-out probes from the demo
    assert(net.predictClass(Array(1, 1, 0, 0, 0, 0)) == 0)
    assert(net.predictClass(Array(0, 0, 0, 1, 1, 0)) == 1)
  }

  test("softmax head matches the reference's zero-floored max shift") {
    val head = new SoftmaxHead(2, 3)
    // all-zero weights → uniform distribution
    assert(head.predict(Array(1.0, 2.0)).toSeq == Seq(1.0 / 3, 1.0 / 3, 1.0 / 3))
    // the reference max starts at 0.0, so all-negative logits shift by 0
    val z = Array(-1.0, -2.0, -3.0)
    val e = z.map(math.exp)
    val want = e.map(_ / e.sum).toSeq
    assert(head.softmax(z).toSeq == want)
  }

  test("spark.ml MLP classifier is the distributed supervised path") {
    val rows = trainX.zipWithIndex.map { case (x, i) =>
      (x.map(_.toDouble).toSeq, if (i < 8) 0 else 1)
    }.toSeq
    val df = rows.toDF("features", "label")
    val m = DeepLearn.mlpClassifier(df, "features", "label",
      layers = Array(nIn, 8, 2), maxIter = 60)
    val preds = DeepLearn.mlpPredict(m, df, "features", "pred")
      .select("label", "pred").as[(Int, Double)].collect()
    assert(preds.forall { case (l, p) => p == l.toDouble }, preds.mkString(","))
  }

  test("quantizedMlpForward matches a driver-side replay of the same arithmetic") {
    val d = 6; val h = 3; val o = 2
    val w1 = (0 until h).map(i => (0 until d).map(j => ((i * 7 + j * 13) % 11 - 5).toLong))
    val b1 = (0 until h).map(i => ((i % 5) - 2).toLong)
    val w2 = (0 until o).map(c => (0 until h).map(i => ((c * 5 + i * 3) % 7 - 3).toLong))
    val b2 = (0 until o).map(c => ((c % 3) - 1).toLong)
    val vecs = Seq(
      (0L, (0 until d).map(j => (math.sin(j + 1) * 0.3).toFloat)),
      (1L, (0 until d).map(j => (math.cos(j * 2 + 1) * 0.2).toFloat)),
      (2L, (0 until d).map(_ => 0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = DeepLearn.quantizedMlpForward(df, "vec_id", "embedding",
        w1, b1, w2, b2).orderBy("vec_id")
      .as[(Long, Int, Long, Long)].collect().toSeq

    val want = vecs.map { case (id, emb) =>
      val xq = emb.map(x => math.floor(x.toDouble * 1024).toLong)
      val z1 = (0 until h).map(i =>
        b1(i) * 1024 + (0 until d).map(j => w1(i)(j) * xq(j)).sum)
      val a1 = z1.map(z => math.floor(10000.0 / (1.0 + math.exp(-(z.toDouble / 8192.0)))).toLong)
      val z2 = (0 until o).map(c => b2(c) + (0 until h).map(i => w2(c)(i) * a1(i)).sum)
      val mx = z2.max
      (id, z2.indexOf(mx), a1.sum, z2.sum)
    }
    assert(got == want, s"got=$got want=$want")
  }

  test("quantized forward passes keep the null contract: null row → null outputs, wrong width fails loudly") {
    val w1 = Seq(Seq(1L, 2L), Seq(3L, -1L)); val b1 = Seq(0L, 1L)
    val w2 = Seq(Seq(1L, 0L), Seq(0L, 1L)); val b2 = Seq(0L, 0L)
    val df = Seq(
      (0L, Option(Seq(0.5f, -0.25f))),
      (1L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val rows = DeepLearn.quantizedMlpForward(df, "vec_id", "embedding",
        w1, b1, w2, b2).orderBy("vec_id")
      .as[(Long, Option[Int], Option[Long], Option[Long])].collect().toSeq
    assert(rows(0)._2.isDefined && rows(0)._3.isDefined && rows(0)._4.isDefined)
    assert(rows(1) == ((1L, None, None, None)))
    val sda = DeepLearn.sdaPredictQuantized(df, "vec_id", "embedding",
        Seq((w1, b1)), w2, b2).orderBy("vec_id")
      .as[(Long, Option[Int], Option[Long], Option[Long])].collect().toSeq
    assert(sda(1) == ((1L, None, None, None)))
    // wrong width still fails loudly (assertedWidth raise_error)
    val bad = Seq((0L, Seq(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      DeepLearn.quantizedMlpForward(bad, "vec_id", "embedding",
        w1, b1, w2, b2).collect()
    }
    assert(e.getMessage != null)
  }

  test("quantizeMlpModel: quantized forward argmax equals model.transform on planted separable data") {
    // the spark.ml train → quantize → distributed-score bridge: slice the
    // packed weight vector, floor-quantize, and the integer forward pass
    // must predict the same class as the real-valued model
    val rows = trainX.zipWithIndex.map { case (x, i) =>
      (i.toLong, x.map(_.toDouble).toSeq, if (i < 8) 0 else 1)
    }.toSeq
    val df = rows.toDF("vec_id", "features", "label")
    val m = DeepLearn.mlpClassifier(df, "features", "label",
      layers = Array(nIn, 8, 2), maxIter = 60)
    val (w1, b1, w2, b2, zDenom) = DeepLearn.quantizeMlpModel(m)
    assert(w1.size == 8 && w1.head.size == nIn && w2.size == 2 && w2.head.size == 8)
    val got = DeepLearn.quantizedMlpForward(df, "vec_id", "features",
        w1, b1, w2, b2, zDenom = zDenom).orderBy("vec_id")
      .select("vec_id", "cls").as[(Long, Int)].collect().toMap
    val want = DeepLearn.mlpPredict(m, df, "features", "pred")
      .select("vec_id", "pred").as[(Long, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, c) => assert(c.toDouble == want(id), s"row $id") }
    // both recover the planted labels
    rows.foreach { case (id, _, l) => assert(got(id) == l, s"row $id") }
  }

  test("quantizeMlpModelStack: any-depth spark.ml bridge argmax-matches model.transform") {
    // two hidden layers — the case the one-layer bridge rejects — through
    // the stack scorer's fixed-point bookkeeping
    val rows = trainX.zipWithIndex.map { case (x, i) =>
      (i.toLong, x.map(_.toDouble).toSeq, if (i < 8) 0 else 1)
    }.toSeq
    val df = rows.toDF("vec_id", "features", "label")
    val m = DeepLearn.mlpClassifier(df, "features", "label",
      layers = Array(nIn, 10, 6, 2), maxIter = 80)
    intercept[IllegalArgumentException] { DeepLearn.quantizeMlpModel(m) }
    val (hidden, hw, hb) = DeepLearn.quantizeMlpModelStack(m)
    assert(hidden.map(_._1.size) == Seq(10, 6) && hw.size == 2)
    assert(hidden.head._1.head.size == nIn && hw.head.size == 6)
    val got = DeepLearn.sdaPredictQuantized(df, "vec_id", "features", hidden, hw, hb)
      .orderBy("vec_id").select("vec_id", "cls").as[(Long, Int)].collect().toMap
    val want = DeepLearn.mlpPredict(m, df, "features", "pred")
      .select("vec_id", "pred").as[(Long, Double)].collect().toMap
    got.foreach { case (id, c) => assert(c.toDouble == want(id), s"row $id") }
    rows.foreach { case (id, _, l) => assert(got(id) == l, s"row $id") }
  }

  test("sda demo fixture: quantized distributed predict matches the driver net and is non-degenerate") {
    val net = QueriesLLM.sdaDemoNet
    val (ls, hw, hb) = QueriesLLM.sdaDemoWeights
    // the training fixture itself: quantized argmax == real-valued argmax
    val xs = Array.tabulate(30, 16) { (n, j) =>
      val c = n % 3
      if (j >= c * 5 && j < c * 5 + 5) 1
      else if ((n * 7 + j * 3) % 7 == 0) 1 else 0
    }
    val trainPred = xs.map(net.predictClass)
    assert(xs.indices.forall(n => trainPred(n) == n % 3),
      s"fixture not learned: ${trainPred.mkString(",")}")
    // seeded random sign patterns (the query's binarized-embedding input
    // distribution): classes must VARY, and the quantized pass must agree
    // with the driver net's real-valued argmax
    val rng = new java.util.Random(42L)
    val pats = (0 until 64).map(_ => Array.fill(16)(if (rng.nextBoolean()) 1 else 0))
    val want = pats.map(net.predictClass)
    assert(want.distinct.size >= 2, s"degenerate: ${want.distinct.mkString(",")}")
    val df = pats.zipWithIndex.map { case (p, i) =>
      (i.toLong, p.map(_.toDouble).toSeq)
    }.toDF("vec_id", "emb")
    val got = DeepLearn.sdaPredictQuantized(df, "vec_id", "emb", ls, hw, hb)
      .orderBy("vec_id").select("cls").as[Int].collect().toSeq
    // 2^12 weight + 1e-4 sigmoid quantization can flip a NEAR-TIE argmax;
    // any disagreement must be exactly that — a small top-2 softmax margin
    // on the real-valued net — and rare
    val diff = got.indices.filter(i => got(i) != want(i))
    assert(diff.size <= 2, s"too many flips: $diff got=$got want=$want")
    diff.foreach { i =>
      val p = net.predict(pats(i)).sorted.reverse
      assert(p(0) - p(1) < 0.02, s"row $i flipped with margin ${p(0) - p(1)}")
    }
    // the training fixture's margins are wide: quantized == real there
    val trainDf = xs.zipWithIndex.map { case (p, i) =>
      (i.toLong, p.map(_.toDouble).toSeq)
    }.toSeq.toDF("vec_id", "emb")
    val trainGot = DeepLearn.sdaPredictQuantized(trainDf, "vec_id", "emb", ls, hw, hb)
      .orderBy("vec_id").select("cls").as[Int].collect().toSeq
    assert(trainGot == trainPred.toSeq, s"got=$trainGot want=${trainPred.toSeq}")
  }

  test("dbn demo fixture: quantized distributed predict matches the driver net and is non-degenerate") {
    // same shared inference path, CD-1-pretrained weights
    val net = QueriesLLM.dbnDemoNet
    val (ls, hw, hb) = QueriesLLM.dbnDemoWeights
    val xs = Array.tabulate(30, 16) { (n, j) =>
      val c = n % 3
      if (j >= c * 5 && j < c * 5 + 5) 1
      else if ((n * 7 + j * 3) % 7 == 0) 1 else 0
    }
    val trainPred = xs.map(net.predictClass)
    assert(xs.indices.forall(n => trainPred(n) == n % 3),
      s"fixture not learned: ${trainPred.mkString(",")}")
    val rng = new java.util.Random(42L)
    val pats = (0 until 64).map(_ => Array.fill(16)(if (rng.nextBoolean()) 1 else 0))
    val want = pats.map(net.predictClass)
    assert(want.distinct.size >= 2, s"degenerate: ${want.distinct.mkString(",")}")
    val df = pats.zipWithIndex.map { case (p, i) =>
      (i.toLong, p.map(_.toDouble).toSeq)
    }.toDF("vec_id", "emb")
    val got = DeepLearn.sdaPredictQuantized(df, "vec_id", "emb", ls, hw, hb)
      .orderBy("vec_id").select("cls").as[Int].collect().toSeq
    val diff = got.indices.filter(i => got(i) != want(i))
    assert(diff.size <= 2, s"too many flips: $diff got=$got want=$want")
    diff.foreach { i =>
      val p = net.predict(pats(i)).sorted.reverse
      assert(p(0) - p(1) < 0.02, s"row $i flipped with margin ${p(0) - p(1)}")
    }
  }
}
