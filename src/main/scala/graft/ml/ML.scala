package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{DecisionTreeClassifier, GBTClassifier, LinearSVC, LogisticRegression}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature._
import org.apache.spark.ml.fpm.FPGrowth
import org.apache.spark.ml.regression.{DecisionTreeRegressor, GBTRegressor, LinearRegression}
import org.apache.spark.sql.DataFrame

/**
 * ML/NLP capability parity (SURVEY.md §2.11) on spark.ml — the reference's
 * train/apply/serialize processors over an in-memory model repository become
 * Estimator/Transformer pipelines with MLWritable persistence. Each wrapper
 * assembles features from plain columns so callers stay in DataFrame land.
 *
 * Model lifecycle (ref: modules/ml/.../BaseMLProcessor.scala:22-239):
 * train ⇄ fit, apply ⇄ transform, (de)serialize ⇄ save/load.
 */
object ML {

  private def assemble(features: Seq[String], out: String = "features") =
    new VectorAssembler().setInputCols(features.toArray).setOutputCol(out)

  /** LinearRegression (ref: modules/ml/.../LinearRegression.scala:12);
    * ridge = elasticNet 0 + regParam (ref RidgeRegression.scala:12). */
  def linearRegression(df: DataFrame, features: Seq[String], label: String,
                       regParam: Double = 0.0): PipelineModel =
    new Pipeline().setStages(Array(assemble(features),
      new LinearRegression().setLabelCol(label).setRegParam(regParam)
        .setElasticNetParam(0.0))).fit(df)

  /** LogisticRegression (ref: .../LogisticRegression.scala:18). */
  def logisticRegression(df: DataFrame, features: Seq[String], label: String): PipelineModel =
    new Pipeline().setStages(Array(assemble(features),
      new LogisticRegression().setLabelCol(label))).fit(df)

  /** SVM (ref: .../SupportVectorMachines.scala:12) ⇄ LinearSVC. */
  def svm(df: DataFrame, features: Seq[String], label: String): PipelineModel =
    new Pipeline().setStages(Array(assemble(features),
      new LinearSVC().setLabelCol(label))).fit(df)

  /** Decision tree (ref: modules/ml/.../decisiontrees/DecisionTrees.scala:12):
    * classification and regression variants. Distributed histogram-based
    * split search — each depth level is one pass over the data. */
  def decisionTreeClassifier(df: DataFrame, features: Seq[String], label: String,
                             maxDepth: Int = 5, seed: Long = 42): PipelineModel =
    new Pipeline().setStages(Array(assemble(features),
      new DecisionTreeClassifier().setLabelCol(label).setMaxDepth(maxDepth)
        .setSeed(seed))).fit(df)

  def decisionTreeRegressor(df: DataFrame, features: Seq[String], label: String,
                            maxDepth: Int = 5, seed: Long = 42): PipelineModel =
    new Pipeline().setStages(Array(assemble(features),
      new DecisionTreeRegressor().setLabelCol(label).setMaxDepth(maxDepth)
        .setSeed(seed))).fit(df)

  /** Gradient tree boosting (ref: .../decisiontrees/GradientTreeBoost.scala:12). */
  def gbtClassifier(df: DataFrame, features: Seq[String], label: String,
                    maxIter: Int = 20, maxDepth: Int = 3, seed: Long = 42): PipelineModel =
    new Pipeline().setStages(Array(assemble(features),
      new GBTClassifier().setLabelCol(label).setMaxIter(maxIter)
        .setMaxDepth(maxDepth).setSeed(seed))).fit(df)

  def gbtRegressor(df: DataFrame, features: Seq[String], label: String,
                   maxIter: Int = 20, maxDepth: Int = 3, seed: Long = 42): PipelineModel =
    new Pipeline().setStages(Array(assemble(features),
      new GBTRegressor().setLabelCol(label).setMaxIter(maxIter)
        .setMaxDepth(maxDepth).setSeed(seed))).fit(df)

  /** KMeans (ref: .../KMeansProcessor.scala:12). */
  def kmeans(df: DataFrame, features: Seq[String], k: Int, seed: Long = 42): PipelineModel =
    new Pipeline().setStages(Array(assemble(features),
      new KMeans().setK(k).setSeed(seed))).fit(df)

  /** FP-Growth association rules (ref: .../FPGrowthProcessor.scala:15). */
  def fpGrowth(df: DataFrame, itemsCol: String, minSupport: Double = 0.3,
               minConfidence: Double = 0.6): org.apache.spark.ml.fpm.FPGrowthModel =
    new FPGrowth().setItemsCol(itemsCol)
      .setMinSupport(minSupport).setMinConfidence(minConfidence).fit(df)

  /** Tokenization (ref: modules/nlp/.../Tokenization.scala:20). */
  def tokenize(df: DataFrame, in: String, out: String): DataFrame =
    new RegexTokenizer().setInputCol(in).setOutputCol(out)
      .setPattern("\\s+").transform(df)

  /** N-grams (ref: .../NgramProcessor.scala:14). */
  def ngrams(df: DataFrame, in: String, out: String, n: Int): DataFrame =
    new NGram().setN(n).setInputCol(in).setOutputCol(out).transform(df)

  /** TF-IDF (ref: .../TFIDF.scala:12) ⇄ HashingTF + IDF. */
  def tfidf(df: DataFrame, tokensCol: String, out: String,
            numFeatures: Int = 1 << 18): DataFrame = {
    val tf = new HashingTF().setInputCol(tokensCol).setOutputCol("__tf")
      .setNumFeatures(numFeatures).transform(df)
    new IDF().setInputCol("__tf").setOutputCol(out).fit(tf).transform(tf).drop("__tf")
  }

  /** Word2Vec (ref: .../Word2Vec.scala:13). */
  def word2vec(df: DataFrame, tokensCol: String, out: String, dim: Int = 16,
               seed: Long = 42): DataFrame =
    new Word2Vec().setInputCol(tokensCol).setOutputCol(out)
      .setVectorSize(dim).setSeed(seed).setMinCount(1).fit(df).transform(df)

  /** Normalization (ref: modules/ml/.../NormalizationProcessor.scala:12). */
  def minMaxScale(df: DataFrame, features: Seq[String], out: String): DataFrame = {
    val a = assemble(features, "__f").transform(df)
    new MinMaxScaler().setInputCol("__f").setOutputCol(out).fit(a).transform(a).drop("__f")
  }

  /** Dummy variables (ref: .../DummyVariableProcessor.scala:10) ⇄ OneHot. */
  def oneHot(df: DataFrame, in: String, out: String): DataFrame = {
    val idx = new StringIndexer().setInputCol(in).setOutputCol("__idx")
      .setStringOrderType("alphabetAsc").fit(df).transform(df)
    new OneHotEncoder().setInputCols(Array("__idx")).setOutputCols(Array(out))
      .fit(idx).transform(idx).drop("__idx")
  }

  /** Missing values (ref: .../MissingvaluesProcessor.scala:14) ⇄ Imputer. */
  def impute(df: DataFrame, cols: Seq[String], strategy: String = "mean"): DataFrame =
    new Imputer().setInputCols(cols.toArray).setOutputCols(cols.toArray)
      .setStrategy(strategy).fit(df).transform(df)

  /** LDA topic model (ref: modules/nlp/.../LDA.scala): token counts →
    * spark.ml LDA; returns the transformed frame with `topicDistribution`.
    * Distributed EM/online inference — the reference runs a single-node
    * collapsed sampler. */
  def lda(df: DataFrame, tokensCol: String, k: Int, maxIter: Int = 30,
          seed: Long = 42): DataFrame = {
    // uniquified temp column: a fixed "__tf" collides with frames that
    // already carry one (e.g. a chained lda/nbsvm output)
    val tfCol = s"__tf_${java.util.UUID.randomUUID.toString.take(8)}"
    val cv = new CountVectorizer().setInputCol(tokensCol).setOutputCol(tfCol).fit(df)
    val tf = cv.transform(df)
    new org.apache.spark.ml.clustering.LDA()
      .setK(k).setMaxIter(maxIter).setSeed(seed).setFeaturesCol(tfCol)
      .fit(tf).transform(tf).drop(tfCol)
  }

  /** NBSVM text classifier (ref: modules/nlp/.../NBSVM.scala via
    * NBSVMProcessor; the public Wang & Manning 2012 recipe): binarized token
    * presence, Naive-Bayes log-count-ratio feature scaling, linear SVM on
    * the scaled features. The heavy passes (vocabulary, per-class feature
    * sums, SVM fit) are all distributed; only the vocab-sized ratio vector
    * touches the driver. Binary labels (0/1). */
  final case class NbsvmModel(cv: org.apache.spark.ml.feature.CountVectorizerModel,
                              scale: org.apache.spark.ml.linalg.Vector,
                              svc: org.apache.spark.ml.classification.LinearSVCModel) {
    def transform(df: DataFrame): DataFrame = {
      val tfCol = cv.getOutputCol
      val fCol = svc.getFeaturesCol
      val tf = cv.transform(df)
      val scaled = new ElementwiseProduct().setScalingVec(scale)
        .setInputCol(tfCol).setOutputCol(fCol).transform(tf)
      svc.transform(scaled).drop(tfCol, fCol)
    }
  }

  def nbsvm(df: DataFrame, tokensCol: String, labelCol: String,
            vocabSize: Int = 1 << 16, regParam: Double = 0.01): NbsvmModel = {
    import org.apache.spark.sql.functions._
    // uniquified temp columns (see lda) — the model carries them for transform
    val tag = java.util.UUID.randomUUID.toString.take(8)
    val tfCol = s"__tf_$tag"; val fCol = s"__f_$tag"
    val cv = new CountVectorizer().setInputCol(tokensCol).setOutputCol(tfCol)
      .setVocabSize(vocabSize).setBinary(true).fit(df)
    val tf = cv.transform(df)
    val sums = tf.groupBy(col(labelCol))
      .agg(org.apache.spark.ml.stat.Summarizer.sum(col(tfCol)).as("__s"))
      .collect()
      .map(r => r.get(0).toString.toDouble -> r.getAs[org.apache.spark.ml.linalg.Vector]("__s"))
      .toMap
    val dim = cv.vocabulary.length
    val p = sums.getOrElse(1.0, org.apache.spark.ml.linalg.Vectors.zeros(dim)).toArray
    val q = sums.getOrElse(0.0, org.apache.spark.ml.linalg.Vectors.zeros(dim)).toArray
    val pNorm = p.map(_ + 1.0).sum
    val qNorm = q.map(_ + 1.0).sum
    val r = org.apache.spark.ml.linalg.Vectors.dense(
      Array.tabulate(dim)(i => math.log((p(i) + 1.0) / pNorm) - math.log((q(i) + 1.0) / qNorm)))
    val scaled = new ElementwiseProduct().setScalingVec(r)
      .setInputCol(tfCol).setOutputCol(fCol).transform(tf)
    val svc = new LinearSVC().setFeaturesCol(fCol).setLabelCol(labelCol)
      .setRegParam(regParam).fit(scaled)
    NbsvmModel(cv, r, svc)
  }
}
