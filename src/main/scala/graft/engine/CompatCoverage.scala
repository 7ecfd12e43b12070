package graft.engine

/**
 * Machine-readable tally of every reference FQCN the compat dispatcher
 * ([[TuktuCompat]]) recognizes by name — the COVERAGE.md "named FQCN"
 * number, kept exhaustive: each name either EXECUTES (compiles to a
 * DataFrame/flow transformation with the reference's own config schema)
 * or REJECTS with porting guidance. `CompatCoverageSpec` parses the
 * dispatcher source and fails if a name is added there without being
 * classified here (or vice versa), so the tally cannot silently drift.
 */
object CompatCoverage {

  /** FQCNs that execute. Includes the five generators, the three mergers
    * (reached through Parallel(Config)Processor's `merger` config), and
    * every processor family; see COVERAGE.md for the operator mapping. */
  val executes: Set[String] = Set(
    "tuktu.csv.generators.CSVGenerator",
    "tuktu.csv.generators.flattening.CsvGenerator",
    "tuktu.csv.generators.flattening.XlsGenerator",
    "tuktu.csv.generators.flattening.XlsxGenerator",
    // locator classes sub-dispatched inside the flattening generators'
    // hierarchy parser (ref locators/SimpleLocators.scala)
    "tuktu.csv.locators.Column",
    "tuktu.csv.locators.Row",
    "tuktu.csv.locators.CellRangeSplitter",
    "tuktu.csv.processors.CSVReaderProcessor",
    "tuktu.csv.processors.FixedWidthProcessor",
    "tuktu.dlib.processors.MapMergerProcessor",
    "tuktu.dlib.processors.XSLTProcessor",
    "tuktu.generators.DummyGenerator",
    "tuktu.generators.LineGenerator",
    "tuktu.generators.ListGenerator",
    "tuktu.ml.processors.MLDestroyProcessor",
    "tuktu.ml.processors.MLSerializeProcessor",
    "tuktu.ml.processors.association.FPGrowthProcessor",
    "tuktu.ml.processors.clustering.KMeansApplyProcessor",
    "tuktu.ml.processors.clustering.KMeansTrainProcessor",
    "tuktu.ml.processors.decisiontrees.DecisionTreeApplyProcessor",
    "tuktu.ml.processors.decisiontrees.DecisionTreeTrainProcessor",
    "tuktu.ml.processors.decisiontrees.GradientTreeBoostApplyProcessor",
    "tuktu.ml.processors.decisiontrees.GradientTreeBoostTrainProcessor",
    "tuktu.ml.processors.hmm.HMMApplyDecodeProcessor",
    "tuktu.ml.processors.hmm.HMMApplyPredictProcessor",
    "tuktu.ml.processors.hmm.HMMDeserializeProcessor",
    "tuktu.ml.processors.hmm.HMMTrainProcessor",
    "tuktu.ml.processors.preprocessing.DummyVariableProcessor",
    "tuktu.ml.processors.preprocessing.MissingvaluesProcessor",
    "tuktu.ml.processors.preprocessing.NormalizationApplyProcessor",
    "tuktu.ml.processors.preprocessing.NormalizationTrainProcessor",
    "tuktu.ml.processors.regression.LinearRegressionApplyProcessor",
    "tuktu.ml.processors.regression.LinearRegressionTrainProcessor",
    "tuktu.ml.processors.regression.LogisticRegressionApplyProcessor",
    "tuktu.ml.processors.regression.LogisticRegressionTrainProcessor",
    "tuktu.ml.processors.regression.RidgeRegressionApplyProcessor",
    "tuktu.ml.processors.regression.RidgeRegressionTrainProcessor",
    "tuktu.ml.processors.svm.SVMApplyProcessor",
    "tuktu.ml.processors.svm.SVMTrainProcessor",
    "tuktu.ml.processors.timeseries.ARIMAApplyProcessor",
    "tuktu.ml.processors.timeseries.ARIMADeserializeProcessor",
    "tuktu.ml.processors.timeseries.ARIMATrainProcessor",
    "tuktu.ml.processors.timeseries.ChangePointProcessor",
    "tuktu.nlp.processors.LIGAProcessor",
    "tuktu.nlp.processors.LangDetProcessor",
    "tuktu.nlp.processors.NgramProcessor",
    "tuktu.nlp.processors.POSTaggerProcessor",
    "tuktu.nlp.processors.RBEMEmotionProcessor",
    "tuktu.nlp.processors.RBEMPolarityProcessor",
    "tuktu.nlp.processors.SentenceSplitterProcessor",
    "tuktu.nlp.processors.SnowballProcessor",
    "tuktu.nlp.processors.TokenizerProcessor",
    "tuktu.nlp.processors.cleanup.CaseConverterProcessor",
    "tuktu.nlp.processors.cleanup.EmojiRemoverProcessor",
    "tuktu.nlp.processors.cleanup.NCharsRemoverProcessor",
    "tuktu.nlp.processors.cleanup.OddCharacterRemoverProcessor",
    "tuktu.nlp.processors.cleanup.PunctuationRemoverProcessor",
    "tuktu.nlp.processors.cleanup.StopwordRemoverProcessor",
    "tuktu.nosql.generators.SQLGenerator",
    "tuktu.processors.AbsentFieldsFilterProcessor",
    "tuktu.processors.BatchedFileStreamProcessor",
    "tuktu.processors.ConsoleWriterProcessor",
    "tuktu.processors.ContainsAllFilterProcessor",
    "tuktu.processors.ConvertAnyToStringProcessor",
    "tuktu.processors.ConvertToBigDecimal",
    "tuktu.processors.ConvertToDate",
    "tuktu.processors.ConvertToNumber",
    "tuktu.processors.CountEOFProcessor",
    "tuktu.processors.DataPacketFieldMergerProcessor",
    "tuktu.processors.DataPacketSplitterProcessor",
    "tuktu.processors.DataPacketWrapperProcessor",
    "tuktu.processors.DatumMergeProcessor",
    "tuktu.processors.DatumToFieldProcessor",
    "tuktu.processors.DelayProcessor",
    "tuktu.processors.DistinctSequenceProcessor",
    "tuktu.processors.EOFBufferProcessor",
    "tuktu.processors.EvaluateNestedTuktuExpressionsProcessor",
    "tuktu.processors.FieldConstantAdderProcessor",
    "tuktu.processors.FieldCopyProcessor",
    "tuktu.processors.FieldFilterProcessor",
    "tuktu.processors.FieldRemoveProcessor",
    "tuktu.processors.FieldRenameProcessor",
    "tuktu.processors.FieldsToListProcessor",
    "tuktu.processors.FileReaderProcessor",
    "tuktu.processors.FileStreamProcessor",
    "tuktu.processors.FlattenerProcessor",
    "tuktu.processors.GetListElementProcessor",
    "tuktu.processors.GroupByProcessor",
    "tuktu.processors.HeadOfListProcessor",
    "tuktu.processors.ImploderProcessor",
    "tuktu.processors.JsObjectImploderProcessor",
    "tuktu.processors.JsonFetcherProcessor",
    "tuktu.processors.KeyImploderProcessor",
    "tuktu.processors.ListMapFlattenerProcessor",
    "tuktu.processors.MapFlattenerProcessor",
    "tuktu.processors.MultiListMapFlattenerProcessor",
    "tuktu.processors.PacketFilterProcessor",
    "tuktu.processors.PacketRegexFilterProcessor",
    "tuktu.processors.PredicateProcessor",
    "tuktu.processors.RemoveEmptyPacketProcessor",
    "tuktu.processors.ReplaceProcessor",
    "tuktu.processors.RunningCountProcessor",
    "tuktu.processors.SequenceExploderProcessor",
    "tuktu.processors.SequenceFlattenerProcessor",
    "tuktu.processors.SequenceLengthProcessor",
    "tuktu.processors.SizeBufferProcessor",
    "tuktu.processors.SkipProcessor",
    "tuktu.processors.StringImploderProcessor",
    "tuktu.processors.StringSplitterProcessor",
    "tuktu.processors.TimeBufferProcessor",
    "tuktu.processors.TupleListStringImploder",
    "tuktu.processors.UUIDAdderProcessor",
    "tuktu.processors.XmlToMapProcessor",
    "tuktu.processors.ZipExplodeProcessor",
    "tuktu.processors.arithmetics.ArithmeticAggregateProcessor",
    "tuktu.processors.arithmetics.ArithmeticProcessor",
    "tuktu.processors.arithmetics.MaxFieldByValueProcessor",
    "tuktu.processors.arithmetics.NumberToNumberProcessor",
    "tuktu.processors.bucket.DeduplicationProcessor",
    "tuktu.processors.bucket.SortProcessor",
    "tuktu.processors.bucket.aggregate.AggregateByValueProcessor",
    "tuktu.processors.bucket.statistics.MeanProcessor",
    "tuktu.processors.bucket.statistics.MedianProcessor",
    "tuktu.processors.bucket.statistics.MidrangeProcessor",
    "tuktu.processors.bucket.statistics.StDevProcessor",
    "tuktu.processors.bucket.statistics.VarProcessor",
    "tuktu.processors.cache.CachingProcessor",
    "tuktu.processors.json.JSONCreatorProcessor",
    "tuktu.processors.json.JSONMergerProcessor",
    "tuktu.processors.json.JSONParseProcessor",
    "tuktu.processors.merge.PaddingMerger",
    "tuktu.processors.merge.SerialMerger",
    "tuktu.processors.merge.SimpleMerger",
    "tuktu.processors.meta.IfThenElseProcessor",
    "tuktu.processors.meta.ParallelConfigProcessor",
    "tuktu.processors.meta.ParallelProcessor",
    "tuktu.processors.sample.DropProcessor",
    "tuktu.processors.sample.ReverseProcessor",
    "tuktu.processors.sample.StratifiedSamplingProcessor",
    "tuktu.processors.sample.TakeProcessor",
    "tuktu.processors.statistics.NumberWithProbabilityProcessor",
    "tuktu.processors.time.DateToMillisProcessor",
    "tuktu.processors.time.DurationProcessor",
    "tuktu.processors.time.TimestampAdderProcessor",
    "tuktu.processors.time.TimestampNormalizerProcessor",
    "tuktu.processors.time.TimestampPeriodAdderProcessor",
    "tuktu.web.processors.FreeGeoIPProcessor",
    "tuktu.web.processors.RESTProcessor",
    "tuktu.web.processors.URLCheckerProcessor"
  )

  /** FQCNs recognized but rejected by name: their semantics are
    * value-dependent or spawn flows per datum — incompatible with a
    * statically composed plan. The message names the porting path. */
  val rejects: Map[String, String] = Map(
    "tuktu.processors.ListJsonFetcherProcessor" ->
      "output schema depends on data values; fetch known paths with JsonFetcherProcessor",
    "tuktu.processors.meta.GeneratorConfigProcessor" ->
      "spawns generator flows per datum; compose statically with Flow branch/fan-out",
    "tuktu.processors.meta.GeneratorConfigStreamProcessor" ->
      "spawns generator flows per datum; compose statically with Flow branch/fan-out",
    "tuktu.processors.meta.GeneratorStreamProcessor" ->
      "spawns generator flows per datum; compose statically with Flow branch/fan-out",
    // crawler module (live-web ingestion — needs egress; the crawl-DATA
    // path is the WARC source + Html extract + Url ops)
    "tuktu.crawler.generators.GenericCrawlerGenerator" ->
      "live-web htmlunit scraping; read crawl archives via Warc + Html + Url",
    "tuktu.crawler.generators.WikipediaContentGenerator" ->
      "live-web htmlunit scraping; read crawl archives via Warc + Html + Url",
    // deeplearn image classifiers (pretrained weights need egress; the
    // engine path is Multimodal decode + DeepLearn/spark.ml MLP)
    "tuktu.deeplearn.processors.image.InceptionClassifier" ->
      "pretrained weights need egress; Multimodal decode + DeepLearn/spark.ml MLP",
    "tuktu.deeplearn.processors.image.InceptionTensorClassifier" ->
      "pretrained weights need egress; Multimodal decode + DeepLearn/spark.ml MLP",
    "tuktu.deeplearn.processors.image.VGG16Classifier" ->
      "pretrained weights need egress; Multimodal decode + DeepLearn/spark.ml MLP")

  /** Executing FQCNs with one named MODE that rejects (the rest of the
    * processor works): the mode's shape is value-dependent. */
  val modeLimited: Map[String, String] = Map(
    "tuktu.processors.PacketFilterProcessor" ->
      "expression type 'groovy' (script eval) — use the expression grammar or a Scala lambda",
    "tuktu.dlib.processors.MapMergerProcessor" ->
      "priority-less combine mode (value-dependent output types) — use priority map1/map2")

  /** `tuktu.ml.processors.<Model>DeserializeProcessor` names resolve
    * generically by prefix (ModelRegistry load); concrete Deserialize
    * FQCNs beyond the listed HMM/ARIMA ones are covered by this rule. */
  val mlDeserializePrefix: String = "tuktu.ml.processors."

  /** Every name the dispatcher matches in case position. */
  def all: Set[String] = executes ++ rejects.keySet
}
