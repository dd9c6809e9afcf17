package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.Text

/** Cross-cutting regression net: every non-ML query must plan, and no
  * plan may contain a cartesian product except the two documented
  * brute-force baselines. Degenerate (empty) inputs must produce empty
  * results, not exceptions.
  */
class PlanHardeningSpec extends SparkSpec {

  // ML queries excluded: planning them fits a model (minutes, covered
  // by ChurnSpec); brute baselines legitimately nested-loop against a
  // broadcast side.
  private val mlQueries = Set(
    "q_train_coefficients", "q_predict_batch", "q_threshold_sweep",
    "q_eval_confusion", "q_eval_auc", "q_calibration", "q_quality_classifier",
    "q_langid_classifier")
  // q_ann_eval composes the brute truth (broadcast-queries NLJ) and
  // ivfAnn (broadcast-centroid NLJ), so it inherits their documented
  // nested loops
  // q_embed_incremental is not a brute BASELINE but shares the shape:
  // its batch side broadcasts against the corpus scan by design (the
  // scan-x-broadcast screen IS the operator's scale contract)
  // q_chunk_search is the q_knn_brute shape on the chunk index: the
  // corpus-×-broadcast-queries scan (join on doc_id != query_doc) IS
  // the operator's contract
  // q_search_mmr's candidate pool is that same exact-top-kPool scan
  // (the MMR re-rank itself is a bounded per-query flatMapGroups)
  // q_decontaminate_semantic is the q_embed_incremental shape with the
  // roles fixed by the decontamination contract: the constant-sized
  // eval suite broadcasts against the one train-corpus scan
  private val bruteBaselines =
    Set("q_knn_brute", "q_dedup_embedding", "q_ann_eval", "q_embed_incremental",
      "q_chunk_search", "q_search_mmr", "q_decontaminate_semantic")

  test("every non-ML query plans without a CartesianProduct") {
    SparkEntry.queries.filterNot(q => mlQueries(q._1)).foreach { case (name, fn) =>
      val plan = planOf(fn(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$name has a CartesianProduct")
      if (!bruteBaselines(name)) {
        // the IVF family legitimately nested-loops against the tiny
        // broadcast centroid table
        // q_ann_pq's ADC pass is a corpus-×-broadcast-queries scan by
        // design (nSub code lookups per pair instead of a dim-wide
        // dot); q_ann_ivfpq is NOT exempt — its cell-pruned ADC is
        // all equi-joins and must stay that way
        // q_ann_sq8's code-scoring pass is likewise a linear scan by
        // definition (flat quantized index); the pruned paths stay
        // equi-join-only
        // q_ann_pca's projected-dot pass is the same flat linear scan
        // over m-double rows
        // q_ann_opq is q_ann_pq's ADC scan over the rotated frame —
        // the same flat-code-scan exemption
        // q_chunk_search_ann's probe selection is the IVF family's
        // bounded nQueries-×-broadcast-centroids cross join; its
        // candidate path is equi-join-only (pinned in DocEmbedSpec)
        assert(!plan.contains("BroadcastNestedLoopJoin")
            || name == "q_ann_ivf" || name == "q_ann_ivf_kmeans" || name == "q_ann_pq"
            || name == "q_ann_sq8" || name == "q_ann_pca" || name == "q_ann_opq"
            || name == "q_chunk_search_ann",
          s"$name has an unexpected BroadcastNestedLoopJoin")
      }
    }
  }

  test("pack/vocab plans never funnel data through an unpartitioned exchange") {
    // the scale contract of the round-4 two-level/two-phase designs:
    // a plain global-cumsum or one-window top-k would plan an
    // Exchange SinglePartition over data-sized input
    for (q <- Seq("q_pack_sequences", "q_ngram_vocab")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("Exchange SinglePartition"),
        s"$q funnels through a single-partition exchange:\n$plan")
    }
    // pack: the block-offset table joins back via broadcast
    assert(planOf(SparkEntry.queries("q_pack_sequences")(spark, sf))
      .contains("BroadcastHashJoin"))
  }

  test("every oracle entry has a matching query and vice versa for SQL-expressible ops") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // exactly the documented model-dependent / sketch-based set
    assert(rowsOnly === mlQueries ++ Set(
      "q_dedup_minhash", "q_dedup_simhash", "q_dedup_eval", "q_ann_lsh",
      "q_ann_ivf", "q_ann_ivf_kmeans", "q_ann_pq", "q_ann_ivfpq", "q_ann_sq8",
      "q_ann_eval", "q_dedup_embedding_lsh", "q_embed_incremental_lsh",
      "q_corpus_stats_approx", "q_media_features", "q_distinct_approx",
      "q_dedup_bloom", "q_ann_pca", "q_embed_pca", "q_ivf_cell_profile",
      "q_ann_ivf_sq8", "q_ann_opq", "q_semdedup",
      "q_unigram_train", "q_unigram_tokenize", "q_unigram_tokenize_disk",
      "q_tokenizer_compare", "q_semdedup_disk", "q_chunk_search_ann",
      "q_semdedup_chunks", "q_search_mmr"))
    // round 16: q_dedup_modality_agreement is back in the oracle set —
    // the twin replays the deterministic LSH blocking exactly
    assert(SparkEntry.oracleSql.contains("q_dedup_modality_agreement"))
  }

  private lazy val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row],
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))))

  private lazy val emptyEmb = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row],
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  test("text and dedup operators return empty results on an empty corpus") {
    assert(Text.tokenStats(emptyDocs).count() === 0)
    assert(Text.quality(emptyDocs).count() === 0)
    assert(Text.langId(emptyDocs).count() === 0)
    assert(Text.fingerprint(emptyDocs).count() === 0)
    assert(Text.repetition(emptyDocs).count() === 0)
    assert(Text.scrub(emptyDocs).count() === 0)
    assert(Dedup.exact(emptyDocs).count() === 0)
    assert(Dedup.ngramPairs(emptyDocs).count() === 0)
    assert(Dedup.minhashLshPairs(emptyDocs).count() === 0)
    assert(Dedup.simhashPairs(emptyDocs).count() === 0)
    // empty pair graph: label propagation must converge to empty, not
    // NPE on the null scalar sum
    assert(Dedup.clustersQuery(emptyDocs).count() === 0)
    assert(Dedup.bestSurvivors(emptyDocs).count() === 0)
    assert(graft.text.Corpus.curate(emptyDocs).count() === 0)
    assert(Dedup.contamination(emptyDocs).count() === 0)
    assert(Dedup.decontaminate(emptyDocs).count() === 0)
    assert(graft.text.Corpus.packSequences(emptyDocs).count() === 0)
    assert(graft.text.Corpus.ngramVocab(emptyDocs).count() === 0)
    // round-5 corpus/text operators
    assert(graft.text.Corpus.chunk(emptyDocs).count() === 0)
    assert(graft.text.Corpus.groupSample(emptyDocs).count() === 0)
    assert(graft.text.Corpus.heavyHitters(emptyDocs).count() === 0)
    assert(graft.text.LangModel.surprisal(emptyDocs).count() === 0)
    assert(graft.text.Search.tfidfTop(emptyDocs).count() === 0)
    assert(graft.text.Search.bm25Search(emptyDocs).count() === 0)
    // round-6 operators
    assert(Dedup.dupSpans(emptyDocs).count() === 0)
    assert(Dedup.dupSpanScrub(emptyDocs).count() === 0)
    assert(Dedup.decontaminateFrac(emptyDocs).count() === 0)
    assert(Dedup.embedDedupBest(emptyDocs, emptyEmb).count() === 0)
    // round-7 operators
    assert(Dedup.dupSpanReport(emptyDocs).count() === 0)
    assert(Similarity.kmeansCentroids(emptyEmb).count() === 0)
    assert(Similarity.pqAnn(emptyEmb).count() === 0)
    assert(Similarity.ivfPqAnn(emptyEmb).count() === 0)
    assert(Similarity.ivfSq8Ann(emptyEmb).count() === 0)
    // round-8 operators: the audit emits its full (method, level) grid
    // with n_pairs=0 on an empty corpus; BPE emits no rows
    assert(graft.text.Bpe.bpeTokenize(emptyDocs).count() === 0)
    assert(graft.text.Bpe.trainBpe(emptyDocs).count() === 0)
    assert(graft.text.Bpe.bpeTokenizeTrained(emptyDocs).count() === 0)
    val emptyEval = Dedup.dedupEval(emptyDocs).collect()
    assert(emptyEval.length === 8)
    assert(emptyEval.forall(r => r.getLong(2) === 0L && r.getLong(3) === 0L))
    // round-9/10 operators: the incremental + batch-internal screens
    // and the arbitrary-split screen core
    assert(Dedup.incrementalDedup(emptyDocs).count() === 0)
    assert(Dedup.batchDedup(emptyDocs).count() === 0)
    assert(Dedup.screenAgainst(emptyDocs, emptyDocs).count() === 0)
    assert(Dedup.embedIncremental(emptyEmb).count() === 0)
    assert(Dedup.embedIncremental(emptyEmb, useLsh = true).count() === 0)
    // round-10 session additions
    assert(Dedup.bloomScreen(emptyDocs).count() === 0)
    assert(Dedup.incrementalSpans(emptyDocs).count() === 0)
    assert(Dedup.decontaminateSpans(emptyDocs).count() === 0)
    assert(graft.text.Bpe.fertility(emptyDocs).count() === 0)
    assert(graft.text.Corpus.mixEpochs(emptyDocs).count() === 0)
    assert(graft.text.Corpus.sourceOverlap(emptyDocs).count() === 0)
    assert(graft.ops.Outliers.embedOutliers(emptyEmb).count() === 0)
    assert(Similarity.pcaAnn(emptyEmb).count() === 0)
    assert(Similarity.pcaSpectrum(emptyEmb).count() === 0)
    assert(graft.text.Corpus.packSequencesShuffled(emptyDocs).count() === 0)
    assert(graft.text.Corpus.lengthBuckets(emptyDocs).count() === 0)
    assert(graft.text.LangModel.surprisalTrigram(emptyDocs).count() === 0)
    assert(graft.text.LangModel.pplFilter(emptyDocs).count() === 0)
    assert(Dedup.containmentPairs(emptyDocs).count() === 0)
    assert(Dedup.containedDrop(emptyDocs).count() === 0)
    assert(graft.text.Corpus.curationVerdicts(emptyDocs).count() === 0)
    assert(graft.text.LangModel.pplIncremental(emptyDocs).count() === 0)
    assert(Similarity.ivfCellProfile(emptyEmb).count() === 0)
    assert(Dedup.ingestSpanScrub(emptyDocs).count() === 0)
    // one row of zeros on an empty corpus (the dedupReport convention)
    val emptyMa = Dedup.modalityAgreement(emptyDocs, emptyEmb).collect()
    assert(emptyMa.length === 1 && emptyMa.head.getLong(0) === 0L
      && emptyMa.head.getLong(1) === 0L && emptyMa.head.getLong(2) === 0L)
  }

  test("temporal and outlier operators behave on an empty event stream") {
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType))))
    assert(graft.ops.Temporal.latestSnapshot(emptyEvents).count() === 0)
    assert(graft.ops.Temporal.intervalJoin(emptyEvents).count() === 0)
    assert(graft.ops.Temporal.scd2(emptyEvents).count() === 0)
    assert(graft.ops.Temporal.snapshotDiff(emptyEvents).count() === 0)
    assert(graft.ops.Outliers.spendOutliers(emptyEvents).count() === 0)
    assert(graft.ops.Relational.multiHorizonStats(emptyEvents).count() === 0)
    assert(graft.ops.Relational.dailyActiveApprox(emptyEvents).count() === 0)
    assert(Similarity.labelCentroids(emptyEmb).count() === 0)
    assert(graft.ops.Skew.skewProfileQuery(emptyEvents).count() === 0)
  }

  test("asof attribution and funnel behave on an empty event stream") {
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType))))
    assert(graft.ops.AsOf.attribution(emptyEvents).count() === 0)
    // funnel must report 0 per stage, not NULL sums from the empty agg
    val f = graft.ops.Relational.funnel(emptyEvents).collect()
    assert(f.length === 3)
    assert(f.forall(r => !r.isNullAt(2) && r.getLong(2) === 0L))
  }

  test("similarity operators return empty results on an empty corpus") {
    assert(Dedup.embeddingPairs(emptyEmb).count() === 0)
    assert(Similarity.bruteKnn(emptyEmb).count() === 0)
    assert(Similarity.lshAnn(emptyEmb).count() === 0)
    assert(Similarity.ivfAnn(emptyEmb).count() === 0)
    assert(Similarity.pqAnn(emptyEmb).count() === 0)
    assert(Similarity.sq8Ann(emptyEmb).count() === 0)
  }

  test("single-document and single-token corpora do not break the pair operators") {
    import spark.implicits._
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.ngramPairs(one).count() === 0)
    assert(Dedup.minhashLshPairs(one).count() === 0)
    assert(Dedup.simhashPairs(one).count() === 0)
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text")
    // sub-shingle docs fall back to whole-text shingles: identical
    // single-token docs are a perfect pair
    assert(Dedup.ngramPairs(tiny).count() === 1)
  }
}
