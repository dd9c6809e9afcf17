package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.etl.Retention
import graft.ml.Churn
import graft.mm.Multimodal
import graft.ops.Relational
import graft.streaming.Events
import graft.sim.Similarity
import graft.text.{Corpus, Text}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §6
  * (correctness gate). Every implemented operator has a `queries`
  * entry; every SQL-expressible one has a DuckDB `oracleSql` twin with
  * IDENTICAL column names and the deterministic numeric policy of
  * [[graft.Det]] (integer-cents sums + floor-based rounding) so both
  * engines produce bit-identical values.
  */
object SparkEntry {

  /** Flagship: the cutoff-sliced customer-feature + churn-label table
    * (reference pipeline/etl.py:33-142). Driver smoke-checks rows>0 on
    * sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_customer_features")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- A. Relational / ETL core -----------------------------------
    "q_clean_lines" -> ((s, dir) => Retention.cleanLines(Tables.lineitem(s, dir))),
    // raw-CSV ingestion gate (reference etl.py:13-30): the same clean
    // over a header CSV round-trip of the table — proves the
    // standardization/typecast path is value-exact vs the parquet scan
    "q_csv_clean" -> ((s, dir) =>
      Retention.cleanLines(graft.sources.Csv.lineitemViaCsv(s, dir))),
    // ORC ingestion gate: parquet -> ORC -> columnar read; ORC is
    // self-describing so fidelity, not standardization, is the test
    "q_orc_clean" -> ((s, dir) =>
      Retention.cleanLines(graft.sources.Orc.lineitemViaOrc(s, dir))),
    // Avro ingestion gate (row-oriented wire format, the event-bus/CDC
    // landing shape): parquet -> Avro -> read, then the valid-line
    // clean; TIMESTAMP_NTZ survives via local-timestamp-micros
    // (round-5 addition)
    "q_avro_clean" -> ((s, dir) =>
      Retention.cleanLines(graft.sources.Avro.lineitemViaAvro(s, dir))),
    "q_order_rollup" -> ((s, dir) => Retention.orderRollup(Tables.lineitem(s, dir))),
    // The feature-table consumers read the SESSION-SHARED persisted
    // feature frame (round 16): each previously re-ran the flagship
    // join+aggregate from parquet per query — the cached plan is
    // withSplit(customerFeatures(...)), whose extra `split` projection
    // means the CacheManager cannot substitute it under a freshly
    // built customerFeatures plan, so five queries paid the build.
    // `.drop("split")` is the exact identity on the feature columns
    // (values, order, names) — the oracle hashes are unchanged.
    "q_customer_features" -> ((s, dir) =>
      ml.Churn.featuresWithSplit(s, dir).drop("split")),
    "q_churn_labels" -> ((s, dir) => Retention.churnLabels(Tables.orders(s, dir))),
    "q_segments" -> ((s, dir) =>
      Retention.segments(ml.Churn.featuresWithSplit(s, dir).drop("split"))),
    "q_class_weights" -> ((s, dir) =>
      Retention.classWeightTable(ml.Churn.featuresWithSplit(s, dir).drop("split"))),
    "q_splits" -> ((s, dir) =>
      Retention.splitSummary(ml.Churn.featuresWithSplit(s, dir).drop("split"))),
    "q_pricing_summary" -> ((s, dir) => Relational.pricingSummary(Tables.lineitem(s, dir))),
    "q_join_enrich" -> ((s, dir) =>
      Relational.joinEnrich(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    "q_topn_per_group" -> ((s, dir) =>
      Relational.topNPerGroup(Tables.lineitem(s, dir), Tables.part(s, dir))),
    "q_sessionize" -> ((s, dir) => Relational.sessionize(Tables.events(s, dir))),
    "q_cohort_retention" -> ((s, dir) => Relational.cohortRetention(Tables.events(s, dir))),
    // as-of join (last-touch attribution): one shuffle + running-last
    // window, no range explosion (round-3 addition)
    "q_asof_join" -> ((s, dir) => ops.AsOf.attribution(Tables.events(s, dir))),
    // strict sequential funnel: one shuffle + layered running-min
    // windows (round-3 addition)
    "q_funnel" -> ((s, dir) => Relational.funnel(Tables.events(s, dir))),
    // trailing-window per-event features via a RANGE frame
    // (round-3 addition)
    "q_rolling_features" -> ((s, dir) => Relational.rollingUserStats(Tables.events(s, dir))),
    // multi-horizon (1d/7d/30d) trailing features in ONE shared
    // shuffle+sort — the feature-store materialization shape (round-5
    // addition)
    "q_rolling_multi" -> ((s, dir) => Relational.multiHorizonStats(Tables.events(s, dir))),
    // single-pass numeric column profiler (EDA/data-quality report):
    // one wide aggregate, unpivot on the 1-row result (round-5
    // addition)
    "q_profile" -> ((s, dir) => Relational.profile(Tables.lineitem(s, dir))),
    // Deequ-style declarative constraint suite: completeness /
    // uniqueness / range / accepted-set / referential checks, one
    // verdict row per constraint, one wide aggregate per fact scan
    // (round-11 addition)
    "q_dq_suite" -> ((s, dir) => ops.DataQuality.dqSuite(
      Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir))),
    // one-pass EXACT-moment Pearson correlation matrix — integer
    // moments make it engine-deterministic where the standard
    // double-accumulated form is not (round-5 addition)
    "q_corr" -> ((s, dir) => Relational.corrMatrix(Tables.lineitem(s, dir))),
    // PIVOT with an explicit value list (no driver-side distinct-values
    // pass); two-level PivotFirst plan (round-5 addition)
    "q_event_pivot" -> ((s, dir) => Relational.eventPivot(Tables.events(s, dir))),
    // CDC log->snapshot compaction: one groupBy(max(struct)) shuffle,
    // never a whole-log window sort (round-5 addition)
    "q_latest_snapshot" -> ((s, dir) => ops.Temporal.latestSnapshot(Tables.events(s, dir))),
    // banded interval join: trailing-window attribution as an
    // equi-join on (user, time band), 2x probe fan-out, exact range
    // filter inside the join — never a nested-loop range join
    // (round-5 addition)
    "q_interval_join" -> ((s, dir) => ops.Temporal.intervalJoin(Tables.events(s, dir))),
    // per-user spend z-score outliers: exact integer/decimal moments
    // in one groupBy, stats join back keyed on user (round-5 addition)
    "q_anomaly" -> ((s, dir) => ops.Outliers.spendOutliers(Tables.events(s, dir))),
    // the same exact-integer-moment z-score screen on the EMBEDDING
    // modality: cosine to the label centroid, z within label — the
    // vector-quality gate before indexes/semantic dedup trust the
    // vectors (round-10 addition)
    "q_embed_outliers" -> ((s, dir) => ops.Outliers.embedOutliers(Tables.embeddings(s, dir))),
    // SCD-2 validity intervals from the CDC log: lead() per user, one
    // shuffle; open rows carry a -1 sentinel, never NULL (round-5
    // addition)
    "q_scd2" -> ((s, dir) => ops.Temporal.scd2(Tables.events(s, dir))),
    // two-cutoff snapshot diff in ONE scan + ONE groupBy (conditional
    // struct-maxes); oracle is the independent two-rank-CTE + left
    // join formulation (round-5 addition)
    "q_snapshot_diff" -> ((s, dir) => ops.Temporal.snapshotDiff(Tables.events(s, dir))),
    // MERGE INTO semantics (the writer's view of the snapshot diff):
    // post-merge table with update/insert/noop op labels, both sides
    // from conditional struct-maxes in ONE scan (round-11 addition)
    "q_merge_upsert" -> ((s, dir) => ops.Temporal.mergeUpsert(Tables.events(s, dir))),
    // daily active users via HLL++ sketch: fixed-size mergeable
    // accumulator, shuffle carries |days| x sketch bytes; approximate
    // => rows-only gate + error pin in RelationalSpec (round-5
    // addition)
    "q_distinct_approx" -> ((s, dir) => Relational.dailyActiveApprox(Tables.events(s, dir))),
    // ROLLUP computed two-phase: finest-grain agg first, Expand only
    // over the tiny aggregate (round-5 addition)
    "q_revenue_rollup" -> ((s, dir) =>
      Relational.revenueRollup(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    // CUBE over (region, returnflag), same two-phase shape — Expand
    // only over the finest-grain aggregate (round-5 addition)
    "q_revenue_cube" -> ((s, dir) =>
      Relational.revenueCube(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),
    // fixed-width price histogram: integer-exact bucket cut, one scan,
    // share via a bounded constKey window (round-5 addition)
    "q_histogram" -> ((s, dir) => Relational.priceHistogram(Tables.lineitem(s, dir))),
    // EXACT price percentiles via the two-level cumulative over the
    // distinct-cents domain — no window sees more than
    // max(buckets, bucketCents) rows (round-5 addition)
    "q_price_quantiles" -> ((s, dir) => Relational.priceQuantiles(Tables.lineitem(s, dir))),
    // --- C. Text analysis -------------------------------------------
    "q_token_stats" -> ((s, dir) => Text.tokenStats(Tables.documents(s, dir))),
    "q_text_quality" -> ((s, dir) => Text.quality(Tables.documents(s, dir))),
    // the NAMED Gopher rule bundle (Rae et al. 2021 A13) next to the
    // blended score: per-rule verdicts + conjunction, integer-exact.
    // minStopwords pinned to 1 — this synthetic corpus tops out at one
    // distinct stop word per doc (round-11 addition)
    "q_gopher_filter" -> ((s, dir) =>
      Text.gopherFilter(Tables.documents(s, dir), minStopwords = 1L)),
    // the NAMED C4 rule bundle (Raffel et al. 2020 §2.2) — the other
    // canonical published filter, same per-rule verdict discipline.
    // Terminal-punct/sentence rules computed but not enforced (this
    // corpus ships zero sentence punctuation by construction); the
    // blocklist seam pinned to a corpus-present stand-in so the
    // verdict is non-degenerate (round-11 addition)
    "q_c4_filter" -> ((s, dir) =>
      Text.c4Filter(Tables.documents(s, dir), blocklist = Seq("slow"),
        enforceTerminal = false, enforceSentences = false)),
    "q_text_repetition" -> ((s, dir) => Text.repetition(Tables.documents(s, dir))),
    "q_text_scrub" -> ((s, dir) => Text.scrub(Tables.documents(s, dir))),
    // main-content extraction: the markup strip ahead of every quality
    // and dedup operator — head/script/style/nav dropped WITH content,
    // tags stripped, entities decoded; markup planted from doc_id
    // arithmetic, one codegen regex chain, zero shuffles (round-14
    // addition)
    "q_text_extract" -> ((s, dir) => Text.extract(Tables.documents(s, dir))),
    // PII screen: planted-from-arithmetic emails/phones/IPv4/Luhn
    // cards (the MediaCodec planting discipline — this corpus ships
    // zero PII), detected and validated FOR REAL: octet bounds + a
    // fully-unrolled Luhn mod-10; conservative redaction (every
    // candidate scrubbed), counts report what validated (round-11
    // addition)
    "q_pii_scrub" -> ((s, dir) => text.Pii.piiScrub(Tables.documents(s, dir))),
    // the composed per-doc POLICY table: gopher x c4 x pii x quality
    // with the conjunction (pii vetoes); twin composes the constituent
    // oracles (round-11 addition)
    "q_policy_report" -> ((s, dir) => text.Pii.policyReport(Tables.documents(s, dir))),
    // hash-kernel signed-projection document embeddings: the
    // text-to-vector featurizer bridge, portable-md5-exact in both
    // engines (round-11 addition)
    "q_doc_embed" -> ((s, dir) => text.DocEmbed.docEmbed(Tables.documents(s, dir))),
    // the RAG indexing core: chunk (q72's stride windows) + embed
    // every chunk with the same hash-kernel projection — composed
    // hash-exact (round-11 addition)
    "q_chunk_embed" -> ((s, dir) => text.DocEmbed.chunkEmbed(Tables.documents(s, dir))),
    // the RAG loop's read half: query-doc embeddings probe the chunk
    // index, top-k per query, fully oracle-exact (round-11 addition)
    "q_chunk_search" -> ((s, dir) => text.DocEmbed.chunkSearch(Tables.documents(s, dir))),
    // the 100 TB shape of the read half: the chunk-vector table served
    // through the trained IVF index (kmeansCached/assignCellsCached —
    // the q_semdedup composition), candidates from the cell equi-join,
    // exact re-score; model-dependent ⇒ rows-only, recall floor vs the
    // q_chunk_search brute truth pinned in DocEmbedSpec (round-12
    // addition)
    "q_chunk_search_ann" -> ((s, dir) =>
      text.DocEmbed.chunkSearchAnn(Tables.documents(s, dir))),
    // MMR-diversified retrieval: the re-rank between retrieval and the
    // context window — greedy λ·rel − (1−λ)·max-sim over the exact
    // top-kPool; per-query bounded flatMapGroups; λ=1 ≡ brute top-k
    // pinned in DocEmbedSpec (round-13 addition)
    "q_search_mmr" -> ((s, dir) =>
      text.DocEmbed.chunkSearchMmr(Tables.documents(s, dir))),
    // the quality-threshold ablation ladder: docs/tokens surviving
    // every candidate cutoff of the #19 score in ONE pass (explode to
    // passed thresholds + one ≤steps-row groupBy) (round-13 addition)
    "q_filter_ablation" -> ((s, dir) =>
      Text.filterAblation(Tables.documents(s, dir))),
    "q_lang_id" -> ((s, dir) => Text.langId(Tables.documents(s, dir))),
    // language-ID confusion matrix vs the declared ground truth
    // (round-5 addition)
    "q_langid_eval" -> ((s, dir) => Text.langIdEval(Tables.documents(s, dir))),
    // per-doc top-k salient terms by TF-IDF; rank window bounded by a
    // single document's distinct terms (round-5 addition)
    "q_tfidf" -> ((s, dir) => text.Search.tfidfTop(Tables.documents(s, dir))),
    // BM25 keyword search: scan-side term filter, broadcast idf,
    // fixed-order float association, TakeOrdered top-k (round-5
    // addition)
    "q_bm25_search" -> ((s, dir) => text.Search.bm25Search(Tables.documents(s, dir))),
    // hybrid retrieval: BM25 + brute-kNN fused by integer-micro RRF
    // (the RAG-stack discipline); both constituents are oracle-gated
    // queries, the twin composes their SQL (round-11 addition)
    "q_hybrid_search" -> ((s, dir) =>
      text.Search.hybridSearch(Tables.documents(s, dir), Tables.embeddings(s, dir))),
    "q_fingerprint" -> ((s, dir) => Text.fingerprint(Tables.documents(s, dir))),
    // unigram-LM surprisal (perplexity-proxy quality signal): tf
    // shuffle + vocabulary rollup + broadcast corpus total; per-token
    // integer micro-nats keep the per-doc sum order-free (round-5
    // addition)
    "q_surprisal" -> ((s, dir) => text.LangModel.surprisalCached(Tables.documents(s, dir))),
    // CCNet perplexity-band filter: head/middle/tail terciles of the
    // memoized surprisal seam, exact two-level percentile cuts
    // (round-10 addition)
    "q_ppl_filter" -> ((s, dir) => text.LangModel.pplFilter(Tables.documents(s, dir))),
    // the perplexity screen's crawl-ingest form: batch docs scored
    // under the STORE's smoothed LM against the STORE's shipped cuts
    // (round-10 addition)
    "q_ppl_incremental" ->
      ((s, dir) => text.LangModel.pplIncremental(Tables.documents(s, dir))),
    // the DISK-SERVED form: the store LM is the persisted LmIndex
    // artifact (the shipped-KenLM lifecycle, orders 1-3); order-1
    // scoring is the identical smoothing arithmetic so it shares
    // q_ppl_incremental's oracle verbatim (round-11 addition)
    "q_ppl_incremental_disk" ->
      ((s, dir) => text.LangModel.pplIncrementalDisk(Tables.documents(s, dir))),
    // interpolated bigram-LM surprisal — the next perplexity-filter
    // rung: word ORDER, not just word rarity (round-6 addition)
    "q_surprisal_bigram" -> ((s, dir) => text.LangModel.surprisalBigram(Tables.documents(s, dir))),
    // interpolated trigram-LM surprisal — the last self-estimated rung
    // before an external KenLM; all orders over the trigram event
    // space, one data-sized shuffle (round-10 addition)
    "q_surprisal_trigram" ->
      ((s, dir) => text.LangModel.surprisalTrigram(Tables.documents(s, dir))),
    // --- D. Deduplication -------------------------------------------
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),
    // canonicalize-then-hash dedup: catches case/whitespace/punct
    // re-encodings the raw hash misses; variants planted from doc_id
    // arithmetic (the Pii discipline — this corpus is already
    // canonical), twin replays the planting (round-13 addition)
    "q_dedup_normalized" -> ((s, dir) =>
      Dedup.exactNormalized(Tables.documents(s, dir))),
    // URL canonicalization + keep-first url dedup — the FIRST screen
    // of every crawl pipeline (drop a re-crawled page on its address
    // before touching its bytes): scan-side canonicalization (host
    // case, fragment, trailing slash, utm strip, param sort) + one
    // groupBy(canonical) keep-first; urls planted from doc_id
    // arithmetic (the q_dedup_normalized planting discipline), twin
    // replays planting + every rule (round-15 addition)
    "q_url_dedup" -> ((s, dir) =>
      graft.dedup.UrlDedup.urlDedup(Tables.documents(s, dir))),
    // LINE-level exact dedup, keep-first corpus-wide: the sub-document
    // screen (C4/RefinedWeb repeated-line removal) between whole-doc
    // exact dedup and span scrubbing; boilerplate lines planted from
    // doc_id arithmetic, docs reassembled from surviving lines
    // (round-14 addition)
    "q_dedup_lines" -> ((s, dir) => Dedup.lineDedup(Tables.documents(s, dir))),
    // exact duplicated-SPAN detection (Lee et al. exact-substring
    // modality): cross-doc repeated k-token windows as 8-byte hashes —
    // the shuffles never carry text (round-6 addition)
    "q_dup_spans" -> ((s, dir) => Dedup.dupSpans(Tables.documents(s, dir))),
    // the ACTION for the span report: remove duplicated spans keeping
    // the lowest-doc_id owner copy; cut sets built scan-side from the
    // per-doc dup positions (round-6 addition)
    "q_dup_span_scrub" -> ((s, dir) => Dedup.dupSpanScrub(Tables.documents(s, dir))),
    "q_dup_span_report" -> ((s, dir) => Dedup.dupSpanReport(Tables.documents(s, dir))),
    "q_dedup_ngram" -> ((s, dir) => Dedup.pairsCached(Tables.documents(s, dir))),
    // the Jaccard-cutoff decision table: pairs + implicated docs per
    // candidate tau in ONE pass over the memoized pair graph
    // (integer-micro rung membership — the percolation early-warning)
    // (round-13 addition)
    "q_dedup_sweep" -> ((s, dir) => Dedup.dedupSweep(Tables.documents(s, dir))),
    // asymmetric containment pairs — the short-doc-inside-long-doc
    // modality symmetric Jaccard is blind to (round-10 addition)
    "q_dedup_containment" ->
      ((s, dir) => Dedup.containmentCached(Tables.documents(s, dir))),
    // the ACTION for containment: drop docs contained in a bigger (or
    // lower-id twin) document (round-10 addition)
    "q_contained_drop" ->
      ((s, dir) => Dedup.containedDrop(Tables.documents(s, dir))),
    // cross-modality agreement: does semantic dedup add anything over
    // lexical on this corpus? (round-10 addition) Since round 15 the
    // embedding side is the memoized LSH pair graph — the 100 TB path
    // (the brute composition is the spec-only gate: subset + recall
    // floor pinned in DedupSpec) ⇒ rows-only driver gate
    "q_dedup_modality_agreement" ->
      ((s, dir) => Dedup.modalityAgreement(Tables.documents(s, dir), Tables.embeddings(s, dir))),
    // survivor selection: connected components of the pair graph,
    // keep = min doc_id per component (round-3 addition)
    "q_dedup_clusters" -> ((s, dir) => Dedup.clustersQuery(Tables.documents(s, dir))),
    // quality-priority survivor per cluster: keep the cleanest copy,
    // one max(struct) aggregate — never a per-cluster window sort
    // (round-5 addition)
    "q_dedup_best" -> ((s, dir) => Dedup.bestSurvivors(Tables.documents(s, dir))),
    "q_dedup_report" -> ((s, dir) => Dedup.dedupReport(Tables.documents(s, dir))),
    "q_dedup_minhash" -> ((s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir))),
    "q_dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(Tables.documents(s, dir))),
    "q_dedup_eval" -> ((s, dir) => Dedup.dedupEval(Tables.documents(s, dir))),
    // incremental dedup: screen a new batch against the existing
    // corpus — batch-prefix probes the existing full index (one-sided
    // prefix filter, lossless under any fixed order), cost ∝ batch,
    // never existing×existing; oracle is the brute cross comparison
    // (round-9 addition)
    "q_dedup_incremental" -> ((s, dir) => Dedup.incrementalDedup(Tables.documents(s, dir))),
    // the DISK-SERVED form of the store screen: the store's shingle
    // index is persisted (ShingleIndex sets+postings parquet, the
    // BloomIndex discipline) and the batch probes the read-back
    // layout; verdicts are store-content-determined, so it shares
    // q_dedup_incremental's oracle verbatim (round-11 addition)
    "q_dedup_incremental_disk" -> ((s, dir) => Dedup.incrementalDedupDisk(Tables.documents(s, dir))),
    // the CONTAINMENT modality of the store screen: a landed doc
    // fully inside a stored doc passes Jaccard at |B|>>|A| — this
    // screen catches it via the one-sided prefix probe of the store's
    // full inverted index; wired into q_ingest_decision's verdict
    // (round-11 addition)
    "q_contained_incremental" -> ((s, dir) => Dedup.containedIncremental(Tables.documents(s, dir))),
    // the composed ingest verdict in its disk-served form: both
    // store-facing screens read the persisted ShingleIndex; same
    // oracle as q_ingest_decision (round-11 addition)
    "q_ingest_decision_disk" -> ((s, dir) => Dedup.ingestDecisionDisk(Tables.documents(s, dir))),
    // the batch's OTHER screen: a crawl batch self-duplicates, so
    // after the store screen the batch is screened against itself —
    // first-wins (earlier doc_id kept), same prefix-probe machinery
    // over the batch slice alone (round-10 addition)
    "q_dedup_batch" -> ((s, dir) => Dedup.batchDedup(Tables.documents(s, dir))),
    // the verdict the pipeline acts on: append iff BOTH screens keep
    // (store screen AND first-wins batch self-screen), with the
    // per-screen verdicts in the artifact (round-10 addition)
    "q_ingest_decision" -> ((s, dir) => Dedup.ingestDecision(Tables.documents(s, dir))),
    // incremental SEMANTIC dedup: the batch side broadcasts, the
    // screen is one map-side pass over the existing corpus scan —
    // no n² pairs, no corpus shuffle (round-9 addition)
    "q_embed_incremental" -> ((s, dir) => Dedup.embedIncremental(Tables.embeddings(s, dir))),
    // the 100 TB path for the same screen: hyperplane-LSH blocking
    // replaces dot-everything — the broadcast batch bucket table
    // prefilters the one map-side corpus pass to bucket-matching rows,
    // exact re-score at the join (precision 1, recall-gated vs the
    // brute default in DedupSpec); approximate recall => rows-only
    // driver gate (round-10 addition)
    "q_embed_incremental_lsh" ->
      ((s, dir) => Dedup.embedIncremental(Tables.embeddings(s, dir), useLsh = true)),
    "q_bpe_tokenize" -> ((s, dir) => text.Bpe.bpeTokenize(Tables.documents(s, dir))),
    "q_bpe_train" -> ((s, dir) => text.Bpe.trainBpe(Tables.documents(s, dir))),
    // unigram-LM tokenizer (Kudo 2018, the SentencePiece model):
    // EM-trained piece vocabulary over the word histogram's
    // segmentation lattices; micro-count-deterministic; the EM
    // likelihood curve ships in the artifact (round-11 addition)
    "q_unigram_train" -> ((s, dir) => text.Unigram.unigramTrain(Tables.documents(s, dir))),
    // Viterbi tokenization under the SELF-trained unigram vocabulary
    // (the train->apply composition, the BPE family's q102 shape)
    "q_unigram_tokenize" -> ((s, dir) => text.Unigram.unigramTokenize(Tables.documents(s, dir))),
    // the shipped-tokenizer lifecycle: tokenize under the PERSISTED
    // pieces.txt — bit-equal to in-session (integer micros round-trip)
    "q_unigram_tokenize_disk" -> ((s, dir) => text.Unigram.unigramTokenizeDisk(Tables.documents(s, dir))),
    // tokenizer selection artifact: BPE vs self-trained unigram
    // fertility per language, word counts shared by construction
    "q_tokenizer_compare" -> ((s, dir) => text.Unigram.tokenizerCompare(Tables.documents(s, dir))),
    "q_bpe_train_apply" -> ((s, dir) => text.Bpe.bpeTokenizeTrained(Tables.documents(s, dir))),
    // per-language tokenizer fertility (tokens/word + chars/token) —
    // the tokenizer-fit audit: lang rides the same zero-Exchange
    // scan-side tokenize pipeline, ≤|langs|-row rollup (round-10
    // addition)
    "q_bpe_fertility" -> ((s, dir) => text.Bpe.fertility(Tables.documents(s, dir))),
    "q_dedup_embedding" -> ((s, dir) => Dedup.embeddingPairsCached(Tables.embeddings(s, dir))),
    // the 100 TB path for the same semantics (LSH blocking, exact
    // re-score => precision 1, recall-gated in DedupSpec); approximate
    // recall => rows-only driver gate
    "q_dedup_embedding_lsh" -> ((s, dir) => Dedup.embeddingPairsLshCached(Tables.embeddings(s, dir))),
    // SemDeDup (Abbas et al. 2023): k-means-cluster-scoped semantic
    // dedup keeping the LOWEST-centroid-cosine member per duplicate
    // group — serves from the SAME trained k-means index as
    // q_ann_ivf_kmeans; model-dependent ⇒ rows-only, SemDedupSpec
    // gates (round-11 addition)
    "q_semdedup" -> ((s, dir) => Dedup.semDedup(Tables.embeddings(s, dir))),
    // the DISK-SERVED form: cluster index read back from the persisted
    // ivf_kmeans layout; row-equal to in-session (round-11 addition)
    "q_semdedup_disk" -> ((s, dir) => Dedup.semDedupDisk(Tables.embeddings(s, dir))),
    // CHUNK-level semantic dedup — the SemDeDup paper's passage
    // operand: the chunk-vector table through the same trained-kmeans
    // + within-cell-pairs recipe, catching passages duplicated across
    // otherwise-different documents; rows-only, SemDedupSpec pins the
    // single-chunk identity to doc-level semdedup (round-13 addition)
    "q_semdedup_chunks" ->
      ((s, dir) => graft.text.DocEmbed.semDedupChunks(Tables.documents(s, dir))),
    // SemDeDup-style composition: embedding pair graph -> connected
    // components -> highest-quality document survivor per semantic
    // cluster. Brute pair graph here (oracle-checked vs the recursive
    // closure, like q_dedup_embedding); useLsh=true is the 100 TB
    // path, recall-gated in DedupSpec (round-6 addition)
    "q_embed_dedup_best" -> ((s, dir) =>
      Dedup.embedDedupBest(Tables.documents(s, dir), Tables.embeddings(s, dir))),
    // --- E. Similarity search ---------------------------------------
    "q_knn_brute" -> ((s, dir) => Similarity.bruteKnnCached(Tables.embeddings(s, dir))),
    "q_ann_lsh" -> ((s, dir) => Similarity.lshAnn(Tables.embeddings(s, dir))),
    "q_ann_ivf" -> ((s, dir) => Similarity.ivfAnn(Tables.embeddings(s, dir))),
    // IVF with TRAINED centroids: distributed spherical k-means
    // (Lloyd) plugged into the seam q_ann_ivf's lowest-id seeds stand
    // in for (round-6 addition)
    "q_ann_ivf_kmeans" -> ((s, dir) => Similarity.ivfAnnKmeans(Tables.embeddings(s, dir))),
    "q_ann_pq" -> ((s, dir) => Similarity.pqAnn(Tables.embeddings(s, dir))),
    "q_ann_ivfpq" -> ((s, dir) => Similarity.ivfPqAnn(Tables.embeddings(s, dir))),
    // SQ8 scalar-quantized ANN: uint8 codes (4x compression) scored
    // scan-side, top refine*k re-scored exactly — the third
    // compression point between the flat scan and PQ's nibbles
    // (round-9 addition)
    "q_ann_sq8" -> ((s, dir) => Similarity.sq8Ann(Tables.embeddings(s, dir))),
    // PCA-reduced ANN: rank by the top-m projected dot (m-double rows
    // instead of d — the faiss PCAMatrix pre-transform), exact refine
    // (round-10 addition)
    "q_ann_pca" -> ((s, dir) => Similarity.pcaAnn(Tables.embeddings(s, dir))),
    // IVF-SQ8: cell pruning x uint8 code scoring — completes the
    // pruning x compression matrix (round-10 addition)
    "q_ann_ivf_sq8" -> ((s, dir) => Similarity.ivfSq8Ann(Tables.embeddings(s, dir))),
    // OPQ-style rotated PQ: decorrelate axes via the PCA basis before
    // the subspace split (round-10 addition)
    "q_ann_opq" -> ((s, dir) => Similarity.opqAnn(Tables.embeddings(s, dir))),
    // the variance-spectrum artifact that decides m (round-10 addition)
    "q_embed_pca" -> ((s, dir) => Similarity.pcaSpectrum(Tables.embeddings(s, dir))),
    // recall@k audit of the approximate indexes vs the exact brute
    // top-k — the decision input for serving ANN instead of exact;
    // approximate => rows-only gate + recall floors in SimilaritySpec
    // (round-6 addition)
    "q_ann_eval" -> ((s, dir) => Similarity.annEval(Tables.embeddings(s, dir))),
    // the LEARNED language identifier — the fasttext-lid upgrade of
    // the q_lang_id heuristic, held-out accuracy in the artifact
    // (round-10 addition)
    "q_langid_classifier" ->
      ((s, dir) => graft.ml.LangIdClassifier.trainScore(Tables.documents(s, dir))),
    // IVF cell-balance audit: the probe-cost axis the recall sweep
    // can't see — share spread IS serve-time cost variance
    // (round-10 addition)
    "q_ivf_cell_profile" -> ((s, dir) => Similarity.ivfCellProfile(Tables.embeddings(s, dir))),
    // per-label embedding centroids: 64 codegen avg columns over one
    // shuffle, unpivot on the tiny aggregate (round-5 addition)
    "q_label_centroids" -> ((s, dir) => Similarity.labelCentroids(Tables.embeddings(s, dir))),
    // int8 scalar quantization: two-pass (1-row min/max reduce ->
    // broadcast -> scan-side transform); selections not sums, so
    // bit-exact cross-engine (round-5 addition)
    "q_quantize_int8" -> ((s, dir) => Similarity.quantizeInt8(Tables.embeddings(s, dir))),
    // --- B. ML pipeline (model-dependent => rows-only gate) ---------
    "q_train_coefficients" -> ((s, dir) => Churn.coefficientTable(s, dir)),
    "q_predict_batch" -> ((s, dir) => Churn.predictBatch(s, dir)),
    "q_threshold_sweep" -> ((s, dir) => Churn.thresholdSweepQuery(s, dir)),
    "q_eval_confusion" -> ((s, dir) => Churn.evalConfusion(s, dir)),
    "q_eval_auc" -> ((s, dir) => Churn.evalAuc(s, dir)),
    // reliability/calibration bins over test predictions;
    // model-dependent => rows-only gate (round-5 addition)
    "q_calibration" -> ((s, dir) => Churn.calibrationTable(s, dir)),
    // the LEARNED quality filter: HashingTF over the scan-side token
    // array -> LR on weak labels from the heuristic score — the
    // fasttext-style classifier sweep; model-dependent => rows-only
    // (round-10 addition)
    "q_quality_classifier" ->
      ((s, dir) => ml.QualityFilter.trainScore(Tables.documents(s, dir))),
    // PSI drift of recency between train/test splits — feature-level
    // (no model), so fully oracle-checked; integer micro-nat bin
    // terms (round-5 addition)
    "q_drift_psi" -> ((s, dir) =>
      // the shared persisted feature frame (see q_customer_features);
      // driftPsi re-derives its split column identically via withSplit
      Retention.driftPsi(ml.Churn.featuresWithSplit(s, dir).drop("split"))),
    // --- F. Multimodal ----------------------------------------------
    "q_media_meta" -> ((s, dir) => Multimodal.mediaMeta(Tables.documents(s, dir))),
    "q_media_frames" -> ((s, dir) => Multimodal.mediaFrames(Tables.documents(s, dir))),
    // aspect-preserving resize planning in exact integer arithmetic;
    // the pixel resample is the codec-stub seam (round-4 addition)
    "q_media_resize" -> ((s, dir) => Multimodal.mediaResize(Tables.documents(s, dir))),
    // batched mapPartitions codec seam; imperative => rows-only gate +
    // MultimodalSpec reimplementation equality (round-3 addition)
    "q_media_features" -> ((s, dir) => Multimodal.mediaFeatures(Tables.documents(s, dir))),
    // REAL container-header decode: planted spec-valid PNG/JPEG/GIF
    // bytes parsed inside the typed batch seam (IHDR + CRC verify /
    // SOF0 marker walk / LE logical screen), malformed payloads →
    // quarantine rows; oracle recomputes from planting arithmetic
    // alone, so the hash gate proves the parser reads actual bytes
    // (round-11 addition)
    "q_media_decode" -> ((s, dir) => graft.mm.MediaCodec.mediaDecode(Tables.documents(s, dir))),
    // REAL pixel decode: zlib-inflated IDAT + all-five-filter
    // unfiltering, per-channel sums recomputed by the oracle from
    // planting arithmetic alone (round-11 addition)
    "q_media_pixels" -> ((s, dir) => graft.mm.MediaCodec.mediaPixels(Tables.documents(s, dir))),
    // REAL audio decode: planted spec-valid RIFF/WAVE PCM-16 bytes —
    // word-aligned chunk walk past an odd-sized JUNK chunk, LE fmt
    // parse, full s16 sample decode into integer sum/peak the oracle
    // recomputes from planting arithmetic alone (round-11 addition)
    "q_media_wav" -> ((s, dir) => graft.mm.MediaCodec.mediaWav(Tables.documents(s, dir))),
    // REAL animated-GIF frame walk: block-stream parse (GCT by packed
    // size, generic extension skip, GCE delay capture, sub-block
    // chains, trailer) over planted multi-frame files (round-11
    // addition)
    "q_media_gif_frames" -> ((s, dir) => graft.mm.MediaCodec.mediaGifFrames(Tables.documents(s, dir))),
    // perceptual hash (dHash) from a REAL PNG pixel decode: four
    // 16-bit hash bands per image, oracle recomputes from planting
    // arithmetic — the image fingerprint feeding near-dup image
    // dedup (round-11 addition)
    "q_image_phash" -> ((s, dir) => graft.mm.MediaCodec.phashCached(Tables.documents(s, dir))),
    // near-dup IMAGE pairs: banded Hamming join over the dHash — the
    // SimHash discipline on the decoded-pixel modality; brightness
    // variants hash equal, local edits land within tau=2 bits
    // (round-11 addition)
    "q_image_dedup" -> ((s, dir) => graft.mm.MediaCodec.imageDedup(Tables.documents(s, dir))),
    // the ACT for q_image_dedup: one keep/drop verdict per decodable
    // image — first-wins survivor per perceptual cluster (CC over the
    // Hamming pair graph); singletons keep (round-11 addition)
    "q_image_drop" -> ((s, dir) => graft.mm.MediaCodec.imageDrop(Tables.documents(s, dir))),
    // the IMAGE modality's incremental-ingest screen: landed batch
    // images kept iff no stored image within Hamming tau; one memoized
    // decode pass feeds both sides (round-11 addition)
    "q_image_incremental" -> ((s, dir) => graft.mm.MediaCodec.imageScreen(Tables.documents(s, dir))),
    // the DISK-SERVED form: store hashes probed from the persisted
    // PhashIndex — no store decode per ingest; shares q154's oracle
    // verbatim (round-11 addition)
    "q_image_incremental_disk" -> ((s, dir) => graft.mm.MediaCodec.imageScreenDisk(Tables.documents(s, dir))),
    // the AUDIO perceptual family (round-12 addition, closing the r11
    // verdict's #2 gap: a re-encoded audio copy passed every screen):
    // energy-delta fingerprint from the REAL RIFF/PCM-16 decode,
    // banded Hamming pairs (pigeonhole-exact at tau=2), first-wins
    // drop verdicts, incremental ingest screen — all four hash-exact
    // vs planting-arithmetic oracles
    "q_audio_fingerprint" -> ((s, dir) => graft.mm.AudioFp.fpCached(Tables.documents(s, dir))),
    "q_audio_dedup" -> ((s, dir) => graft.mm.AudioFp.audioDedup(Tables.documents(s, dir))),
    "q_audio_drop" -> ((s, dir) => graft.mm.AudioFp.audioDrop(Tables.documents(s, dir))),
    "q_audio_incremental" -> ((s, dir) => graft.mm.AudioFp.audioScreen(Tables.documents(s, dir))),
    // frame-level animation dedup (round-12 addition, closing the r11
    // verdict's #3 gap): per-frame content signatures from the real
    // GIF block walk, then asymmetric frame-set containment pairs —
    // two cuts sharing n-1 of n frames pair; both hash-exact
    "q_gif_frames" -> ((s, dir) => graft.mm.GifDedup.gifFramesCached(Tables.documents(s, dir))),
    "q_gif_dedup" -> ((s, dir) => graft.mm.GifDedup.gifDedup(Tables.documents(s, dir))),
    // --- G. Streaming (batch-equivalent form; the readStream path is
    // exercised in ScalaTest with a memory sink) ---------------------
    "q_stream_hourly" -> ((s, dir) => Events.hourlyAgg(Tables.events(s, dir))),
    // date-partitioned layout gate: events -> Hive-partitioned by
    // event_date -> pruned range scan (PartitionFilters asserted in
    // PartitionedSpec); value fidelity vs the unpartitioned oracle
    // (round-5 addition)
    "q_partition_prune" -> ((s, dir) => graft.sources.Partitioned.dailyPruned(s, dir)),
    // the small-file compaction maintenance job under the gate: a
    // constructed 64-file micro-batch layout compacts in place, and
    // the rollup over the compacted files must hash-match the oracle
    // over the ORIGINAL parquet — the layout changes the file count,
    // never the answer (round-10 addition)
    "q_compacted_read" -> ((s, dir) => graft.sources.Compact.eventsViaCompacted(s, dir)),
    // sliding-window aggregation (each event in window/slide windows;
    // fan-out inside the scan stage, one shuffle) (round-4 addition)
    "q_stream_sliding" -> ((s, dir) => Events.slidingAgg(Tables.events(s, dir))),
    // native session_window sessionization (merge-on-overlap; works
    // identically under readStream+watermark); oracle is the
    // independent lag-gap formulation with the matching break
    // convention (round-5 addition)
    "q_session_window" -> ((s, dir) => Events.sessionWindowAgg(Tables.events(s, dir))),
    // micro-batch accounting under the deterministic arrival-delay
    // model: per 10-min trigger interval, rows/users/event-time span,
    // the batch-granular watermark (Spark's actual between-batch
    // advance), and the rows it would drop (round-13 addition)
    "q_trigger_batches" -> ((s, dir) => Events.triggerBatches(Tables.events(s, dir))),
    // the watermark DECISION table: drop count + worst lateness per
    // candidate withWatermark delay, by event type — the sweep that
    // sizes the state store before deploying the stream; integer-ms
    // rung membership, hash-exact (round-13 addition)
    "q_watermark_sweep" -> ((s, dir) => Events.watermarkSweep(Tables.events(s, dir))),
    // join-key skew profile over a deliberately skew-planted routing
    // of events (~90% on one hot key): MisraGries sketch -> broadcast
    // exact recount; output equals the naive groupBy, so hash-exact
    // oracle (round-6 addition)
    "q_skew_profile" -> ((s, dir) => graft.ops.Skew.skewProfileQuery(Tables.events(s, dir))),
    // the salted skew join end-to-end: planted ~90%-hot-key fact x
    // routing dim through saltedJoin; oracle is the PLAIN join —
    // salting must change the shuffle layout and nothing else
    // (round-11 addition)
    "q_skew_join" -> ((s, dir) => graft.ops.Skew.skewJoinQuery(Tables.events(s, dir))),
    // Z-order (Morton) layout audit: linear vs z-order bucket
    // envelopes over (user_id, ts) — the multi-dimensional pruning
    // artifact, integer-exact (round-11 addition)
    "q_zorder" -> ((s, dir) => graft.sources.ZOrder.zorderAudit(Tables.events(s, dir))),
    // bucketed-layout gate: orders+lineitem written co-bucketed on the
    // join key (memoized once per dir), then the fact join runs with
    // ZERO exchanges (plan-asserted in BucketingSpec) — hash-equal to
    // the plain-join oracle, proving the layout changes the plan, not
    // the answer (round-9 addition)
    "q_bucketed_join" -> ((s, dir) => graft.sources.Bucketing.bucketedJoinRollup(s, dir)),
    // --- H. Corpus reporting & mixing (round-2 additions) -----------
    "q_corpus_stats" -> ((s, dir) => Corpus.stats(Tables.documents(s, dir))),
    "q_token_entropy" -> ((s, dir) => Corpus.tokenEntropy(Tables.documents(s, dir))),
    "q_source_profile" -> ((s, dir) => Corpus.sourceProfile(Tables.documents(s, dir))),
    // the pairwise cross-source near-dup matrix — which crawls mirror
    // each other; pure composition off the memoized pair graph, zero
    // extra corpus scans (round-10 addition)
    "q_source_overlap" -> ((s, dir) => Corpus.sourceOverlap(Tables.documents(s, dir))),
    // the 100 TB path: sketch percentiles, one aggregation, no
    // per-language sort (agreement-gated in CorpusSpec); sketch-based
    // => rows-only driver gate
    "q_corpus_stats_approx" -> ((s, dir) => Corpus.statsApprox(Tables.documents(s, dir))),
    "q_stratified_sample" -> ((s, dir) =>
      Corpus.stratifiedSample(Tables.documents(s, dir), Corpus.defaultMix)),
    // the composed end-to-end pipeline: lang allow-list + mixture
    // sample (scan-side) -> quality filter -> global-dedup survivor
    // anti-join (round-3 addition)
    "q_corpus_curation" -> ((s, dir) => Corpus.curate(Tables.documents(s, dir))),
    // token-budget mixing: data-dependent keep rate from a tiny
    // per-lang aggregate, broadcast, pure scan-side predicate
    // (round-3 addition)
    "q_token_budget_mix" -> ((s, dir) => Corpus.tokenBudgetSample(Tables.documents(s, dir))),
    // exact k-per-language sample ordered by a PORTABLE hash (md5 of
    // the doc_id string), two-phase rank so the dominant language
    // never sorts in one window task (round-5 addition)
    "q_group_sample" -> ((s, dir) => Corpus.groupSample(Tables.documents(s, dir))),
    // RAG-style overlapping token-window chunking: pure scan-side
    // fan-out (sequence+explode+slice), no shuffle/window/join
    // (round-5 addition)
    "q_chunk" -> ((s, dir) => Corpus.chunk(Tables.documents(s, dir))),
    // XLM-style temperature language mixing: share^(1/T) budget split
    // fixed to integer micro-weights, pure scan-side keep predicate
    // (round-5 addition)
    "q_temperature_mix" -> ((s, dir) => Corpus.temperatureMix(Tables.documents(s, dir))),
    // the recipe table BEHIND the temperature mix: per-language budget
    // share, implied epochs over available tokens, and the ≤maxEpochs
    // repeat-cap verdict — integer micro-arithmetic end to end
    // (round-10 addition)
    "q_mix_epochs" -> ((s, dir) => Corpus.mixEpochs(Tables.documents(s, dir))),
    // the deterministic training-order shuffle: hash to shards, order
    // within shard by the same portable md5 key — one hash partition +
    // per-shard bounded sort, never a global ORDER BY (round-14
    // addition)
    "q_corpus_shuffle" -> ((s, dir) => Corpus.corpusShuffle(Tables.documents(s, dir))),
    // quality-weighted soft sampling: keep probability = quality
    // score, via a portable integer keep draw — one scan, scan-side
    // predicate (round-5 addition)
    "q_weighted_sample" -> ((s, dir) => Corpus.qualityWeightedSample(Tables.documents(s, dir))),
    // --- Round-4 additions ------------------------------------------
    // benchmark decontamination: shared-shingle report + kept corpus
    // (eval shingle set broadcasts; corpus never shuffles by shingle)
    "q_contamination" -> ((s, dir) => Dedup.contamination(Tables.documents(s, dir))),
    "q_decontaminate" -> ((s, dir) => Dedup.decontaminate(Tables.documents(s, dir))),
    // fractional (PaLM-style) decontamination: drop only when the
    // shared-shingle SHARE reaches the threshold; exact integer
    // cross-multiply at the boundary (round-6 addition)
    "q_decontaminate_frac" -> ((s, dir) => Dedup.decontaminateFrac(Tables.documents(s, dir))),
    // SEMANTIC decontamination: the embedding modality of the eval
    // screen — a paraphrased eval item shares no 8-gram but sits next
    // to it in embedding space; constant-sized eval side broadcasts
    // into one map-side corpus pass, zero shuffles (round-14 addition)
    "q_decontaminate_semantic" ->
      ((s, dir) => Dedup.decontaminateSemantic(Tables.embeddings(s, dir))),
    // the BLOOM form of the incremental exact screen: the store ships
    // a compact filter (native mergeable BloomBuild aggregate) and
    // batch docs probe it scan-side (codegen BloomMightContain) —
    // both verdicts in the artifact; hash-model-dependent => rows-only
    // (round-10 addition)
    "q_dedup_bloom" -> ((s, dir) => Dedup.bloomScreen(Tables.documents(s, dir))),
    // the SPAN modality of the incremental screen: how much of a
    // landed batch doc is already verbatim in the store — batch window
    // hashes broadcast into one map-side store pass (round-10
    // addition)
    "q_dup_spans_incremental" ->
      ((s, dir) => Dedup.incrementalSpans(Tables.documents(s, dir))),
    // the ACTION for the span screen: scrub a landed batch doc's
    // store-duplicated spans before appending (round-10 addition)
    "q_ingest_span_scrub" ->
      ((s, dir) => Dedup.ingestSpanScrub(Tables.documents(s, dir))),
    // SPAN-level (surgical) decontamination: cut exactly the
    // eval-overlapping k-token windows out of each training doc —
    // benchmark text never survives, the document does; eval window
    // hashes broadcast, memoized span-window seam (round-10 addition)
    "q_decontaminate_spans" ->
      ((s, dir) => Dedup.decontaminateSpans(Tables.documents(s, dir))),
    // concat-and-chunk sequence packing via the two-level cumsum
    "q_pack_sequences" -> ((s, dir) => Corpus.packSequences(Tables.documents(s, dir))),
    // FIXED-BIN whole-document FFD packing in bounded doc_id groups —
    // the padding-near-optimal layout between concat-and-chunk and
    // batch-by-length; hash-exact vs a recursive-CTE FFD replay
    // (round-13 addition)
    "q_pack_bins" -> ((s, dir) => Corpus.packBins(Tables.documents(s, dir))),
    // the export-shard manifest: ingestion-order docs cut into
    // ~targetTokens shards via the packSequences two-level cumsum +
    // one rollup — the write side's file plan with id ranges and the
    // fill-skew audit (round-13 addition)
    "q_shard_manifest" -> ((s, dir) =>
      Corpus.shardManifest(Tables.documents(s, dir))),
    // packing under the TOKENIZER's budget (BPE counts, not whitespace
    // words) — the production training-data layout composition
    // (round-9 addition)
    "q_pack_bpe" -> ((s, dir) => Corpus.packSequencesBpe(Tables.documents(s, dir))),
    // packing under a deterministic document SHUFFLE (portable md5
    // order) — one training sequence mixes unrelated documents
    // instead of a contiguous ingestion run (round-10 addition)
    "q_pack_shuffled" ->
      ((s, dir) => Corpus.packSequencesShuffled(Tables.documents(s, dir))),
    // the padding bill of batch-by-length serving — the layout
    // decision packing competes with (round-10 addition)
    "q_length_buckets" -> ((s, dir) => Corpus.lengthBuckets(Tables.documents(s, dir))),
    // the full curation funnel with per-stage verdicts — quality,
    // perplexity band, dedup survivorship, containment (round-10
    // addition)
    "q_curation_verdicts" -> ((s, dir) => Corpus.curationVerdicts(Tables.documents(s, dir))),
    // per-language top-k bigram vocabulary (two-phase exact top-k)
    "q_ngram_vocab" -> ((s, dir) => Corpus.ngramVocab(Tables.documents(s, dir))),
    // the tokenizer-sizing table: exact top-N occurrence coverage at
    // every pow2 vocab size, computed from the COUNT HISTOGRAM (never
    // a global vocabulary rank) (round-13 addition)
    "q_vocab_coverage" -> ((s, dir) => Corpus.vocabCoverage(Tables.documents(s, dir))),
    // exact heavy hitters over the open token domain, two-pass:
    // MisraGries sketch (<= k counters per partition cross the
    // network) -> broadcast candidates -> exact recount; output equals
    // the naive full groupBy, so it is oracle-checked (round-5
    // addition)
    "q_heavy_hitters" -> ((s, dir) => Corpus.heavyHitters(Tables.documents(s, dir))),
    // JSONL ingestion gate: parquet -> JSONL -> schema-declared read;
    // md5(text) pins byte-exact round-tripping of the text column
    "q_jsonl_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, md5}
      graft.sources.Jsonl.documentsViaJsonl(s, dir).select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
    })
  )

  // ---------------------------------------------------------------
  // DuckDB oracles. Shared CTE fragments keep the SQL in lockstep
  // with the Scala plans; constants mirror Retention.Config defaults.
  // SQL twins of graft.Det: cents(x) = CAST(floor(x*100.0+0.5) AS
  // BIGINT); r_n(x) = floor(x*10^n + 0.5)/10^n.
  // ---------------------------------------------------------------
  private val T  = "TIMESTAMP '2000-06-30 23:59:59'"
  private val T1 = "TIMESTAMP '2000-12-27 23:59:59'" // cutoff + 180d
  private val R  = "TIMESTAMP '2000-04-01 23:59:59'" // cutoff - 90d

  private def cents(x: String)         = s"CAST(floor($x * 100.0 + 0.5) AS BIGINT)"
  private def r(x: String, n: Int)     = { val s = "1" + "0" * n + ".0"; s"floor($x * $s + 0.5) / $s" }

  /** Features CTE — the DuckDB twin of Retention.customerFeatures. */
  private val featuresCte: String =
    s"""WITH j AS (
       |  SELECT o.o_custkey AS custkey, o.o_orderdate AS od,
       |         l.l_orderkey, l.l_partkey, l.l_quantity, l.l_extendedprice
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0 AND o.o_custkey IS NOT NULL
       |), f AS (
       |  SELECT custkey,
       |    count(DISTINCT CASE WHEN od <= $T THEN l_orderkey END) AS total_orders,
       |    sum(CASE WHEN od <= $T THEN l_quantity END) AS total_qty_raw,
       |    sum(CASE WHEN od <= $T THEN ${cents("l_extendedprice")} END) AS total_cents,
       |    count(DISTINCT CASE WHEN od <= $T THEN l_partkey END) AS distinct_products,
       |    max(CASE WHEN od <= $T THEN od END) AS last_purchase_ts,
       |    count(DISTINCT CASE WHEN od > $R AND od <= $T THEN l_orderkey END) AS recent90_orders,
       |    sum(CASE WHEN od > $R AND od <= $T THEN ${cents("l_extendedprice")} END) AS recent90_cents,
       |    max(CASE WHEN od > $T AND od <= $T1 THEN 1.0 ELSE 0.0 END) AS has_future
       |  FROM j GROUP BY 1
       |), d AS (
       |  SELECT custkey, total_orders, total_qty_raw, distinct_products, recent90_orders,
       |    CAST(coalesce(total_cents, 0) AS DOUBLE) / 100.0 AS total_amount,
       |    CAST(coalesce(recent90_cents, 0) AS DOUBLE) / 100.0 AS recent90_amount,
       |    CAST(datediff('day', CAST(last_purchase_ts AS DATE), DATE '2000-06-30') AS INTEGER) AS recency_days,
       |    has_future
       |  FROM f WHERE total_orders >= 1
       |), feats AS (
       |  SELECT custkey, total_orders,
       |    coalesce(total_qty_raw, 0.0) AS total_qty,
       |    total_amount,
       |    ${r("total_amount / total_orders", 4)} AS avg_order_amount,
       |    distinct_products, recent90_orders, recent90_amount, recency_days,
       |    ${r("ln(1.0 + total_amount)", 6)} AS total_amount_log,
       |    ${r("ln(1.0 + recent90_amount)", 6)} AS recent90_amount_log,
       |    CASE WHEN has_future = 1.0 THEN 0.0 ELSE 1.0 END AS label
       |  FROM d
       |), cohort AS (
       |  SELECT * FROM feats WHERE total_orders >= 2 OR recency_days <= 180
       |)""".stripMargin

  private val cleanLinesSql: String =
    s"""SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, l_partkey AS partkey,
       |  l_quantity AS qty, l_extendedprice AS amount,
       |  ${r("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 2)} AS net_amount
       |FROM lineitem
       |WHERE l_orderkey IS NOT NULL AND l_quantity > 0 AND l_extendedprice > 0""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_clean_lines" -> cleanLinesSql,
    // the CSV round-trip must be value-exact vs the parquet source, so
    // the oracle is the parquet-table query itself
    "q_csv_clean" -> cleanLinesSql,
    // same fidelity contract as the CSV round-trip: oracle is the
    // parquet-table query itself
    "q_orc_clean" -> cleanLinesSql,
    // same fidelity contract again: oracle is the parquet-table query
    "q_avro_clean" -> cleanLinesSql,
    "q_order_rollup" ->
      s"""SELECT l_orderkey AS orderkey, count(*) AS order_lines,
         |  sum(l_quantity) AS order_qty,
         |  CAST(sum(${cents("l_extendedprice")}) AS DOUBLE) / 100.0 AS order_amount,
         |  count(DISTINCT l_partkey) AS distinct_parts,
         |  strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship_date
         |FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0
         |GROUP BY 1""".stripMargin,
    "q_customer_features" -> s"$featuresCte SELECT * FROM cohort",
    "q_churn_labels" ->
      s"""SELECT o_custkey AS custkey,
         |  CAST(sum(CASE WHEN o_orderdate <= $T THEN 1 ELSE 0 END) AS BIGINT) AS hist_orders,
         |  CAST(CASE WHEN max(CASE WHEN o_orderdate > $T AND o_orderdate <= $T1 THEN 1.0 ELSE 0.0 END) = 1.0
         |       THEN 0.0 ELSE 1.0 END AS DOUBLE) AS label
         |FROM orders WHERE o_custkey IS NOT NULL
         |GROUP BY 1
         |HAVING sum(CASE WHEN o_orderdate <= $T THEN 1 ELSE 0 END) >= 1""".stripMargin,
    "q_segments" ->
      s"""$featuresCte, seg AS (
         |  SELECT *, CASE WHEN total_orders = 1 AND recency_days <= 180 THEN 'new'
         |                 WHEN recency_days > 180 THEN 'churned'
         |                 ELSE 'active_repeat' END AS segment
         |  FROM cohort
         |), rolled AS (
         |  SELECT segment, count(*) AS n_customers,
         |    sum(total_orders) AS sum_orders,
         |    sum(${cents("total_amount")}) AS seg_cents
         |  FROM seg GROUP BY 1
         |)
         |SELECT segment, n_customers,
         |  ${r("CAST(sum_orders AS DOUBLE) / n_customers", 4)} AS avg_orders,
         |  ${r("CAST(seg_cents AS DOUBLE) / 100.0 / n_customers", 2)} AS avg_amount,
         |  ${r("CAST(seg_cents AS DOUBLE) / CAST(sum(seg_cents) OVER () AS DOUBLE)", 6)} AS revenue_share
         |FROM rolled""".stripMargin,
    "q_class_weights" ->
      s"""$featuresCte, counts AS (
         |  SELECT label, count(*) AS n FROM cohort GROUP BY 1
         |), w AS (
         |  SELECT label, n,
         |    sum(CASE WHEN label = 1.0 THEN n ELSE 0 END) OVER () AS pos,
         |    sum(CASE WHEN label = 0.0 THEN n ELSE 0 END) OVER () AS neg
         |  FROM counts
         |)
         |SELECT label, n,
         |  ${r("CASE WHEN label = 1.0 THEN CAST(neg AS DOUBLE) / CAST(greatest(pos, 1) AS DOUBLE) ELSE 1.0 END", 6)} AS class_weight
         |FROM w""".stripMargin,
    "q_drift_psi" -> Retention.sqlDriftPsi(featuresCte),
    "q_splits" ->
      s"""$featuresCte
         |SELECT CASE WHEN custkey % 20 < 14 THEN 'train'
         |            WHEN custkey % 20 < 17 THEN 'val'
         |            ELSE 'test' END AS split,
         |  count(*) AS n_customers,
         |  ${r("sum(label) / count(*)", 6)} AS pos_rate
         |FROM cohort GROUP BY 1""".stripMargin,
    "q_pricing_summary" ->
      s"""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  CAST(sum(${cents("l_extendedprice")}) AS DOUBLE) / 100.0 AS sum_base_price,
         |  ${r("CAST(sum(" + cents("l_extendedprice") + ") AS DOUBLE) / 100.0 / count(*)", 4)} AS avg_price,
         |  ${r("CAST(sum(" + cents("l_discount") + ") AS DOUBLE) / 100.0 / count(*)", 6)} AS avg_disc,
         |  count(*) AS count_order,
         |  count(DISTINCT l_orderkey) AS n_orders
         |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_join_enrich" ->
      s"""WITH dims AS (
         |  SELECT c_custkey, n_name AS nation, r_name AS region
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |                JOIN region ON n_regionkey = r_regionkey
         |), pc AS (
         |  SELECT o_custkey, count(*) AS cust_orders,
         |    sum(${cents("o_totalprice")}) AS cust_cents
         |  FROM orders GROUP BY 1
         |)
         |SELECT region, nation, count(*) AS n_customers,
         |  CAST(sum(cust_orders) AS BIGINT) AS n_orders,
         |  CAST(sum(cust_cents) AS DOUBLE) / 100.0 AS revenue
         |FROM pc JOIN dims ON o_custkey = c_custkey
         |GROUP BY 1, 2""".stripMargin,
    "q_topn_per_group" ->
      s"""WITH pp AS (
         |  SELECT l_partkey, sum(${cents("l_extendedprice")}) AS part_cents
         |  FROM lineitem GROUP BY 1
         |), rk AS (
         |  SELECT p_brand AS brand, l_partkey AS partkey, part_cents,
         |    row_number() OVER (PARTITION BY p_brand ORDER BY part_cents DESC, l_partkey ASC) AS "rank"
         |  FROM pp JOIN part ON l_partkey = p_partkey
         |)
         |SELECT brand, "rank", partkey,
         |  CAST(part_cents AS DOUBLE) / 100.0 AS part_revenue
         |FROM rk WHERE "rank" <= 3""".stripMargin,
    "q_asof_join" -> ops.AsOf.sqlAttribution(),
    "q_latest_snapshot" -> ops.Temporal.sqlLatestSnapshot(),
    "q_interval_join" -> ops.Temporal.sqlIntervalJoin(),
    "q_scd2" -> ops.Temporal.sqlScd2(),
    "q_snapshot_diff" -> ops.Temporal.sqlSnapshotDiff(),
    "q_anomaly" -> ops.Outliers.sqlSpendOutliers(),
    "q_embed_outliers" -> ops.Outliers.sqlEmbedOutliers(),
    "q_event_pivot" -> Relational.sqlEventPivot(),
    "q_revenue_rollup" -> Relational.sqlRevenueRollup(),
    "q_revenue_cube" -> Relational.sqlRevenueCube(),
    "q_histogram" -> Relational.sqlPriceHistogram(),
    "q_price_quantiles" -> Relational.sqlPriceQuantiles(),
    "q_funnel" -> Relational.sqlFunnel(),
    "q_rolling_features" -> Relational.sqlRollingUserStats(),
    "q_rolling_multi" -> Relational.sqlMultiHorizonStats(),
    "q_profile" -> Relational.sqlProfile(),
    "q_corr" -> Relational.sqlCorrMatrix(),
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events
        |), g AS (
        |  SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM e
        |), s AS (
        |  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS is_new FROM g
        |), c AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s
        |)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  max(ts_ms) - min(ts_ms) AS duration_ms,
        |  count(DISTINCT event_type) AS n_event_types,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
        |), fw AS (
        |  SELECT user_id, min(week) AS cohort_week FROM a GROUP BY 1
        |)
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
        |  CAST(datediff('day', cohort_week, week) / 7 AS INTEGER) AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM a JOIN fw USING (user_id)
        |GROUP BY fw.cohort_week, a.week""".stripMargin,
    "q_token_stats" -> Text.sqlTokenStats,
    "q_text_quality" -> Text.sqlQuality,
    "q_filter_ablation" -> Text.sqlFilterAblation(),
    "q_gopher_filter" -> Text.sqlGopherFilter(minStopwords = 1L),
    "q_c4_filter" -> Text.sqlC4Filter(blocklist = Seq("slow"),
      enforceTerminal = false, enforceSentences = false),
    "q_text_repetition" -> Text.sqlRepetition,
    "q_text_scrub" -> Text.sqlScrub,
    "q_text_extract" -> Text.sqlExtract,
    "q_pii_scrub" -> text.Pii.sqlPiiScrub,
    "q_policy_report" -> text.Pii.sqlPolicyReport,
    "q_doc_embed" -> text.DocEmbed.sqlDocEmbed,
    "q_chunk_embed" -> text.DocEmbed.sqlChunkEmbed(),
    "q_chunk_search" -> text.DocEmbed.sqlChunkSearch(),
    "q_lang_id" -> Text.sqlLangId,
    "q_langid_eval" -> Text.sqlLangIdEval,
    "q_tfidf" -> text.Search.sqlTfidfTop(),
    "q_surprisal" -> text.LangModel.sqlSurprisal(),
    "q_ppl_filter" -> text.LangModel.sqlPplFilter(),
    "q_ppl_incremental" -> text.LangModel.sqlPplIncremental(),
    "q_ppl_incremental_disk" -> text.LangModel.sqlPplIncremental(),
    "q_surprisal_bigram" -> text.LangModel.sqlSurprisalBigram(),
    "q_surprisal_trigram" -> text.LangModel.sqlSurprisalTrigram(),
    "q_bm25_search" -> text.Search.sqlBm25Search(),
    "q_fingerprint" -> Text.sqlFingerprint,
    "q_bpe_tokenize" -> text.Bpe.sqlBpeTokenize(),
    "q_bpe_fertility" -> text.Bpe.sqlFertility(),
    "q_bpe_train" -> text.Bpe.sqlTrainBpe(),
    "q_bpe_train_apply" -> text.Bpe.sqlBpeTokenizeTrained(),
    // q_dedup_minhash / q_dedup_simhash are sketch-based (not
    // SQL-expressible) => rows-only driver gate + ScalaTest invariants;
    // q_dedup_eval audits both against the exact pair set (same hash
    // models => rows-only, monotone-recall-pinned in DedupSpec).
    "q_dedup_exact" -> Dedup.sqlExact,
    "q_dedup_normalized" -> Dedup.sqlExactNormalized,
    "q_url_dedup" -> graft.dedup.UrlDedup.sqlUrlDedup,
    "q_dedup_lines" -> Dedup.sqlLineDedup,
    "q_dup_spans" -> Dedup.sqlDupSpans(),
    "q_dup_span_scrub" -> Dedup.sqlDupSpanScrub(),
    "q_dup_span_report" -> Dedup.sqlDupSpanReport(),
    "q_dedup_ngram" -> Dedup.sqlNgramPairs(),
    "q_dedup_sweep" -> Dedup.sqlDedupSweep(),
    "q_dedup_containment" -> Dedup.sqlContainmentPairs(),
    // q_dedup_modality_agreement: hash gate RESTORED in round 16 — the
    // LSH bucketing is deterministic integer hashing, so the twin
    // replays it exactly (plane hashes, sign buckets, 1-bit-flip
    // probes, exact rescoring); the brute sqlModalityAgreement stays
    // the spec-scale subset gate
    "q_dedup_modality_agreement" -> Dedup.sqlModalityAgreementLsh(),
    "q_contained_drop" -> Dedup.sqlContainedDrop(),
    "q_dedup_incremental" -> Dedup.sqlIncrementalDedup(),
    "q_dedup_incremental_disk" -> Dedup.sqlIncrementalDedup(),
    "q_contained_incremental" -> Dedup.sqlContainedIncremental(),
    "q_ingest_decision_disk" -> Dedup.sqlIngestDecision(),
    "q_dedup_batch" -> Dedup.sqlBatchDedup(),
    "q_ingest_decision" -> Dedup.sqlIngestDecision(),
    "q_embed_incremental" -> Dedup.sqlEmbedIncremental(),
    "q_dedup_clusters" -> Dedup.sqlClusters(),
    "q_dedup_best" -> Dedup.sqlBestSurvivors(),
    "q_dedup_report" -> Dedup.sqlDedupReport(),
    "q_dedup_embedding" -> Dedup.sqlEmbeddingPairs(),
    "q_embed_dedup_best" -> Dedup.sqlEmbedDedupBest(),
    // q_ann_lsh / q_ann_ivf are approximate => rows-only driver gate +
    // recall-vs-brute ScalaTest.
    "q_knn_brute" -> Similarity.sqlBruteKnn(),
    "q_label_centroids" -> Similarity.sqlLabelCentroids(),
    "q_quantize_int8" -> Similarity.sqlQuantizeInt8(),
    "q_media_meta" -> Multimodal.sqlMediaMeta,
    "q_media_frames" -> Multimodal.sqlMediaFrames,
    "q_media_resize" -> Multimodal.sqlMediaResize(),
    "q_media_decode" -> graft.mm.MediaCodec.sqlMediaDecode,
    "q_media_pixels" -> graft.mm.MediaCodec.sqlMediaPixels,
    "q_media_wav" -> graft.mm.MediaCodec.sqlMediaWav,
    "q_media_gif_frames" -> graft.mm.MediaCodec.sqlMediaGifFrames,
    "q_image_phash" -> graft.mm.MediaCodec.sqlImagePhash,
    "q_image_dedup" -> graft.mm.MediaCodec.sqlImageDedup(),
    "q_image_drop" -> graft.mm.MediaCodec.sqlImageDrop(),
    "q_image_incremental" -> graft.mm.MediaCodec.sqlImageScreen(),
    "q_image_incremental_disk" -> graft.mm.MediaCodec.sqlImageScreen(),
    "q_audio_fingerprint" -> graft.mm.AudioFp.sqlAudioFingerprint,
    "q_audio_dedup" -> graft.mm.AudioFp.sqlAudioDedup(),
    "q_audio_drop" -> graft.mm.AudioFp.sqlAudioDrop(),
    "q_audio_incremental" -> graft.mm.AudioFp.sqlAudioScreen(),
    "q_gif_frames" -> graft.mm.GifDedup.sqlGifFrames,
    "q_gif_dedup" -> graft.mm.GifDedup.sqlGifDedup(),
    "q_stream_hourly" -> Events.sqlHourlyAgg,
    "q_partition_prune" -> graft.sources.Partitioned.sqlDailyPruned(),
    "q_compacted_read" -> graft.sources.Compact.sqlCompactedRollup,
    "q_skew_profile" -> graft.ops.Skew.sqlSkewProfile(),
    "q_skew_join" -> graft.ops.Skew.sqlSkewJoin,
    "q_dq_suite" -> graft.ops.DataQuality.sqlDqSuite,
    "q_merge_upsert" -> graft.ops.Temporal.sqlMergeUpsert(),
    "q_hybrid_search" -> text.Search.sqlHybridSearch(),
    "q_zorder" -> graft.sources.ZOrder.sqlZorderAudit,
    "q_bucketed_join" -> graft.sources.Bucketing.sqlBucketedJoinRollup,
    "q_stream_sliding" -> Events.sqlSlidingAgg(),
    "q_session_window" -> Events.sqlSessionWindowAgg(),
    "q_trigger_batches" -> Events.sqlTriggerBatches(),
    "q_watermark_sweep" -> Events.sqlWatermarkSweep(),
    "q_corpus_stats" -> Corpus.sqlStats,
    "q_token_entropy" -> Corpus.sqlTokenEntropy,
    "q_source_profile" -> Corpus.sqlSourceProfile,
    "q_source_overlap" -> Corpus.sqlSourceOverlap(),
    "q_stratified_sample" -> Corpus.sqlStratifiedSample(),
    "q_corpus_curation" -> Corpus.sqlCurate(),
    "q_token_budget_mix" -> Corpus.sqlTokenBudgetSample(),
    "q_group_sample" -> Corpus.sqlGroupSample(),
    "q_chunk" -> Corpus.sqlChunk(),
    "q_temperature_mix" -> Corpus.sqlTemperatureMix(),
    "q_mix_epochs" -> Corpus.sqlMixEpochs(),
    "q_corpus_shuffle" -> Corpus.sqlCorpusShuffle(),
    "q_weighted_sample" -> Corpus.sqlQualityWeightedSample(),
    "q_contamination" -> Dedup.sqlContamination(),
    "q_decontaminate" -> Dedup.sqlDecontaminate(),
    "q_decontaminate_frac" -> Dedup.sqlDecontaminateFrac(),
    "q_decontaminate_semantic" -> Dedup.sqlDecontaminateSemantic(),
    "q_decontaminate_spans" -> Dedup.sqlDecontaminateSpans(),
    "q_dup_spans_incremental" -> Dedup.sqlIncrementalSpans(),
    "q_ingest_span_scrub" -> Dedup.sqlIngestSpanScrub(),
    "q_pack_sequences" -> Corpus.sqlPackSequences(),
    "q_pack_bins" -> Corpus.sqlPackBins(),
    "q_shard_manifest" -> Corpus.sqlShardManifest(),
    "q_pack_bpe" -> Corpus.sqlPackSequencesBpe(),
    "q_pack_shuffled" -> Corpus.sqlPackSequencesShuffled(),
    "q_length_buckets" -> Corpus.sqlLengthBuckets(),
    "q_curation_verdicts" -> Corpus.sqlCurationVerdicts(),
    "q_ngram_vocab" -> Corpus.sqlNgramVocab(),
    "q_vocab_coverage" -> Corpus.sqlVocabCoverage(),
    "q_heavy_hitters" -> Corpus.sqlHeavyHitters(),
    // the JSONL round-trip must be value-exact vs the parquet source,
    // so the oracle reads the parquet table directly
    "q_jsonl_ingest" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents""".stripMargin
  )
}
