package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator: materialize an sf-N dataset from the
  * sf-0.1 driver testdata so the bench can be captured beyond the
  * largest driver-shipped scale (the round-10 verdict's "the bench
  * has only ever run sf0.1" gap). `/root/testdata` is read-only, so
  * the output lands in a caller-chosen directory (gitignored
  * `localdata/` by convention).
  *
  * Two scaling strategies, chosen per table family:
  *
  *   - RELATIONAL tables (customer/supplier/part/orders/lineitem/
  *     events) replicate `copies`× with consistent key shifts: every
  *     foreign key shifts by the same copy offset, so each copy is an
  *     internally-consistent shard and the scaled dataset has exactly
  *     TPC-H's growth shape (10× orders, ~constant lineitems per
  *     order, 10× users in the same 30-day event window). Marginal
  *     value distributions are preserved verbatim.
  *
  *   - TEXT + EMBEDDINGS generate FRESH rows as a pure hash function
  *     of the row id (splitmix-style xxhash64 draws — fully
  *     distributed, no driver loops, no joins: a planted duplicate
  *     re-evaluates the generator at its SOURCE id). Replication
  *     would give every doc 9 exact cross-copy twins — a pathological
  *     duplicate structure that would quadratically distort the dedup
  *     families' scaling measurement. Doc shape: 8–100 token docs,
  *     ~40% en / 15% each zh-es-fr-de, 20 uniform sources, ~0.5%
  *     exact twins, ~4% near-dup plants; embeddings 64-dim uniform
  *     floats with 10 labels and ~3% perturbed near-dup plants.
  *
  *     VOCABULARY GROWS WITH THE CORPUS (Heaps' law — the round-14
  *     verdict's "honest scale corpus" item): each token draws 50/50
  *     from a fixed 40-word HEAD (the common words every real corpus
  *     shares, so boilerplate-grade shingles still exist and the
  *     hot-posting paths stay exercised) or from a TAIL of
  *     ⌈8·√(total tokens)⌉ synthetic word types (V = K·N^β with
  *     β = 0.5 — the published Heaps exponent range for web text).
  *     The pre-round-15 generator drew every token from the fixed 40
  *     words, so shingle/simhash/minhash candidate mass densified ~n²
  *     purely as a corpus artifact (SCALING.md's measured exp3 1.78
  *     on the canonical banded simhash plan); with the Heaps tail,
  *     candidate sparsity scales the way a real crawl's does and the
  *     ladder measures the OPERATORS, not the generator.
  *
  * Usage: runMain graft.tools.GenSf <srcSfDir> <outDir> [copies=10]
  */
object GenSf {

  private val Vocab: Seq[String] = Seq(
    "spark", "line", "column", "order", "small", "sort", "fast", "value",
    "scan", "hash", "slow", "group", "batch", "agg", "part", "query",
    "table", "vector", "stream", "filter", "big", "merge", "a", "the",
    "key", "window", "join", "row", "data", "customer", "or", "and",
    "index", "cache", "shuffle", "plan", "read", "write", "node", "disk")

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "localdata/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .appName("graft-gensf")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try generate(spark, src, out, copies)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    require(copies >= 1)
    val copyDf = spark.range(copies).select(col("id").as("__copy"))

    def replicate(name: String, shifts: Map[String, Long]): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val outDf = base.crossJoin(broadcast(copyDf))
      val shifted = shifts.foldLeft(outDf) { case (df, (c, max)) =>
        df.withColumn(c, col(c) + col("__copy") * lit(max))
      }
      // the source sf0.1 tables arrive in 1-2 files, and crossJoin
      // inherits that partitioning — an 18M-row sf3 lineitem written
      // as TWO files caps every downstream scan at ~2-way parallelism
      // (a layout no real warehouse has; measured: q_pricing_summary
      // spent its whole 18 s in a near-serial scan). Write the scaled
      // tables in session-parallelism file counts like any real
      // ingest job would.
      shifted.drop("__copy")
        .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[gensf] $name: ${base.count()} x $copies")
    }

    def maxOf(name: String, c: String): Long =
      spark.read.parquet(s"$src/$name.parquet").agg(max(col(c))).head().getLong(0) + 1L

    // fixed dimension tables copy verbatim
    for (t <- Seq("region", "nation")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    val (maxCust, maxSupp, maxPart, maxOrd) =
      (maxOf("customer", "c_custkey"), maxOf("supplier", "s_suppkey"),
        maxOf("part", "p_partkey"), maxOf("orders", "o_orderkey"))
    replicate("customer", Map("c_custkey" -> maxCust))
    replicate("supplier", Map("s_suppkey" -> maxSupp))
    replicate("part", Map("p_partkey" -> maxPart))
    replicate("orders", Map("o_orderkey" -> maxOrd, "o_custkey" -> maxCust))
    replicate("lineitem", Map(
      "l_orderkey" -> maxOrd, "l_partkey" -> maxPart, "l_suppkey" -> maxSupp))
    // events: normalized ts (handles the driver's NANOS encoding),
    // ids/users shift, the 30-day window stays fixed — 10x the users
    // in the same wall-clock span, the production growth shape
    locally {
      val ev = graft.Tables.events(spark, src)
      val maxEvId = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
      val maxUser = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
      ev.crossJoin(broadcast(copyDf))
        .withColumn("event_id", col("event_id") + col("__copy") * lit(maxEvId))
        .withColumn("user_id", col("user_id") + col("__copy") * lit(maxUser))
        .drop("__copy")
        .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
      println(s"[gensf] events: ${ev.count()} x $copies")
    }

    // ---- documents: fresh generation, pure function of doc_id
    val nDocsBase = spark.read.parquet(s"$src/documents.parquet").count()
    val nDocs = nDocsBase * copies
    val vocabArr = s"array(${Vocab.map(w => s"'$w'").mkString(", ")})"
    // Heaps-law tail size: V = ⌈8·√N⌉ over N ≈ nDocs · E[tokens/doc]
    // (mean of 8 + U{0..92} = 54). Fixed per generated dataset so the
    // text stays a pure function of (id, j) and planted duplicates
    // re-evaluate identically.
    val tailSize = math.max(1000L, math.ceil(8.0 * math.sqrt(nDocs * 54.0)).toLong)
    // base text of ANY id column — re-evaluated at the source id for
    // planted duplicates, so no join materializes. Token draw: 50%
    // head word (fixed 40), 50% Heaps-tail word.
    def baseText(idCol: String): String = {
      val n = s"(8 + pmod(xxhash64($idCol, 1), 93))"
      val headWord =
        s"element_at($vocabArr, int(pmod(xxhash64($idCol, j + 1), ${Vocab.size})) + 1)"
      val tailWord = s"concat('t', pmod(xxhash64($idCol, j + 301), ${tailSize}L))"
      s"concat_ws(' ', transform(sequence(1, int($n)), " +
        s"j -> if(pmod(xxhash64($idCol, j + 201), 2) = 0, $headWord, $tailWord)))"
    }
    spark.range(nDocs)
      .withColumn("kind", pmod(xxhash64(col("id"), lit(0)), lit(1000)))
      .withColumn("text",
        when(col("kind") < 5 && col("id") >= 7, expr(baseText("id - 7")))
          .when(col("kind") < 45 && col("id") >= 3,
            concat(expr(baseText("id - 3")), lit(" "),
              expr(s"element_at($vocabArr, int(pmod(xxhash64(id, 7), ${Vocab.size})) + 1)")))
          .otherwise(expr(baseText("id"))))
      .select(
        col("id").as("doc_id"),
        col("text"),
        expr("element_at(array('en','en','en','en','en','en','en','en'," +
          "'zh','zh','zh','es','es','es','fr','fr','fr','de','de','de'), " +
          "int(pmod(xxhash64(id, 2), 20)) + 1)").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20)).cast("string")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    println(s"[gensf] documents: $nDocs fresh")

    // ---- embeddings: fresh 64-dim uniform draws; ~3% near-dup plants
    // re-evaluate the generator at the source id plus a small
    // deterministic perturbation (cosine-near, not identical)
    val nVecBase = spark.read.parquet(s"$src/embeddings.parquet").count()
    val nVec = nVecBase * copies
    def vec(idCol: String, eps: String): String =
      s"transform(sequence(1, 64), j -> cast(" +
        s"(cast(pmod(xxhash64($idCol, j + 100), 2000001) as double) / 1000000.0 - 1.0)" +
        s" + $eps as float))"
    spark.range(nVec)
      .withColumn("kind", pmod(xxhash64(col("id"), lit(10)), lit(1000)))
      .withColumn("embedding",
        when(col("kind") < 30 && col("id") >= 5,
          expr(vec("id - 5",
            "(cast(pmod(xxhash64(id, j + 500), 201) as double) / 100.0 - 1.0) * 0.02")))
          .otherwise(expr(vec("id", "0.0d"))))
      .select(
        col("id").as("vec_id"),
        col("embedding"),
        pmod(xxhash64(col("id"), lit(3)), lit(10)).cast("int").as("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    println(s"[gensf] embeddings: $nVec fresh")
    println(s"[gensf] done -> $out")
  }
}
