package graft.text

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

/** Persistence for an ORDER-N n-gram language model — the CCNet
  * production shape the self-estimated surprisal ladder tops out
  * below: the store trains its LM once, SHIPS the artifact, and every
  * ingest batch scores under the shipped model + operating point
  * (never re-estimating on the batch, which would let a spam batch
  * define its own notion of fluency). Generalizes the unigram
  * `storeLm` seam (LangModel.pplIncremental) to orders 1–3 with the
  * same persistence discipline as the learned text filters and the
  * ANN indexes.
  *
  * Layout under `dir`:
  *   - `uni/`      (token, c) — always present; the smoothed base
  *                 distribution every order backs off into.
  *   - `bi/`       (w1, w2, c12) — order ≥ 2 (bigram event counts).
  *   - `tri/`      (w1, w2, w3, c123) — order 3 (trigram event
  *                 counts; the context/suffix rollups derive from it
  *                 on read — vocabulary-bounded scans, nothing
  *                 duplicated on disk).
  *   - `meta.json` order, totals (n, v), interpolation weights, the
  *                 shipped tercile cut t2, bucket_micros.
  *
  * Scoring semantics per order (every term a proper conditional, all
  * mass positive via the add-one-smoothed unigram base — an OOV
  * n-gram backs off, never NaNs):
  *
  *   P₁(w)        = (c(w)+1) / (N+V+1)                — EXACTLY the
  *                  unigram screen's smoothing: order-1 score is
  *                  hash-EQUAL to the in-session [[LangModel.pplScreenAgainst]]
  *                  (pinned in LangModelSpec).
  *   P₂(w₂|w₁)    = λ·c12/c1·[c1>0] + (1−λ)·P₁(w₂)
  *   P₃(w₃|w₁w₂)  = λ₁·c123/c12·[c12>0] + λ₂·c23/c2·[c2>0] + λ₃·P₁(w₃)
  *
  * with c12/c2 the trigram-event context/suffix-context counts (the
  * [[LangModel.surprisalTrigram]] event-space discipline). Counts are
  * integers in parquet and the λs round-trip shortest-repr through
  * JSON, so write → read → score is bit-deterministic (pinned).
  */
object LmIndex {

  private val mapper = new ObjectMapper()

  /** Train the order-n model over `storeDocs`, score the store under
    * its own model for the shipped tercile cut, and persist
    * everything. An empty store writes an empty model (v = 0) that
    * scores nothing — the empty-corpus convention.
    */
  def write(
      storeDocs: DataFrame, dir: String, order: Int = 1,
      bucketMicros: Long = 100000L,
      lambda: Double = 0.75, l1: Double = 0.5, l2: Double = 0.3): Unit = {
    require(order >= 1 && order <= 3, s"order must be 1..3, got $order")
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    require(l1 > 0 && l2 > 0 && l1 + l2 < 1, "trigram lambdas must be positive, sum below 1")
    val spark = storeDocs.sparkSession
    val uniTf = LangModel.lmTf(storeDocs).boundedCheckpoint()
    val sv = uniTf.groupBy(col("token")).agg(sum(col("tf")).as("c")).boundedCheckpoint()
    val row = sv.agg(sum(col("c")), count(lit(1))).head()
    val (n, v) = if (row.isNullAt(0)) (0L, 0L) else (row.getLong(0), row.getLong(1))
    Files.createDirectories(Paths.get(dir))
    sv.write.mode(SaveMode.Overwrite).parquet(s"$dir/uni")
    val bi =
      if (order >= 2) {
        val b = eventTf(storeDocs, 2)
          .groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c12"))
          .boundedCheckpoint()
        b.write.mode(SaveMode.Overwrite).parquet(s"$dir/bi")
        Some(b)
      } else None
    val tri =
      if (order == 3) {
        val t = eventTf(storeDocs, 3)
          .groupBy(col("w1"), col("w2"), col("w3")).agg(sum(col("tf")).as("c123"))
          .boundedCheckpoint()
        t.write.mode(SaveMode.Overwrite).parquet(s"$dir/tri")
        Some(t)
      } else None
    // the shipped operating point: the store scored under its OWN
    // model (the storeLm t2 discipline, here at any order)
    val t2 =
      if (v == 0L) 0L
      else {
        val scored = order match {
          case 1 => LangModel.lmScore(uniTf, sv, n, v)
          case 2 => biScore(eventTf(storeDocs, 2), sv, bi.get, n, v, lambda)
          case _ => triScore(eventTf(storeDocs, 3), sv, tri.get, n, v, l1, l2)
        }
        LangModel.microTerciles(scored.select(col("micro")), bucketMicros)
          .head().getLong(1)
      }
    val root = mapper.createObjectNode()
    root.put("order", order)
    root.put("n", n)
    root.put("v", v)
    root.put("t2", t2)
    root.put("bucket_micros", bucketMicros)
    root.put("lambda", lambda)
    root.put("l1", l1)
    root.put("l2", l2)
    Files.write(Paths.get(dir, "meta.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8))
  }

  /** The persisted meta: (order, n, v, t2, lambda, l1, l2). Loud on a
    * missing or incomplete layout.
    */
  def readMeta(dir: String): (Int, Long, Long, Long, Double, Double, Double) = {
    val p = Paths.get(dir, "meta.json")
    require(Files.exists(p), s"no LM index at $dir: meta.json missing")
    val root = mapper.readTree(Files.readString(p))
    val order = root.get("order").asInt()
    require(order >= 1 && order <= 3, s"corrupt LM index at $dir: order $order")
    require(Files.exists(Paths.get(dir, "uni")),
      s"corrupt LM index at $dir: uni/ missing")
    if (order >= 2) require(Files.exists(Paths.get(dir, "bi")),
      s"corrupt LM index at $dir: order $order but bi/ missing")
    if (order == 3) require(Files.exists(Paths.get(dir, "tri")),
      s"corrupt LM index at $dir: order 3 but tri/ missing")
    (order, root.get("n").asLong(), root.get("v").asLong(), root.get("t2").asLong(),
      root.get("lambda").asDouble(), root.get("l1").asDouble(), root.get("l2").asDouble())
  }

  /** Score `newDocs` under the SHIPPED model + operating point: per
    * doc with ≥1 order-n event, (doc_id, n_tokens, avg_nats, keep)
    * where n_tokens counts the scored n-gram positions and keep = 1
    * iff the doc's micro-nat average is within the store's t2 cut.
    * Order 1 is hash-equal to [[LangModel.pplScreenAgainst]]; an
    * empty model (v = 0) scores nothing.
    */
  def score(spark: SparkSession, newDocs: DataFrame, dir: String): DataFrame = {
    import spark.implicits._
    val (order, n, v, t2, lambda, l1, l2) = readMeta(dir)
    if (v == 0L)
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("doc_id", "n_tokens", "avg_nats", "keep")
    val sv = spark.read.parquet(s"$dir/uni")
    val scored = order match {
      case 1 => LangModel.lmScore(LangModel.lmTf(newDocs), sv, n, v)
      case 2 => biScore(eventTf(newDocs, 2), sv,
        spark.read.parquet(s"$dir/bi"), n, v, lambda)
      case _ => triScore(eventTf(newDocs, 3), sv,
        spark.read.parquet(s"$dir/tri"), n, v, l1, l2)
    }
    scored.select(col("doc_id"), col("n_tokens"), col("avg_nats"),
      when(col("micro") <= lit(t2), lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  // ---------------------------------------------------------------- internals

  /** Per-(doc, n-gram) event counts — the scoring unit of order n. */
  private def eventTf(docs: DataFrame, order: Int): DataFrame = {
    val toks = docs.withColumn("toks", Text.tokens(col("text")))
    order match {
      case 2 => toks.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> named_struct('w1', element_at(toks, i), 'w2', element_at(toks, i + 1)))")).as("g"))
        .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("tf"))
      case _ => toks.filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 2), " +
            "i -> named_struct('w1', element_at(toks, i), 'w2', element_at(toks, i + 1), " +
            "'w3', element_at(toks, i + 2)))")).as("g"))
        .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"), col("g.w3").as("w3"))
        .groupBy(col("doc_id"), col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("tf"))
    }
  }

  /** Add-one-smoothed unigram probability of `w` under the store base
    * — the [[LangModel.lmScore]] smoothing, shared by every order.
    */
  private def p1(c: Column, n: Long, v: Long): Column =
    (coalesce(c, lit(0L)).cast("double") + lit(1.0)) / lit((n + v + 1L).toDouble)

  /** The shared micro-nat rollup: per-(doc, event) surprisal fixed to
    * integer micro-nats before the order-free per-doc long sum — the
    * [[LangModel.lmScore]] fixed-point discipline verbatim.
    */
  private def microRollup(events: DataFrame, p: Column): DataFrame =
    events
      .withColumn("micro_nats",
        floor(col("tf").cast("double") * -log(p) * lit(1000000.0) + lit(0.5))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("micro_nats")).as("micro_sum"))
      .select(col("doc_id"), col("n_tokens"),
        graft.Det.r(col("micro_sum").cast("double") / lit(1000000.0) /
          col("n_tokens").cast("double"), 6).as("avg_nats"))
      .withColumn("micro",
        floor(col("avg_nats") * lit(1000000.0) + lit(0.5)).cast("long"))

  private def biScore(
      events: DataFrame, sv: DataFrame, bi: DataFrame,
      n: Long, v: Long, lambda: Double): DataFrame = {
    val joined = events
      .join(bi, Seq("w1", "w2"), "left")
      .join(sv.select(col("token").as("w1"), col("c").as("c1")), Seq("w1"), "left")
      .join(sv.select(col("token").as("w2"), col("c").as("c2u")), Seq("w2"), "left")
    val p = lit(lambda) *
      when(coalesce(col("c1"), lit(0L)) > 0L,
        coalesce(col("c12"), lit(0L)).cast("double") / col("c1").cast("double"))
        .otherwise(lit(0.0)) +
      lit(1.0 - lambda) * p1(col("c2u"), n, v)
    microRollup(joined, p)
  }

  private def triScore(
      events: DataFrame, sv: DataFrame, tri: DataFrame,
      n: Long, v: Long, l1: Double, l2: Double): DataFrame = {
    val l3 = 1.0 - l1 - l2
    val ctx12 = tri.groupBy(col("w1"), col("w2")).agg(sum(col("c123")).as("c12"))
    val suf23 = tri.groupBy(col("w2"), col("w3")).agg(sum(col("c123")).as("c23"))
    val mid2 = suf23.groupBy(col("w2")).agg(sum(col("c23")).as("c2"))
    val joined = events
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(ctx12, Seq("w1", "w2"), "left")
      .join(suf23, Seq("w2", "w3"), "left")
      .join(mid2, Seq("w2"), "left")
      .join(sv.select(col("token").as("w3"), col("c").as("c3u")), Seq("w3"), "left")
    val p = lit(l1) *
      when(coalesce(col("c12"), lit(0L)) > 0L,
        coalesce(col("c123"), lit(0L)).cast("double") / col("c12").cast("double"))
        .otherwise(lit(0.0)) +
      lit(l2) *
      when(coalesce(col("c2"), lit(0L)) > 0L,
        coalesce(col("c23"), lit(0L)).cast("double") / col("c2").cast("double"))
        .otherwise(lit(0.0)) +
      lit(l3) * p1(col("c3u"), n, v)
    microRollup(joined, p)
  }
}
