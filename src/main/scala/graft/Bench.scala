package graft

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Results are materialized through the `noop` datasource sink — unlike
  * `.count()`, which lets Catalyst prune away projection work entirely,
  * the noop writer evaluates every output row/column while writing
  * nothing, so timings reflect the real computation. Failures are
  * recorded explicitly as -1 timings plus a `failures` list (a throwing
  * query must never masquerade as a fast one).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failures = List.empty[String]
    // exception class + message per failure, IN the JSON artifact: the
    // round-12 red bench line carried only the query name — the
    // DIVIDE_BY_ZERO text went to stderr, which the driver's bounded
    // tail loses, so naming the error needed a manual repro
    var failureInfo = List.empty[(String, String)]
    // full JSON string escape (the Verify.q discipline): exception
    // messages can carry ANY control char — \f, \b, ANSI escapes in
    // wrapped exception text — and one raw control byte makes the
    // whole artifact unparseable
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    def recordFailure(name: String, e: Throwable): Unit = {
      System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      failures ::= name
      val msg = Option(e.getMessage).getOrElse("").take(300)
      failureInfo ::= (name -> s"${e.getClass.getSimpleName}: $msg")
    }

    // Setup OUTSIDE the per-query timings:
    //  - the one-time LR fit + feature/prediction cache warm, reported
    //    as its own fit_sec metric — it is model TRAINING; folding it
    //    into whichever ML query runs first overstated that query 10x
    //    and double-reported run-to-run fit variance as query variance;
    //  - the raw-CSV materialization for q_csv_clean (harness setup:
    //    the query itself times the CSV scan + standardization).
    val tFit = System.nanoTime()
    val fitSec =
      try {
        graft.ml.Churn.fitted(spark, sfDir)
        graft.ml.Churn.predictions(spark, sfDir, "val").write.format("noop").mode("overwrite").save()
        graft.ml.Churn.predictions(spark, sfDir, "test").write.format("noop").mode("overwrite").save()
        (System.nanoTime() - tFit) / 1e9
      } catch { case e: Throwable =>
        recordFailure("fit", e)
        -1.0
      }
    // Pre-warm the memoized index/scan seams (brute truth, IVF
    // assignments, k-means model, PQ codebooks+codes, shingle sets,
    // signatures, pair graphs, span windows) into their own `build`
    // line item: the seams are shared by design, so their one-time
    // materialization used to land on whichever consumer ran first
    // (e.g. q_ann_eval fronting six builds) and made that query's
    // number unreadable. With the split, per-query timings are pure
    // query cost and build cost is itemized; per-query memo_misses
    // still marks any build a query DOES pay (a prewarm failure falls
    // back to exactly the old attribution).
    var buildItems = Seq.empty[(String, Double)]
    try buildItems =
      graft.sim.Similarity.prewarmIndexes(Tables.embeddings(spark, sfDir)) ++
        graft.dedup.Dedup.prewarm(Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir)) ++
        graft.sources.Bucketing.prewarm(spark, sfDir) ++
        // the per-JVM scratch exports behind the ingestion gates —
        // harness setup, not query cost (q_csv_clean must time the CSV
        // scan, not the CSV write that creates its input)
        graft.sources.Sources.prewarm(spark, sfDir) ++
        graft.text.LangModel.prewarm(Tables.documents(spark, sfDir)) ++
        graft.text.DocEmbed.prewarm(Tables.documents(spark, sfDir)) ++
        graft.mm.MediaCodec.prewarm(Tables.documents(spark, sfDir)) ++
        graft.mm.AudioFp.prewarm(Tables.documents(spark, sfDir)) ++
        graft.mm.GifDedup.prewarm(Tables.documents(spark, sfDir)) ++
        graft.text.Unigram.prewarm(Tables.documents(spark, sfDir)) ++
        graft.text.Bpe.prewarm(Tables.documents(spark, sfDir))
    catch { case e: Throwable =>
      System.err.println(s"[bench] prewarm failed (queries will pay builds inline): ${e.getMessage}")
    }
    val buildSec = buildItems.map(_._2).sum

    // memoized-seam queries (pairsCached/winsCached/kmeansCached/...)
    // are run-order dependent by design: the first consumer pays the
    // materialization, later ones hit the memo. Mark each timing with
    // the number of memo materializations it paid so per-query numbers
    // stay interpretable across rounds.
    var memoMisses = List.empty[(String, Long)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val m0 = Memo.missCount
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => recordFailure(name, e); false }
      val paid = Memo.missCount - m0
      if (paid > 0) memoMisses ::= (name -> paid)
      // capture the elapsed time BEFORE the isolation GC — the forced
      // full collection is cleanup for the NEXT query, not this one's
      // cost, and charging it here inflated every per-query number
      val elapsed = (System.nanoTime() - t0) / 1e9
      // isolate measurements: collect the previous query's broadcast /
      // shuffle debris outside the timed section (shared-JVM GC
      // pressure showed up as 4x run-to-run swings on the join-heavy
      // queries). Deliberately NOT spark.catalog.clearCache(): that
      // would also unpersist graft's managed feature/prediction frames
      // and turn every ML query timing into a hidden refit.
      System.gc()
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val fs = failures.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fi = failureInfo.sortBy(_._1)
      .map { case (k, v) => "\"" + jesc(k) + "\":\"" + jesc(v) + "\"" }
      .mkString("{", ",", "}")
    // contention self-documentation: driver-captured rounds have landed
    // on loaded containers (r6/r7 fit_sec 27s captured vs 15s
    // uncontended), so the artifact carries the 1-minute system load
    // and the CPU count alongside the timings instead of relying on a
    // prose variance note. load_avg near (or above) cpus => read the
    // numbers with the ±10-25% contention band in mind.
    val loadAvg = math.rint(java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage * 100) / 100
    val cpuCount = Runtime.getRuntime.availableProcessors
    val mm = memoMisses.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val build = buildItems
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","fit_sec":$fitSec,"build_sec":$buildSec,"build":$build,"queries":$qs,"failures":$fs,"failure_info":$fi,"memo_misses":$mm,"load_avg":$loadAvg,"available_cpus":$cpuCount,"sf":"$sfDir"}""")
    // The harness keeps only a small TAIL of stdout and the full line
    // above (85 queries) outgrew it, truncating away total/fit_sec.
    // Emit a compact headline LAST (<500 bytes: totals, failure list,
    // five slowest) so a bounded tail always captures what matters.
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val top5 = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    // n_queries counts only SUCCESSFUL timings (total/top5 exclude
    // failures, so the headline counts must describe the same set)
    val nOk = results.count(_._2 >= 0)
    // failure_info stays OFF the headline: the 300-char-per-failure
    // messages would outgrow the bounded tail this line exists for —
    // on a red run the tail must still carry totals + failure NAMES
    // (the full messages ride the complete line above)
    println(s"""{"metric":"headline","total":${r3(total)},"unit":"sec","fit_sec":${r3(fitSec)},"build_sec":${r3(buildSec)},"n_queries":$nOk,"n_failed":${failures.size},"failures":$fs,"top5":$top5,"load_avg":$loadAvg,"available_cpus":$cpuCount,"sf":"$sfDir"}""")
    spark.stop()
  }
}
