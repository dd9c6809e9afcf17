package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.streaming.Events

class StreamingSpec extends SparkSpec {

  test("readStream hourly aggregate equals the batch aggregate (memory sink)") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    Files.copy(
      Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$tmp/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = Events.hourlyStream(spark, tmp)
      .writeStream.format("memory").queryName("hourly_test").outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("hourly_test")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = Events.hourlyAgg(Tables.events(spark, sf))
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("sliding aggregate: every event lands in window/slide windows; stream equals batch") {
    // row-count conservation: Σ n_events over sliding windows =
    // 4 × event count (60-min windows sliding every 15)
    val batch = Events.slidingAgg(Tables.events(spark, sf)).cache()
    val nEvents = Tables.events(spark, sf).count()
    val total = batch.agg(sum("n_events")).head().getLong(0)
    assert(total === 4L * nEvents)
    // every hourly tumbling bucket exists among the sliding starts
    val hourly = Events.hourlyAgg(Tables.events(spark, sf))
      .select("hour_start").collect().map(_.getString(0)).toSet
    val slides = batch.select("window_start").collect().map(_.getString(0)).toSet
    assert(hourly.subsetOf(slides))
    // streaming form produces the identical result through a memory sink
    val tmp = Files.createTempDirectory("graft-slide").toString
    Files.copy(
      Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$tmp/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = Events.slidingStream(spark, tmp)
      .writeStream.format("memory").queryName("sliding_test").outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("sliding_test")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch.collect().map(_.toSeq).toSet)
  }

  test("watermark bounds state: aggregate streams incrementally across two batches") {
    // two micro-batches (two files): the aggregate must still equal the
    // batch result over the union — watermarked windowed agg stitches
    // in-window late rows from batch 2 into batch 1's hours
    val tmp = Files.createTempDirectory("graft-stream2").toString
    val events = Tables.events(spark, sf).orderBy("ts")
    val n = events.count()
    val half = (n / 2).toInt
    import org.apache.spark.sql.SaveMode
    // batch 1 = later half, batch 2 = earlier half (arrives "late" but
    // events span 30 days, far beyond the 2h watermark: the stream
    // result over both files must still match batch exactly in
    // complete mode, which never drops state)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    raw.limit(half).write.mode(SaveMode.Overwrite).parquet(tmp)
    val q = Events.hourlyStream(spark, tmp)
      .writeStream.format("memory").queryName("hourly_inc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // batch 2 = everything not already on disk — re-evaluating
      // raw.limit(half) here could pick a different (unordered) subset
      raw.exceptAll(spark.read.parquet(tmp).select(raw.columns.map(col): _*))
        .write.mode(SaveMode.Append).parquet(tmp)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hourly_inc")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = Events.hourlyAgg(Tables.events(spark, sf))
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch interval join (memory sink)") {
    val tmp = Files.createTempDirectory("graft-ssjoin").toString
    Files.copy(
      Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$tmp/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = Events.attributionStream(spark, tmp)
      .writeStream.format("memory").queryName("attr_join").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("attr_join").collect().map(_.toSeq).toSet
    val events = Tables.events(spark, sf)
    val batch = Events.attributionJoin(
      events.filter(col("event_type") === "click"),
      events.filter(col("event_type") === "purchase"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // windowed-pairs contract: every pair respects the interval
    assert(batch.forall { r =>
      val gap = r(3).asInstanceOf[Long]; gap >= 0 && gap <= 60L * 60000L
    })
  }

  test("streaming incremental screen over micro-batches equals the batch incrementalDedup") {
    import org.apache.spark.sql.SaveMode
    val docs = Tables.documents(spark, sf)
    val batchSlice = docs.filter(col("doc_id") % 10 === 0)
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    // land the batch slice as MANY small files and stream them one
    // file per trigger, so the screen genuinely runs across several
    // micro-batches (per-doc results depend only on (doc, store), so
    // the union must equal the one-shot batch screen)
    val tmp = Files.createTempDirectory("graft-inc-screen").toString
    batchSlice.repartition(5).write.mode(SaveMode.Overwrite).parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val got = new scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    var batches = 0
    val q = Events.incrementalScreenStream(stream, existing) { (screened, _) =>
      got.synchronized {
        got ++= screened.collect().map(_.toSeq)
        batches += 1
      }
      ()
    }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 2, s"test must exercise several micro-batches, got $batches")
    val batch = graft.dedup.Dedup.incrementalDedup(docs).collect().map(_.toSeq).toSet
    assert(got.toSet === batch,
      "micro-batched screen union must equal the one-shot batch screen")
    assert(got.size === got.toSet.size, "no doc may be screened twice")
    assert(got.nonEmpty)
  }

  test("streaming perplexity screen over micro-batches equals the batch pplIncremental") {
    import org.apache.spark.sql.SaveMode
    val docs = Tables.documents(spark, sf)
    val batchSlice = docs.filter(col("doc_id") % 10 === 0)
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val tmp = Files.createTempDirectory("graft-ppl-screen").toString
    batchSlice.repartition(5).write.mode(SaveMode.Overwrite).parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val got = new scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    var batches = 0
    val q = Events.pplScreenStream(stream, existing) { (screened, _) =>
      got.synchronized {
        got ++= screened.collect().map(_.toSeq)
        batches += 1
      }
      ()
    }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 2, s"test must exercise several micro-batches, got $batches")
    val batch = graft.text.LangModel.pplIncremental(docs).collect().map(_.toSeq).toSet
    assert(got.toSet === batch,
      "micro-batched perplexity screen union must equal the one-shot batch screen")
    assert(got.size === got.toSet.size && got.nonEmpty)
  }

  test("streaming ingest with a GROWING store: one micro-batch reduces to ingestDecision; multi-batch matches the greedy sequential simulation") {
    import org.apache.spark.sql.SaveMode
    val docs = Tables.documents(spark, sf)
    val batchSlice = docs.filter(col("doc_id") % 10 === 0)
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val tau = 0.5

    // ---- whole drop as ONE micro-batch: the accumulator never grows,
    // so the verdicts must equal the batch ingestDecision exactly
    val tmp1 = Files.createTempDirectory("graft-ingest-one").toString
    batchSlice.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp1)
    val schema = spark.read.parquet(tmp1).schema
    locally {
      val stream = spark.readStream.schema(schema).parquet(tmp1)
      val got = new scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      var batches = 0
      val q = Events.ingestStream(stream, existing, tau) { (decision, _) =>
        got.synchronized { got ++= decision.collect().map(_.toSeq); batches += 1 }
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      assert(batches === 1, s"single-file drop must land as one micro-batch, got $batches")
      val batch = graft.dedup.Dedup.ingestDecision(docs, 10, tau).collect().map(_.toSeq).toSet
      assert(got.toSet === batch, "one-micro-batch ingest must reduce to the batch decision")
      assert(got.nonEmpty)
    }

    // ---- several micro-batches: verdicts must match a driver-side
    // GREEDY simulation over the exact batches the stream delivered —
    // store screen against initial store ∪ earlier KEPT docs, within-
    // batch first-wins against ALL earlier docs of the same batch
    val tmp2 = Files.createTempDirectory("graft-ingest-grow").toString
    batchSlice.repartition(5).write.mode(SaveMode.Overwrite).parquet(tmp2)
    locally {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp2)
      val delivered = new scala.collection.mutable.ArrayBuffer[(Long, Array[Seq[Any]])]()
      val q = Events.ingestStream(stream, existing, tau) { (decision, id) =>
        delivered.synchronized { delivered += ((id, decision.collect().map(_.toSeq))) }
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      assert(delivered.size >= 2, s"must exercise several micro-batches, got ${delivered.size}")

      // driver-side twin: per-doc (shingle set, content hash)
      val sets = graft.dedup.Dedup.hashedShingleSets(docs).collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toSet, r.getString(2)))).toMap
      def twin(a: (Set[Long], String), b: (Set[Long], String)): Boolean = {
        val exact = a._2 == b._2
        val near = a._1.nonEmpty && b._1.nonEmpty && {
          val i = (a._1 & b._1).size
          i.toDouble / (a._1.size + b._1.size - i) >= tau
        }
        exact || near
      }
      val store = scala.collection.mutable.ArrayBuffer.empty[(Set[Long], String)]
      existing.select("doc_id").collect().foreach(r => store += sets(r.getLong(0)))
      val expect = scala.collection.mutable.Set.empty[Seq[Any]]
      for ((_, rows) <- delivered.sortBy(_._1)) {
        val ids = rows.map(_.head.asInstanceOf[Long]).sorted
        val keptNow = scala.collection.mutable.ArrayBuffer.empty[(Set[Long], String)]
        for (d <- ids) {
          val me = sets(d)
          val storeKeep = if (store.exists(twin(me, _))) 0L else 1L
          val batchKeep =
            if (ids.takeWhile(_ < d).exists(e => twin(me, sets(e)))) 0L else 1L
          // round 11: the containment screen joins the verdict —
          // contained (C >= 0.8) in any store-as-of-this-batch doc
          def containedIn(b: (Set[Long], String)): Boolean =
            me._1.nonEmpty && (me._1 & b._1).size.toDouble / me._1.size >= 0.8
          val containKeep = if (store.exists(containedIn)) 0L else 1L
          val keep = storeKeep * batchKeep * containKeep
          expect += Seq(d, storeKeep, batchKeep, containKeep, keep)
          if (keep == 1L) keptNow += me
        }
        store ++= keptNow
      }
      val got = delivered.flatMap(_._2).toSet
      assert(got === expect.toSet, "growing-store verdicts drifted from the greedy simulation")
      // and the growth is observable: at least one verdict must differ
      // from the static-store batch decision OR every batch doc was
      // independent (assert only set equality above; the semantics is
      // pinned by the simulation either way)
      assert(got.nonEmpty)
    }
  }

  test("streaming embedding screen over micro-batches equals the batch embedIncremental (brute + lsh)") {
    import org.apache.spark.sql.SaveMode
    val emb = Tables.embeddings(spark, sf)
    val batchSlice = emb.filter(col("vec_id") % 10 === 0)
    val existing = emb.filter(col("vec_id") % 10 =!= 0)
    val tmp = Files.createTempDirectory("graft-embed-screen").toString
    batchSlice.repartition(4).write.mode(SaveMode.Overwrite).parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    for (lsh <- Seq(false, true)) {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
      val got = new scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      var batches = 0
      val q = Events.embedScreenStream(stream, existing, useLsh = lsh) { (screened, _) =>
        got.synchronized { got ++= screened.collect().map(_.toSeq); batches += 1 }
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      assert(batches >= 2, s"lsh=$lsh: must exercise several micro-batches, got $batches")
      val batch = graft.dedup.Dedup.embedIncremental(emb, useLsh = lsh)
        .collect().map(_.toSeq).toSet
      assert(got.toSet === batch, s"lsh=$lsh: micro-batched union drifted from the batch screen")
      assert(got.nonEmpty)
    }
  }

  test("disk-backed streaming ingest: verdicts match the greedy simulation; the persisted index ends as store ∪ keepers") {
    import org.apache.spark.sql.SaveMode
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    val docs = Tables.documents(spark, sf)
    val batchSlice = docs.filter(col("doc_id") % 10 === 0)
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val tau = 0.5
    val tmp = Files.createTempDirectory("graft-ingest-disk").toString
    batchSlice.repartition(5).write.mode(SaveMode.Overwrite).parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val idx = Files.createTempDirectory("graft-ingest-idx").toString
    try {
      graft.dedup.ShingleIndex.write(existing, idx)
      val delivered = new scala.collection.mutable.ArrayBuffer[(Long, Array[Seq[Any]])]()
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
      val q = Events.ingestStreamPersisted(stream, idx, tau) { (decision, id) =>
        delivered.synchronized { delivered += ((id, decision.collect().map(_.toSeq))) }
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      assert(delivered.size >= 2, s"must exercise several micro-batches, got ${delivered.size}")

      // greedy driver-side twin over the exact batches delivered —
      // the ingestStream simulation with the containment screen
      val sets = graft.dedup.Dedup.hashedShingleSets(docs).collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toSet, r.getString(2)))).toMap
      def twin(a: (Set[Long], String), b: (Set[Long], String)): Boolean = {
        val exact = a._2 == b._2
        val near = a._1.nonEmpty && b._1.nonEmpty && {
          val i = (a._1 & b._1).size
          i.toDouble / (a._1.size + b._1.size - i) >= tau
        }
        exact || near
      }
      val store = scala.collection.mutable.ArrayBuffer.empty[(Set[Long], String)]
      existing.select("doc_id").collect().foreach(r => store += sets(r.getLong(0)))
      val expect = scala.collection.mutable.Set.empty[Seq[Any]]
      val keptIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((_, rows) <- delivered.sortBy(_._1)) {
        val ids = rows.map(_.head.asInstanceOf[Long]).sorted
        val keptNow = scala.collection.mutable.ArrayBuffer.empty[(Long, (Set[Long], String))]
        for (d <- ids) {
          val me = sets(d)
          val storeKeep = if (store.exists(twin(me, _))) 0L else 1L
          val batchKeep =
            if (ids.takeWhile(_ < d).exists(e => twin(me, sets(e)))) 0L else 1L
          def containedIn(b: (Set[Long], String)): Boolean =
            me._1.nonEmpty && (me._1 & b._1).size.toDouble / me._1.size >= 0.8
          val containKeep = if (store.exists(containedIn)) 0L else 1L
          val keep = storeKeep * batchKeep * containKeep
          expect += Seq(d, storeKeep, batchKeep, containKeep, keep)
          if (keep == 1L) keptNow += ((d, me))
        }
        store ++= keptNow.map(_._2)
        keptIds ++= keptNow.map(_._1)
      }
      val got = delivered.flatMap(_._2).toSet
      assert(got === expect.toSet, "disk-backed ingest verdicts drifted from the greedy simulation")
      // the persisted index now holds exactly store ∪ keepers —
      // row-equal to a one-shot build over that union
      def setRows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getString(2))).toSet
      val endSets = setRows(graft.dedup.ShingleIndex.readSets(spark, idx))
      val oneShot = Files.createTempDirectory("graft-ingest-one-idx").toString
      try {
        val keptDf = docs.filter(col("doc_id").isin(keptIds.toSeq: _*))
        graft.dedup.ShingleIndex.write(existing.unionByName(keptDf), oneShot)
        assert(endSets === setRows(graft.dedup.ShingleIndex.readSets(spark, oneShot)),
          "persisted index after the stream is not store ∪ keepers")
      } finally rmrf(oneShot)
      // meta doc accounting followed the appends
      val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readString(java.nio.file.Paths.get(idx, "meta.json")))
      assert(meta.get("n_docs").asLong() === existing.count() + keptIds.size)
    } finally { rmrf(idx); rmrf(tmp) }
  }

  test("streaming Bloom screen: static-filter union equals one-shot probe; appended filter bytes equal the one-shot union build") {
    import org.apache.spark.sql.SaveMode
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    val docs = Tables.documents(spark, sf)
    val storeKeys = docs.filter(col("doc_id") % 10 =!= 0)
      .select(xxhash64(md5(col("text").cast("binary"))).as("k"))
    val batchSlice = docs.filter(col("doc_id") % 10 === 0)
    val tmp = Files.createTempDirectory("graft-bloom-stream").toString
    batchSlice.repartition(4).write.mode(SaveMode.Overwrite).parquet(tmp)
    val schema = spark.read.parquet(tmp).schema

    // ---- static filter: the micro-batched union must equal the
    // one-shot probe (verdicts depend only on (key, filter))
    val dir = Files.createTempDirectory("bloom_stream_idx").toString
    try {
      graft.dedup.BloomIndex.write(storeKeys, dir)
      val got = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var batches = 0
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
      val q = Events.bloomScreenStream(stream, dir) { (verdict, _) =>
        got.synchronized {
          got ++= verdict.collect().map(r => (r.getLong(0), r.getLong(1))); batches += 1
        }
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      assert(batches >= 2, s"must exercise several micro-batches, got $batches")
      val filter = graft.dedup.BloomIndex.read(dir)
      val oneShot = batchSlice
        .select(col("doc_id"), xxhash64(md5(col("text").cast("binary"))).as("k"))
        .select(col("doc_id"),
          when(graft.functions.GraftFunctions.bloomMightContain(lit(filter), col("k")),
            lit(1L)).otherwise(lit(0L)).as("bloom_hit"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.toSet === oneShot, "micro-batched Bloom union drifted from the one-shot probe")
      assert(got.nonEmpty)
      // a batch doc whose text verbatim-exists in the store can never miss
      val storeTexts = docs.filter(col("doc_id") % 10 =!= 0)
        .select("text").collect().map(_.getString(0)).toSet
      val mustHit = batchSlice.collect()
        .filter(r => storeTexts(r.getString(r.fieldIndex("text"))))
        .map(_.getLong(0)).toSet
      val hits = got.toMap
      mustHit.foreach(id => assert(hits(id) === 1L, s"stored twin $id missed the filter"))
    } finally rmrf(dir)

    // ---- growing filter: per-micro-batch appends; the final bytes
    // must equal a one-shot union build at the persisted geometry (OR
    // is associative + commutative — the split cannot change a bit)
    val dir2 = Files.createTempDirectory("bloom_stream_grow").toString
    try {
      graft.dedup.BloomIndex.write(storeKeys, dir2)
      val before = graft.dedup.BloomIndex.read(dir2)
      val numHashes = ((before(0) & 0xff) << 24) | ((before(1) & 0xff) << 16) |
        ((before(2) & 0xff) << 8) | (before(3) & 0xff)
      val bits = (before.length - 4) * 8
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
      var batches = 0
      val q = Events.bloomScreenStream(stream, dir2, appendKeys = true) { (verdict, _) =>
        verdict.collect(); batches += 1; ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      assert(batches >= 2)
      val grown = graft.dedup.BloomIndex.read(dir2)
      val oneShotBytes = storeKeys
        .union(batchSlice.select(xxhash64(md5(col("text").cast("binary"))).as("k")))
        .agg(graft.functions.GraftFunctions.bloomBuild(col("k"), bits, numHashes).as("f"))
        .head().getAs[Array[Byte]](0)
      assert(grown.toSeq === oneShotBytes.toSeq,
        "streamed appends drifted from the one-shot union build")
      // and every batch key now hits its own grown filter
      val allHit = batchSlice
        .select(xxhash64(md5(col("text").cast("binary"))).as("k"))
        .select(when(graft.functions.GraftFunctions.bloomMightContain(lit(grown), col("k")),
          lit(1L)).otherwise(lit(0L)).as("h"))
        .collect().forall(_.getLong(0) == 1L)
      assert(allHit, "an appended key missed the grown filter")
    } finally rmrf(dir2)
  }

  test("streaming dedup keeps first arrival per content hash across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val tmp = Files.createTempDirectory("graft-dedup-stream").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // batch 1: 50 docs over 30 distinct texts (duplicates WITHIN the batch)
    val b1 = (0 until 50).map(i => (i.toLong, s"text ${i % 30}", ts(i)))
      .toDF("doc_id", "text", "ingest_ts")
    // batch 2: 50 more docs, 30 texts repeat batch 1 (within the 2h
    // watermark => must be dropped), 10 are new
    val b2 = (50 until 100).map(i => (i.toLong, s"text ${i % 40}", ts(60 + i)))
      .toDF("doc_id", "text", "ingest_ts")
    b1.write.mode(SaveMode.Overwrite).parquet(tmp)
    val q = Events.dedupDocStream(spark, tmp)
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("dedup_stream").count()
      assert(afterB1 === 30L, "batch 1: one survivor per distinct text")
      b2.write.mode(SaveMode.Append).parquet(tmp)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_stream")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    // exactly one survivor per distinct text over BOTH batches
    assert(out.length === 40)
    assert(out.map(_._2).distinct.length === 40)
    // survivors of texts present in batch 1 are batch-1 docs (first
    // arrival wins; batch-2 repeats were suppressed by state)
    out.filter { case (_, t) => t.stripPrefix("text ").toInt < 30 }
      .foreach { case (id, t) => assert(id < 50L, s"$t survived as late doc $id") }
    // agrees with the batch-global exact dedup on the hash set
    val batchHashes = graft.dedup.Dedup.exact(b1.unionByName(b2))
      .select("content_hash").collect().map(_.getString(0)).toSet
    val streamHashes = spark.table("dedup_stream")
      .select("content_hash").collect().map(_.getString(0)).toSet
    assert(streamHashes === batchHashes)
  }

  test("stateful flatMapGroupsWithState sessionization equals the window-based one") {
    val events = Tables.events(spark, sf)
    val stateful = Events.sessionizeStatefulRollup(events)
      .select("user_id", "session_seq", "n_events", "duration_ms")
      .collect().map(_.toSeq).toSet
    val windowed = Relational.sessionize(events)
      .select("user_id", "session_seq", "n_events", "duration_ms")
      .collect().map(_.toSeq).toSet
    assert(stateful === windowed)
    assert(stateful.nonEmpty)
  }

  test("session_window: exact-gap boundary MERGES; agrees with lag-gap sessionize everywhere") {
    import spark.implicits._
    // user 1: events at 0 and EXACTLY 30min (touching ranges merge —
    // pinned empirically), then 30min+1ms after that -> new session
    val gap = 1800000L
    val ev = Seq((1L, 1L, 0L, "click"), (2L, 1L, gap, "click"), (3L, 1L, 2 * gap + 1L, "purchase"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = Events.sessionWindowAgg(ev).orderBy("session_start_ms").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 2 * gap, 2L, 0L),
      (2 * gap + 1L, 3 * gap + 1L, 1L, 1L)))
    // on the real events (no exact-gap ties) session COUNTS match the
    // lag-gap formulation per user
    val events = Tables.events(spark, sf)
    val nw = Events.sessionWindowAgg(events).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lg = Relational.sessionize(events).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nw === lg)
  }

  test("stateful snapshot upsert equals the batch struct-max compaction") {
    val events = Tables.events(spark, sf)
    val stateful = Events.snapshotStateful(Events.typedEvents(events))
      .select("user_id", "ts_ms", "event_id", "event_type", "n_events")
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Temporal.latestSnapshot(events)
      .select("user_id", "ts_ms", "event_id", "event_type", "n_events")
      .collect().map(_.toSeq).toSet
    assert(stateful === batch)
    assert(stateful.nonEmpty)
  }

  test("snapshot upsert stitches across micro-batches: late arrivals count but never displace") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-snap").toString
    import org.apache.spark.sql.SaveMode
    // batch 1: user 1 click@1000(id=1), purchase@2000(id=2)
    def write(rows: Seq[(Long, Long, Long, String, Double)], mode: SaveMode): Unit =
      rows.toDF("event_id", "user_id", "ts", "event_type", "value")
        .withColumn("ts", col("ts") * 1000000L) // ms -> parquet nanos
        .write.mode(mode).parquet(tmp)
    write(Seq((1L, 1L, 1000L, "click", 1.0), (2L, 1L, 2000L, "purchase", 2.0)),
      SaveMode.Overwrite)
    val q = Events.snapshotStream(spark, tmp)
      .writeStream.format("memory").queryName("snap_upsert").outputMode("update").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("snap_upsert").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
      assert(after1 === Set((1L, 2000L, 2L, 2L)))
      // batch 2: a LATE event (ts 1500 < champion) and a newer one
      write(Seq((3L, 1L, 1500L, "view", 0.0), (4L, 1L, 3000L, "error", 0.0)),
        SaveMode.Append)
      q.processAllAvailable()
    } finally q.stop()
    // update-mode memory sink appends each batch's emission; the LAST
    // row per user is the current state: champion = id 4, count = 4
    // (the late id-3 event was counted but never displaced anything)
    val rows = spark.table("snap_upsert").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val last = rows.maxBy(_._4)
    assert(last === ((1L, 3000L, 4L, 4L)))
    assert(rows.toSet === Set((1L, 2000L, 2L, 2L), (1L, 3000L, 4L, 4L)))
  }

  test("image screen stream: micro-batched union equals the one-shot screen; appends grow the store sequentially") {
    import java.nio.file.Files
    import org.apache.spark.sql.SaveMode
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    val docs = Tables.documents(spark, sf).select("doc_id")
    val store = docs.filter(col("doc_id") % 10 =!= 0)
    val batchSlice = docs.filter(col("doc_id") % 10 === 0)
    val tmp = Files.createTempDirectory("graft-img-stream").toString
    batchSlice.repartition(4).write.mode(SaveMode.Overwrite).parquet(tmp)
    val schema = spark.read.parquet(tmp).schema

    // static store: the micro-batched union must equal the one-shot
    // screen (verdicts depend only on (batch image, store hashes))
    val dir = Files.createTempDirectory("img_stream_idx").toString
    try {
      graft.mm.PhashIndex.write(store, dir)
      val got = new scala.collection.mutable.ArrayBuffer[(Long, Boolean, Long, Boolean)]()
      var batches = 0
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
      val q = Events.imageScreenStream(stream, dir) { (verdict, _) =>
        got.synchronized {
          got ++= verdict.collect().map(r =>
            (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3)))
          batches += 1
        }
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      assert(batches >= 2, s"must exercise several micro-batches, got $batches")
      val oneShot = graft.mm.MediaCodec.imageScreenAgainst(batchSlice, store)
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3)))
      assert(got.toSet === oneShot.toSet,
        "micro-batched image-screen union drifted from the one-shot screen")
    } finally rmrf(dir)

    // growing store: appended keepers block later twins — sequential
    // semantics vs a driver-side greedy simulation over the SAME
    // micro-batch order the stream actually processed (the
    // ingestStream discipline): per-batch verdicts are computed
    // against the store AS OF the batch start, then decodable keepers
    // land before the next batch
    val dir2 = Files.createTempDirectory("img_stream_grow").toString
    try {
      graft.mm.PhashIndex.write(store, dir2)
      // (doc_id, decoded, image_keep) per micro-batch, in batch order
      val batchOrder =
        new scala.collection.mutable.ArrayBuffer[Seq[(Long, Boolean, Boolean)]]()
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
      val q = Events.imageScreenStream(stream, dir2, appendLanded = true) { (verdict, _) =>
        val rows = verdict.collect()
        batchOrder.synchronized {
          batchOrder += rows.map(r =>
            (r.getLong(0), r.getBoolean(1), r.getBoolean(3))).toSeq.sortBy(_._1)
        }
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      assert(batchOrder.length >= 2)
      // greedy simulation: one decode pass supplies every doc's bands;
      // dup = any 16-bit band equal AND total Hamming <= tau(=2),
      // exactly screenPhashFrames' candidate+verify criterion
      val bands = graft.mm.MediaCodec.imagePhash(docs)
        .select("doc_id", "b0", "b1", "b2", "b3", "err").collect()
        .map(r => r.getLong(0) ->
          (if (r.getString(5).isEmpty)
            Some(Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          else None)).toMap
      def dup(a: Seq[Long], b: Seq[Long]): Boolean =
        a.zip(b).exists { case (x, y) => x == y } &&
          a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum <= 2
      val simStore = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      store.select("doc_id").collect()
        .flatMap(r => bands(r.getLong(0))).foreach(simStore += _)
      for (batch <- batchOrder) {
        val landed = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        for ((id, decoded, keep) <- batch) {
          val h = bands(id)
          assert(decoded === h.nonEmpty, s"doc $id: decode verdict drifted")
          val expectKeep = h.forall(me => !simStore.exists(dup(me, _)))
          assert(keep === expectKeep,
            s"doc $id: sequential keep verdict drifted from the greedy simulation")
          if (keep) h.foreach(landed += _)
        }
        simStore ++= landed
      }
      // the grown index equals store + exactly the kept decodable images
      val keptIds = batchOrder.flatten.filter(_._3).map(_._1).toSet
      val idx = graft.mm.PhashIndex.readHashes(spark, dir2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val storeDecodable = store.collect().map(_.getLong(0)).filter(_ % 19 != 0).toSet
      val keptDecodable = keptIds.filter(_ % 19 != 0)
      assert(idx === storeDecodable ++ keptDecodable,
        "grown index must hold the store plus exactly the kept decodable images")
    } finally rmrf(dir2)
    rmrf(tmp)
  }

  test("watermark sweep: monotone drops, zero at the delay bound, per-type conservation") {
    val events = Tables.events(spark, sf)
    val n = events.count()
    val rows = Events.watermarkSweep(events).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    assert(byType.nonEmpty)
    for ((_, rs) <- byType) {
      val sorted = rs.sortBy(_.getAs[Long]("watermark_minutes"))
      // n_events is rung-independent (every row lands in every rung)
      assert(sorted.map(_.getAs[Long]("n_events")).distinct.length === 1)
      // a longer allowed delay can only drop FEWER rows
      val lates = sorted.map(_.getAs[Long]("n_late"))
      assert(lates.zip(lates.tail).forall { case (a, b) => a >= b },
        s"n_late must be non-increasing in watermark_minutes: ${lates.toList}")
      // the 240-min rung covers the 4-hour delay-model bound: the
      // batch watermark base is max PRIOR event time, an arrival can
      // be at most DelayModMs behind its own batch's floor, so no row
      // can be below base - 4h
      assert(sorted.last.getAs[Long]("n_late") === 0L)
      assert(sorted.last.getAs[Long]("max_late_ms") === 0L)
      // max_late_ms consistent with n_late
      assert(sorted.forall(r =>
        (r.getAs[Long]("n_late") > 0L) === (r.getAs[Long]("max_late_ms") > 0L)))
    }
    // one rung partitions the whole log by event_type
    val rung15 = rows.filter(_.getAs[Long]("watermark_minutes") == 15L)
    assert(rung15.map(_.getAs[Long]("n_events")).sum === n)
  }

  test("trigger batches: conservation, first-batch sentinel, monotone watermark") {
    val events = Tables.events(spark, sf)
    val n = events.count()
    val rows = Events.triggerBatches(events).collect()
      .sortBy(_.getAs[Long]("batch_id"))
    assert(rows.map(_.getAs[Long]("n_events")).sum === n)
    // only the FIRST batch has no prior event time to derive a
    // watermark from (every later batch id has a predecessor in the
    // prefix window)
    assert(rows.head.getAs[Long]("watermark_ms") === -1L)
    assert(rows.tail.forall(_.getAs[Long]("watermark_ms") > 0L))
    // the watermark never regresses (running max minus a constant)
    val wms = rows.tail.map(_.getAs[Long]("watermark_ms"))
    assert(wms.zip(wms.tail).forall { case (a, b) => a <= b })
    // drops are bounded by the batch and the first batch drops nothing
    assert(rows.forall(r => r.getAs[Long]("n_late") <= r.getAs[Long]("n_events")))
    assert(rows.head.getAs[Long]("n_late") === 0L)
  }

  test("the modeled batch watermark matches a real dropDuplicatesWithinWatermark run") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // coarse 24h trigger keeps the micro-batch count test-sized (~31
    // batches over the 30-day log) while still producing late rows
    val triggerMs = 24L * 3600000L
    val wmDelayMs = 3600000L // withWatermark("ts", "60 minutes")
    val arrivals = Events.withArrival(Tables.events(spark, sf), triggerMs)
      .select("batch_id", "event_id", "ts_ms")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the model's prediction: per batch, watermark = max prior event
    // time - delay; a row below it is dropped
    val batches = arrivals.groupBy(_._1).toSeq.sortBy(_._1)
    var maxPrior = Long.MinValue
    val predictedKept = scala.collection.mutable.Set.empty[Long]
    for ((_, evs) <- batches) {
      val wm = if (maxPrior == Long.MinValue) Long.MinValue else maxPrior - wmDelayMs
      evs.foreach { case (_, id, ts) => if (ts >= wm) predictedKept += id }
      maxPrior = math.max(maxPrior, evs.map(_._3).max)
    }
    assert(predictedKept.size < arrivals.length,
      "the coarse-trigger slice must actually contain late rows")
    // the REAL run: same batches through MemoryStream in arrival
    // order; event_ids are unique, so dropDuplicatesWithinWatermark's
    // only effect is its row-level watermark drop policy
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val q = ms.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "60 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("wm_model_test")
      .outputMode("append").start()
    try {
      for ((_, evs) <- batches) {
        ms.addData(evs.map { case (_, id, ts) => (id, new java.sql.Timestamp(ts)) })
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamedKept = spark.table("wm_model_test")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamedKept === predictedKept.toSet,
      s"streamed kept ${streamedKept.size} vs modeled ${predictedKept.size}")
  }

  test("stateful sessionization survives a pathological single-user batch (100k events)") {
    import spark.implicits._
    // one power user, 100k events in one batch: runs of 10 events 1s
    // apart, then a 31-minute gap -> 10k sessions of exactly 10 events
    val gapMs = 31L * 60L * 1000L
    val evs = (0 until 100000).map { i =>
      val session = i / 10
      val offset = i % 10
      Events.Ev(1L, i.toLong, session * gapMs + offset * 1000L, "click")
    }.toDS()
    val out = Events.sessionizeStateful(evs)
      .groupBy("session_seq").count()
    assert(out.count() === 10000L)
    assert(out.filter(col("count") =!= 10L).count() === 0L)
  }
}
