package graft

import org.apache.spark.sql.functions._

import graft.text.{Corpus, Text}

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("stats: percentiles are exact discrete selections on a hand-built corpus") {
    // 10 docs, token counts 1..10 -> p50 = value at rank ceil(0.5*10)=5,
    // p90 at rank 9, p99 at rank 10
    val docs = (1 to 10).map(i => (i.toLong, Seq.fill(i)("w").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val r = Corpus.stats(docs).head()
    assert(r.getLong(1) === 10L) // n_docs
    assert(r.getLong(2) === 55L) // total tokens
    assert(r.getLong(4) === 5L)  // p50
    assert(r.getLong(5) === 9L)  // p90
    assert(r.getLong(6) === 10L) // p99
  }

  test("tokenEntropy: hand-pinned distributions, bounds, and a driver-side recomputation") {
    import org.apache.spark.sql.functions.col
    // uniform over 4 distinct tokens => H = ln 4 exactly; a
    // single-token slice => H = 0; a skewed 3:1 two-token slice =>
    // H = ln 4 - (3 ln 3)/4 (c·ln c form)
    val docs = Seq(
      (1L, "a b c d", "uni", "s", 7L),
      (2L, "x x x x", "one", "s", 7L),
      (3L, "p p p q", "skew", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.text.Corpus.tokenEntropy(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got("uni") === ((4L, 4L, r6(math.log(4)))))
    assert(got("one") === ((4L, 1L, 0.0)))
    // staged exactly like the plan: micro-fixed c·ln c terms first
    val microSkew = math.floor(3.0 * math.log(3.0) * 1e6 + 0.5).toLong
    assert(got("skew") === ((4L, 2L, r6(math.log(4) - microSkew / 1e6 / 4.0))))
    // real corpus: 0 <= H <= ln(n_types), and a driver-side
    // recomputation from raw tokens agrees
    val real = graft.text.Corpus.tokenEntropy(Tables.documents(spark, sf)).collect()
    assert(real.nonEmpty)
    val raw = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = raw.groupBy(_._1).view.mapValues { rows =>
      val counts = rows.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = counts.values.sum
      val micro = counts.values.map(c => math.floor(c * math.log(c.toDouble) * 1e6 + 0.5).toLong).sum
      (n, counts.size.toLong, r6(math.log(n.toDouble) - micro / 1e6 / n))
    }.toMap
    real.foreach { r =>
      val (lang, n, types, h) = (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(h >= 0.0 && h <= math.log(types.toDouble) + 1e-9, s"$lang H=$h outside [0, ln($types)]")
      val (en, et, eh) = byLang(lang)
      assert((n, types) === ((en, et)), s"$lang counts")
      assert(math.abs(h - eh) < 2e-6, s"$lang H=$h expected $eh")
    }
  }

  test("sourceProfile: cross-source dup awareness, micro-exact mean quality, partition of the corpus") {
    import org.apache.spark.sql.functions.col
    // doc 1 (src A) and doc 2 (src B) are exact copies ACROSS sources:
    // both sources must count one exact-dup doc; doc 3 is unique
    val docs = Seq(
      (1L, "the quick brown fox jumps over it", "en", "A", 0L),
      (2L, "the quick brown fox jumps over it", "en", "B", 0L),
      (3L, "a completely different document body", "en", "B", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.text.Corpus.sourceProfile(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === Set("A", "B"))
    assert(got("A")._1 === 1L && got("A")._4 === 1L && got("A")._5 === 1.0)
    assert(got("B")._1 === 2L && got("B")._4 === 1L && got("B")._5 === 0.5)
    assert(got("A")._2 === 7L && got("B")._2 === 7L + 5L)
    // mean quality equals the micro-staged mean of the per-doc scores
    val q = graft.text.Text.quality(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    def microMean(ids: Seq[Long]) = {
      val micro = ids.map(id => math.floor(q(id) * 1e6 + 0.5).toLong).sum
      math.floor(micro / 1e6 / ids.size * 1e6 + 0.5) / 1e6
    }
    assert(got("A")._3 === microMean(Seq(1L)))
    assert(got("B")._3 === microMean(Seq(2L, 3L)))
    // real corpus: sources partition the table; fractions in [0,1]
    val real = graft.text.Corpus.sourceProfile(Tables.documents(spark, sf)).collect()
    assert(real.nonEmpty)
    assert(real.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
    real.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(4) <= r.getLong(1))
    }
  }

  test("stats and statsApprox agree on counts and are close on percentiles") {
    val exact = Corpus.stats(Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Corpus.statsApprox(Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (lang, e) =>
      val a = approx(lang)
      assert(e.getLong(1) === a.getLong(1)) // n_docs
      assert(e.getLong(2) === a.getLong(2)) // total_tokens
      assert(math.abs(e.getLong(4) - a.getLong(4)) <= 2, s"$lang p50")
    }
  }

  test("stratified sample keeps ~rate(lang)% deterministically, repeatably") {
    val docs = Tables.documents(spark, sf)
    val s1 = Corpus.stratifiedSample(docs, Corpus.defaultMix)
    val s2 = Corpus.stratifiedSample(docs, Corpus.defaultMix)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === s2.select("doc_id").collect().map(_.getLong(0)).toSet)
    // rates hold approximately (doc_id uniform mod 100)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Corpus.defaultMix.foreach { case (lang, rate) =>
      val frac = kept.getOrElse(lang, 0L).toDouble / byLang(lang)
      assert(math.abs(frac - rate / 100.0) < 0.2, s"$lang kept $frac expected ~${rate / 100.0}")
    }
  }

  test("tokenBudgetSample hits each language's token budget within sampling noise") {
    val docs = Tables.documents(spark, sf)
    val budgets = Map("en" -> 5000L, "zh" -> 2000L)
    val out = Corpus.tokenBudgetSample(docs, budgets, defaultBudget = 2500L).cache()
    val keptTokens = out.groupBy("lang").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs
      .select(col("lang"), size(Text.tokens(col("text"))).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, total) =>
      val budget = budgets.getOrElse(lang, 2500L)
      val kept = keptTokens.getOrElse(lang, 0L)
      // a slice under budget is kept whole; otherwise the modulo
      // sample lands within noise of the budget (doc_id uniform)
      if (total <= budget) assert(kept === total, s"$lang under-budget slice must be kept whole")
      else assert(math.abs(kept - budget) < budget / 2 + 500,
        s"$lang kept $kept tokens for budget $budget (total $total)")
    }
    // deterministic: same call, same kept set
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Corpus.tokenBudgetSample(docs, budgets, defaultBudget = 2500L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("packSequences: hand-built docs pin the concat-and-chunk layout") {
    // token counts 4, 4, 4, 4 with seqLen 10: start offsets 0,4,8,12 →
    // sequences 0,0,0,1 at offsets 0,4,8,2 (doc 2 spans the boundary —
    // the point of chunk packing)
    val docs = Seq(
      (0L, "a b c d"), (1L, "e f g h"), (2L, "i j k l"), (3L, "m n o p"))
      .toDF("doc_id", "text")
    val got = Corpus.packSequences(docs, seqLen = 10, blockSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 4L, 0L, 0L), (1L, 4L, 0L, 4L), (2L, 4L, 0L, 8L), (3L, 4L, 1L, 2L)))
  }

  test("packSequences: the two-level cumsum equals the single-block formulation on real data") {
    val docs = Tables.documents(spark, sf)
    def rows(blockSize: Long) =
      Corpus.packSequences(docs, blockSize = blockSize).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // blockSize larger than the corpus = a single block = the plain
    // global cumsum; tiny blocks exercise the block-offset join path
    assert(rows(7) === rows(1000000))
  }

  test("packSequencesBpe: budgets are the BPE token counts; layout equals a driver-side cumsum") {
    val docs = Tables.documents(spark, sf)
    val got = Corpus.packSequencesBpe(docs, seqLen = 64, blockSize = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // budgets must be EXACTLY bpeTokenize's n_bpe_tokens (merge-heavy
    // docs take fewer slots than their word count — the operator's
    // reason to exist vs the whitespace-budget q_pack_sequences)
    val counts = graft.text.Bpe.bpeTokenize(docs)
      .select(col("doc_id"), col("n_bpe_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap === counts)
    // and at least one document must differ from its whitespace count
    val ws = Corpus.packSequences(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.exists { case (id, n) => n != ws(id) },
      "BPE budgets should diverge from whitespace budgets somewhere")
    // driver-side recomputation of the full layout
    var off = 0L
    counts.toSeq.sortBy(_._1).foreach { case (id, n) =>
      val (gn, seqId, seqOff) = got(id)
      assert(gn === n && seqId === off / 64 && seqOff === off % 64, s"doc $id layout")
      off += n
    }
  }

  test("packSequencesShuffled: layout equals a driver-side cumsum over the md5 order") {
    val docs = Tables.documents(spark, sf)
    val got = Corpus.packSequencesShuffled(docs, seqLen = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val counts = Corpus.packSequences(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // budgets identical to the unshuffled layout — only the ORDER moves
    assert(got.view.mapValues(_._1).toMap === counts)
    // driver recomputation: concat in (md5(doc_id), doc_id) order
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    var off = 0L
    counts.toSeq.sortBy { case (id, _) => (md5hex(id.toString), id) }.foreach {
      case (id, n) =>
        val (gn, seqId, seqOff) = got(id)
        assert(gn === n && seqId === off / 64 && seqOff === off % 64, s"doc $id layout")
        off += n
    }
    // and the shuffle is real: some doc lands in a different sequence
    // than the doc_id-ordered layout puts it in
    val plain = Corpus.packSequences(docs, seqLen = 64).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.exists { case (id, (_, seqId, _)) => seqId != plain(id) },
      "shuffled layout should diverge from ingestion order somewhere")
  }

  test("curationVerdicts: every flag ties out against its standalone operator; keep is the conjunction") {
    val docs = Tables.documents(spark, sf)
    val got = Corpus.curationVerdicts(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size === docs.count())
    // stage tie-outs
    val q = graft.text.Text.quality(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("quality_score"))).toMap
    val ppl = graft.text.LangModel.pplFilter(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val losers = graft.dedup.Dedup.clustersQuery(docs).collect()
      .filter(r => r.getLong(1) != r.getLong(0)).map(_.getLong(0)).toSet
    val cont = graft.dedup.Dedup.containedDrop(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (kq, kp, kd, kc, keep)) =>
      assert(kq === (if (q(id) >= 0.6) 1L else 0L), s"doc $id quality")
      assert(kp === ppl.getOrElse(id, 0L), s"doc $id ppl")
      assert(kd === (if (losers(id)) 0L else 1L), s"doc $id dedup")
      assert(kc === cont(id), s"doc $id containment")
      assert(keep === (if (kq == 1 && kp == 1 && kd == 1 && kc == 1) 1L else 0L))
    }
    // the funnel is real: something survives, something drops, and at
    // least two distinct stages reject documents on the test corpus
    val kept = got.values.count(_._5 == 1L)
    assert(kept > 0 && kept < got.size)
    val rejectingStages = Seq(
      got.values.exists(_._1 == 0L), got.values.exists(_._2 == 0L),
      got.values.exists(_._3 == 0L), got.values.exists(_._4 == 0L)).count(identity)
    assert(rejectingStages >= 2, "the funnel should exercise multiple gates")
  }

  test("packBins: hand-built corpus pins FFD placements, oversize isolation, group boundaries") {
    import spark.implicits._
    def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"t$i").mkString(" "))
    // group 0 (cap 10): lengths 7, 5, 4, 3, 1 → FFD desc: 7→b0, 5→b1,
    // 4→b1(5+4=9), 3→b0(7+3=10 boundary), 1→b0? 10+1>10 → b1? 9+1=10 ✓
    // oversize 12 → its own over-full bin first (sorted desc)
    val docs = Seq(doc(0L, 7), doc(1L, 5), doc(2L, 4), doc(3L, 3), doc(4L, 1),
      doc(5L, 12), // oversize: alone in its bin
      doc(128L, 6), doc(129L, 6), // group 1: neither pair fits together
      doc(130L, 0) // empty: holds no slot
    ).toDF("doc_id", "text")
    val out = Corpus.packBins(docs, cap = 10, groupSize = 128).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!out.contains(130L), "empty docs hold no slot")
    // FFD order in group 0: 12, 7, 5, 4, 3, 1
    assert(out(5L) === ((12L, 0L, 0L)), "oversize opens bin 0, alone")
    assert(out(0L) === ((7L, 1L, 0L)))
    assert(out(1L) === ((5L, 2L, 0L)))
    assert(out(2L) === ((4L, 2L, 5L)), "4 first-fits bin 2 at offset 5")
    assert(out(3L) === ((3L, 1L, 7L)), "3 fills bin 1 to the boundary")
    assert(out(4L) === ((1L, 2L, 9L)), "1 first-fits bin 2, not the full bin 1")
    assert(out(128L) === ((6L, 128L, 0L)) && out(129L) === ((6L, 129L, 0L)),
      "group 1 bins (grp·groupSize + i = 128, 129) never mix with group 0")
  }

  test("packBins on the corpus: driver FFD replay, load caps, the ≤1-half-empty-bin law") {
    val docs = Tables.documents(spark, sf)
    val out = Corpus.packBins(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = docs.withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).filter(_._2 >= 1)
    // exact driver-side FFD replay
    val expect = counts.groupBy(_._1 / 128L).toSeq.flatMap { case (g, ds) =>
      val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
      ds.sortBy { case (id, n) => (-n, id) }.toSeq.map { case (id, n) =>
        var i = 0
        while (i < loads.length && loads(i) + n > 512L) i += 1
        val off = if (i < loads.length) loads(i) else 0L
        if (i < loads.length) loads(i) += n else loads += n
        (id, n, g * 128L + i, off)
      }
    }.toSet
    assert(out.toSet === expect, "distributed packing == sequential FFD per group")
    val loads = out.groupBy(_._3).map { case (b, ds) => b -> ds.map(_._2).sum }
    loads.foreach { case (b, l) =>
      val members = out.filter(_._3 == b)
      assert(l <= 512L || members.length === 1, s"bin $b over cap with ${members.length} docs")
    }
    // first-fit structural law: ≤1 bin per group ends ≤ half-full
    // (two such bins would have merged when the second opened)
    loads.groupBy(_._1 / 128L).foreach { case (g, bs) =>
      assert(bs.count(_._2 <= 256L) <= 1, s"group $g half-empty bins")
    }
    // volume lower bound: FFD can't beat ceil(tokens / cap) bins per group
    out.groupBy(_._3 / 128L).foreach { case (g, ds) =>
      val bins = ds.map(_._3).distinct.size
      val vol = ds.map(_._2).sum
      assert(bins >= ((vol + 511L) / 512L).toInt, s"group $g volume bound")
    }
  }

  test("lengthBuckets: integer pow2 caps, exact-boundary docs, waste accounting") {
    // counts 1,2,3,4,5,8,9 → caps 1,2,4,4,8,8,16 (exact powers stay in
    // their own cap — the float-log2 hazard the binary-string length
    // formulation exists to dodge)
    val docs = Seq(
      (0L, "a"), (1L, "a b"), (2L, "a b c"), (3L, "a b c d"),
      (4L, "a b c d e"), (5L, "a b c d e f g h"), (6L, "a b c d e f g h i"),
      (7L, "")) // empty doc: no batch slot, excluded
      .toDF("doc_id", "text")
    val got = Corpus.lengthBuckets(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 4L, 8L, 16L))
    assert(got(1L) === ((1L, 1L, 0L, 0.0)))
    assert(got(2L) === ((1L, 2L, 0L, 0.0)))
    assert(got(4L) === ((2L, 7L, 1L, 0.125)))       // 3+4 tokens in 2×4 slots
    assert(got(8L) === ((2L, 13L, 3L, 0.1875)))     // 5+8 tokens in 2×8 slots
    assert(got(16L) === ((1L, 9L, 7L, 0.4375)))     // 9 tokens in one 16 slot
    // real corpus: buckets partition the non-empty docs, waste ∈ [0, 0.5)
    val real = Corpus.lengthBuckets(Tables.documents(spark, sf)).collect()
    val nDocs = Tables.documents(spark, sf)
      .filter(size(graft.text.Text.tokens(col("text"))) >= 1).count()
    assert(real.map(_.getLong(1)).sum === nDocs)
    real.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 0.5,
        s"cap ${r.getLong(0)}: pow2 buckets can never waste half a slot")
      assert(java.lang.Long.bitCount(r.getLong(0)) === 1, "caps must be powers of two")
    }
  }

  test("ngramVocab: hand-built corpus pins ranks and the bucket pre-prune is lossless") {
    val docs = Seq(
      (0L, "x y x y x z", "en"), (1L, "x y q r", "en"), (2L, "s t s t", "de"))
      .toDF("doc_id", "text", "lang")
    // en bigrams: "x y"×3 (docs 0,0,1), "y x"×2, "x z"×1, "y q"×1, "q r"×1
    val got = Corpus.ngramVocab(docs, k = 2)
      .orderBy("lang", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("de", 1L, "s t", 2L), ("de", 2L, "t s", 1L),
      ("en", 1L, "x y", 3L), ("en", 2L, "y x", 2L)))
    // exactness of the two-phase top-k: any bucket count gives the
    // same answer as a single bucket (= the plain one-window top-k)
    val real = Tables.documents(spark, sf)
    val b1 = Corpus.ngramVocab(real, k = 5, buckets = 1).collect().map(_.toSeq).toSet
    val b64 = Corpus.ngramVocab(real, k = 5, buckets = 64).collect().map(_.toSeq).toSet
    assert(b1 === b64)
  }

  test("curate composes filters, mixture sample, and global dedup survivor selection") {
    val docs = Tables.documents(spark, sf)
    val allowed = Set("en", "es", "de", "zh")
    val out = Corpus.curate(docs).collect()
    assert(out.nonEmpty)
    // every row respects the three filters
    out.foreach { r =>
      val (id, lang, score) = (r.getLong(0), r.getString(1), r.getDouble(3))
      assert(allowed.contains(lang), s"doc $id lang $lang outside allow-list")
      val rate = Corpus.defaultMix.getOrElse(lang, 10)
      assert(((id % 100) + 100) % 100 < rate, s"doc $id fails the mixture sample")
      assert(score >= 0.6, s"doc $id quality $score below tau")
    }
    // no near-dup loser survives: losers = cluster members with a
    // smaller-id representative, computed over the FULL corpus
    val losers = graft.dedup.Dedup
      .clustersQuery(docs)
      .filter(col("cluster_id") =!= col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val kept = out.map(_.getLong(0)).toSet
    assert(kept.intersect(losers).isEmpty, "a dedup loser survived curation")
    // and curation only ever REMOVES rows relative to the plain
    // sample+quality pipeline; the delta is exactly the losers present there
    val noDedup = docs
      .filter(col("lang").isInCollection(allowed.toSeq) &&
        pmod(col("doc_id"), lit(100)) < when(col("lang") === "en", 20).otherwise(60))
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(noDedup))
  }

  test("groupSample: exactly k per language (or the whole slice), equal to the one-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val k = 7
    val got = Corpus.groupSample(docs, k = k)
    // per-language count = min(k, slice size)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotSizes = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotSizes === sizes.map { case (l, n) => l -> math.min(k.toLong, n) })
    // the two-phase prune is lossless vs the single-window rank
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")).asc, col("doc_id").asc)
    val ref = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"), col("source"))
    assert(got.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
  }

  test("qualityWeightedSample: keep rate tracks the quality score; draw is deterministic and scan-side") {
    val docs = Tables.documents(spark, sf)
    val kept = Corpus.qualityWeightedSample(docs)
    val quality = graft.text.Text.quality(docs)
      .select(col("doc_id"), col("quality_score"))
    // every kept doc individually satisfies the documented predicate
    val bad = kept.filter(
      pmod(col("doc_id") * 48271L, lit(1000000L)) >=
        floor(col("quality_score") * 1000000.0 + 0.5).cast("long"))
    assert(bad.count() === 0)
    // aggregate keep rate ~ mean quality (the draw is uniform over ids)
    val meanQ = quality.agg(avg(col("quality_score"))).head().getDouble(0)
    val rate = kept.count().toDouble / docs.count()
    assert(math.abs(rate - meanQ) < 0.15, s"rate $rate vs mean quality $meanQ")
    // repeatable and one scan, no shuffle before the filter
    assert(kept.collect().map(_.getLong(0)).toSet ===
      Corpus.qualityWeightedSample(docs).collect().map(_.getLong(0)).toSet)
    assert(!planOf(Corpus.qualityWeightedSample(docs)).contains("Exchange"))
  }

  test("temperatureMix: T=1 tracks natural shares, higher T flattens the mix toward the tail") {
    val docs = Tables.documents(spark, sf)
    def tokensByLang(mix: org.apache.spark.sql.DataFrame) =
      mix.groupBy("lang").agg(sum("n_tokens").as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val natural = tokensByLang(Corpus.temperatureMix(docs, temperature = 1.0))
    val flat = tokensByLang(Corpus.temperatureMix(docs, temperature = 100.0))
    assert(natural.nonEmpty && flat.nonEmpty)
    // en dominates the corpus: flattening must cut en's share of the
    // kept tokens and raise the smallest language's share
    def share(m: Map[String, Long], l: String) =
      m.getOrElse(l, 0L).toDouble / m.values.sum
    assert(share(flat, "en") < share(natural, "en"))
    val tail = natural.keys.minBy(l => share(natural, l))
    assert(share(flat, tail) > share(natural, tail))
    // keep decision is the documented deterministic modulo predicate
    val kept = Corpus.temperatureMix(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Corpus.temperatureMix(docs).select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("sourceOverlap: hand-built cross-source pairs canonicalize and count; totals tie to the pair graph") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, t, "srcB"),
      (2L, t, "srcA"),
      (3L, t, "srcA"),
      (4L, "completely different words with no shared shingles at all here", "srcC")
    ).toDF("doc_id", "text", "source")
    val got = Corpus.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // pairs: (1,2) (1,3) cross srcA/srcB — canonical a-side is srcA
    // (docs 2,3), b-side srcB (doc 1); (2,3) on the srcA diagonal
    assert(got === Map(
      ("srcA", "srcB") -> ((2L, 2L, 1L)),
      ("srcA", "srcA") -> ((1L, 1L, 1L))))
    // real corpus: the matrix partitions the pair graph exactly, and
    // every row is canonically ordered
    val d = Tables.documents(spark, sf)
    val rows = Corpus.sourceOverlap(d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) <= r.getString(1)))
    assert(rows.map(_.getLong(2)).sum === graft.dedup.Dedup.pairsCached(d).count(),
      "every near-dup pair must land in exactly one matrix cell")
  }

  test("mixEpochs: driver BigInt reimplementation agrees exactly; caps and budget accounting hold") {
    val docs = Tables.documents(spark, sf)
    val (temperature, budget, maxEp) = (2.0, 20000L, 4)
    val got = Corpus.mixEpochs(docs, temperature, budget, maxEp).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty)
    // independent driver-side BigInt arithmetic over the same rollup
    val byLang = docs
      .withColumn("n", size(graft.text.Text.tokens(col("text"))).cast("long"))
      .groupBy("lang").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.filter(_._2 > 0)
    val nTotal = byLang.values.sum
    val wInts = byLang.view.mapValues(nL =>
      math.floor(math.pow(nL.toDouble / nTotal, 1.0 / temperature) * 1e6 + 0.5).toLong).toMap
    val sumW = wInts.values.sum
    val capMicro = maxEp * 1000000L
    val expect = byLang.map { case (l, nL) =>
      val target = (BigInt(budget) * wInts(l) / sumW).toLong
      val raw = (BigInt(target) * 1000000 / nL).toLong
      val capped = if (raw > capMicro) 1L else 0L
      val eff = if (capped == 1L) nL * maxEp else target
      l -> ((nL, target, math.min(raw, capMicro), capped, eff))
    }
    assert(got === expect, "mixEpochs drifted from the driver BigInt arithmetic")
    // budget accounting: targets never exceed the budget, effective
    // tokens never exceed the target, and a capped language's
    // effective supply is exactly maxEpochs passes over its data
    assert(got.values.map(_._2).sum <= budget)
    got.values.foreach { case (nAvail, target, epMicro, capped, eff) =>
      assert(eff <= target)
      assert(epMicro <= capMicro)
      if (capped == 1L) assert(eff === nAvail * maxEp) else assert(eff === target)
    }
    // maxEpochs=1 under a budget far beyond supply: every language
    // capped at exactly one epoch (effective = available)
    val onePass = Corpus.mixEpochs(docs, temperature, 1000000000000L, 1).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(onePass.nonEmpty)
    onePass.foreach { case (nAvail, epMicro, capped, eff) =>
      assert(capped === 1L && epMicro === 1000000L && eff === nAvail)
    }
    // flattening: higher T never lowers the tail language's implied
    // epochs (its budget share only grows as the mix flattens)
    val tail = byLang.minBy(_._2)._1
    def epochsOf(t: Double) = Corpus.mixEpochs(docs, t, budget, 1000).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(epochsOf(8.0)(tail) >= epochsOf(1.0)(tail))
  }

  test("temperatureMix: trillion-token budgets do not wrap (decimal-staged keep-rate products)") {
    // ADVICE r5: budgetTokens*w_int*granularity wrapped a Long once
    // budgetTokens exceeded ~9e10. At a 1e15 budget every language's
    // budget share dwarfs its supply, so every keep_q must saturate at
    // the full granularity (keep everything) — under Long wrap the
    // quotient went negative and silently kept nothing.
    val docs = Tables.documents(spark, sf)
    val all = Corpus.temperatureMix(docs, budgetTokens = 1000000000000000L)
    val tokenized = docs.filter(size(graft.text.Text.tokens(col("text"))) >= 0)
    assert(all.count() === tokenized.count(), "huge budget must keep every document")
    // and a BigInt reimplementation of the keep-rate arithmetic agrees
    // at a budget that lands strictly between wrap-prone products
    val budget = 200000000000L // 2e11: wraps the old Long product
    val mixed = Corpus.temperatureMix(docs, budgetTokens = budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byLang = docs
      .withColumn("n", size(graft.text.Text.tokens(col("text"))).cast("long"))
      .select("lang", "doc_id", "n").collect()
      .groupBy(_.getString(0))
    val nTotal = byLang.values.flatten.map(_.getLong(2)).sum
    val wInts = byLang.view.mapValues { rows =>
      val nL = rows.map(_.getLong(2)).sum
      math.floor(math.pow(nL.toDouble / nTotal, 1.0 / 2.0) * 1e6 + 0.5).toLong -> nL
    }.toMap.filter(_._2._2 > 0)
    val sumW = wInts.values.map(_._1).sum
    val expect = byLang.flatMap { case (lang, rows) =>
      wInts.get(lang).toSeq.flatMap { case (w, nL) =>
        val keepQ = ((BigInt(budget) * w * 100) / (BigInt(sumW) * nL)).min(100).toLong
        rows.filter(r => r.getLong(1) % 100 < keepQ).map(_.getLong(1))
      }
    }.toSet
    assert(mixed === expect)
  }

  test("chunk: hand-built doc pins starts, trailing short chunks, and chunk identity") {
    import spark.implicits._
    // 5 tokens, chunk=4, stride=2 -> starts 0,2,4 with lens 4,3,1
    val docs = Seq((1L, "t0 t1 t2 t3 t4"), (2L, ""))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val got = Corpus.chunk(docs, chunkTokens = 4, stride = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.map(c => (c._1, c._2, c._3)).toSeq.sorted ===
      Seq((0L, 0L, 4L), (1L, 2L, 3L), (2L, 4L, 1L)))
    // empty doc produces no chunks; chunk_md5 is the md5 of the joined slice
    assert(got.length === 3)
    val c0 = got.find(_._1 == 0L).get
    assert(c0._4 === java.security.MessageDigest.getInstance("MD5")
      .digest("t0 t1 t2 t3".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("chunk on real docs: full coverage, stride spacing, no shuffle in the plan") {
    val docs = Tables.documents(spark, sf)
    val ch = Corpus.chunk(docs)
    // every token of every non-empty doc is inside chunk 0..; the
    // first chunk starts at 0 and consecutive starts differ by stride
    val perDoc = ch.groupBy("doc_id")
      .agg(min("start_tok").as("first"), max("chunk_id").as("last_id"),
        count(lit(1)).as("n_chunks"))
    assert(perDoc.filter(col("first") =!= 0).count() === 0)
    assert(perDoc.filter(col("n_chunks") =!= col("last_id") + 1).count() === 0)
    assert(ch.count() > docs.count(), "docs over 32 tokens must fan out")
    val plan = planOf(Corpus.chunk(docs))
    assert(!plan.contains("Exchange"), s"chunking must be scan-side only:\n$plan")
  }

  test("vocabCoverage: equals a brute top-N ranking replay at every rung; endpoints exact") {
    val corpus = Tables.documents(spark, sf)
    // brute truth: rank the whole vocabulary (fine at spec scale),
    // then read off top-N mass — the histogram construction must
    // reproduce it exactly
    val tf = corpus.select(explode(Text.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val total = tf.map(_._2).sum
    val v = tf.length.toLong
    def topMass(n: Long) = tf.take(n.toInt).map(_._2).sum
    val rungSizes = (0 to 62).map(1L << _).filter(_ <= v).toSet + v
    val out = Corpus.vocabCoverage(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === rungSizes, "every pow2 rung <= V, plus the full-vocab row")
    out.foreach { case (n, (cov, tot, frac)) =>
      assert(tot === total)
      assert(cov === topMass(n), s"coverage at vocab_size=$n")
      assert(frac === math.floor(cov.toDouble / total * 1e6 + 0.5) / 1e6)
    }
    assert(out(1L)._1 === tf.head._2, "rung 1 = the single most frequent type")
    assert(out(v)._1 === total, "the full vocabulary covers everything")
    // ranking inside a frequency class is immaterial: any N covers the
    // same mass regardless of tie order (the histogram identity) — so
    // the brute replay above, which breaks ties (count desc, token
    // asc), must already agree; spot-check monotone concavity instead
    val seq = out.toSeq.sortBy(_._1).map(_._2._1)
    seq.sliding(2).foreach { case Seq(a, b) => assert(b >= a); case _ => }
  }

  test("shardManifest: equals a driver single-pass cumsum replay; conserves volume; id ranges tile") {
    val corpus = Tables.documents(spark, sf)
    val target = 512L
    // driver replay of the textbook one-window formulation the
    // two-level decomposition must reproduce
    val rows = corpus.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+").count(_.nonEmpty).toLong
        (r.getLong(0), toks, r.getString(1).length.toLong)
      }.sortBy(_._1)
    var off = 0L
    val assign = rows.map { case (id, nt, nc) =>
      val s = off / target; off += nt; (s, id, nt, nc)
    }
    val expect = assign.groupBy(_._1).map { case (s, g) =>
      s -> (g.length.toLong, g.map(_._3).sum, g.map(_._4).sum,
        g.map(_._2).min, g.map(_._2).max)
    }
    val out = Corpus.shardManifest(corpus, targetTokens = target).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(out.keySet === expect.keySet)
    expect.foreach { case (s, (nd, nt, nc, fd, ld)) =>
      val (ond, ont, onc, ofd, old, off6) = out(s)
      assert((ond, ont, onc, ofd, old) === ((nd, nt, nc, fd, ld)), s"shard $s")
      assert(off6 === math.floor(nt.toDouble / target * 1e6 + 0.5) / 1e6,
        s"shard $s fill_frac")
    }
    // conservation + tiling: every doc in exactly one shard, id ranges
    // contiguous in shard order (a reader can binary-search the manifest)
    assert(out.values.map(_._1).sum === rows.length.toLong)
    assert(out.values.map(_._2).sum === rows.map(_._2).sum)
    val ordered = out.toSeq.sortBy(_._1).map(v => (v._2._4, v._2._5))
    ordered.sliding(2).foreach {
      case Seq((_, l1), (f2, _)) => assert(f2 > l1, "shard id ranges must tile")
      case _ =>
    }
    assert(out.size > 1, "target must cut this corpus into multiple shards")
  }

  // ------------------------------------------------------------------
  // q186: the deterministic training-order shuffle
  // ------------------------------------------------------------------

  /** Driver replay of the shuffle keying: lowercase-hex md5 of
    * "<seed>:<doc_id>", shard from the first 6 nibbles.
    */
  private def replayKey(seed: String, docId: Long): (String, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$docId".getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    (hex, java.lang.Long.parseLong(hex.take(6), 16) % 64)
  }

  test("corpus shuffle: a permutation into dense per-shard positions, replayed driver-side") {
    val docs = Tables.documents(spark, sf)
    val got = Corpus.corpusShuffle(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet === ids, "every document appears exactly once")
    assert(got.length === ids.size)
    // dense positions 0..n-1 within every shard
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions must be dense from 0")
    }
    // full driver replay: shard and within-shard order from the md5 key
    val expected = got.map(_._1).map { id =>
      val (hex, shard) = replayKey("shuf1", id)
      (id, shard, hex)
    }.groupBy(_._2).iterator.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._1)).zipWithIndex.map { case ((id, s, _), i) => (id, s, i.toLong) }
    }.toSet
    assert(got.toSet === expected)
  }

  test("corpus shuffle: same seed replays bit-identically, a new seed reorders") {
    val docs = Tables.documents(spark, sf)
    val a = Corpus.corpusShuffle(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Corpus.corpusShuffle(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b, "identical seed must replay the identical order")
    val c = Corpus.corpusShuffle(docs, seed = "shuf2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(c !== a, "re-seeding must re-shuffle")
  }
}
