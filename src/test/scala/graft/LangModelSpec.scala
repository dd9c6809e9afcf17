package graft

import org.apache.spark.sql.functions._

import graft.text.{LangModel, Text}

class LangModelSpec extends SparkSpec {

  test("surprisal: hand corpus matches the micro-nat fixed-point formula") {
    import spark.implicits._
    // corpus: "a a a a" + "a b" => cnt(a)=5, cnt(b)=1, N=6
    val docs = Seq((1L, "a a a a"), (2L, "a b"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    def micro(tf: Long, cnt: Long): Long =
      math.floor(tf * math.log(6.0 / cnt) * 1e6 + 0.5).toLong
    def score(parts: (Long, Long)*): Double = {
      val m = parts.map { case (tf, cnt) => micro(tf, cnt) }.sum
      val n = parts.map(_._1).sum
      math.floor(m / 1e6 / n * 1e6 + 0.5) / 1e6
    }
    val got = LangModel.surprisal(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> ((4L, score((4L, 5L)))),
      2L -> ((2L, score((1L, 5L), (1L, 1L))))))
    // the all-common-token doc scores strictly lower than the one
    // holding the rare token
    assert(got(1L)._2 < got(2L)._2)
  }

  test("surprisalBigram equals a driver-side reimplementation on a fixed-seed random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val texts = (0L until 30L).map { id =>
      // include sub-bigram docs (0/1 tokens) to pin the exclusion rule
      val n = rnd.nextInt(10)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = texts.toDF("doc_id", "text")
    val lambda = 0.75
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toVector }.toMap
    val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = uni.values.sum
    val bigrams = toks.values.flatMap(ts => ts.zip(ts.drop(1))).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val expect = toks.collect { case (id, ts) if ts.size >= 2 =>
      val bf = ts.zip(ts.drop(1)).groupBy(identity).view.mapValues(_.size.toLong)
      val micro = bf.map { case ((w1, w2), f) =>
        val p = lambda * (bigrams((w1, w2)).toDouble / uni(w1)) +
          (1.0 - lambda) * (uni(w2).toDouble / nTotal)
        math.floor(f * -math.log(p) * 1e6 + 0.5).toLong
      }.sum
      val n = ts.size - 1L
      id -> ((n, math.floor(micro / 1e6 / n * 1e6 + 0.5) / 1e6))
    }
    val got = LangModel.surprisalBigram(docs, lambda).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expect)
    assert(got.nonEmpty && got.keySet === toks.filter(_._2.size >= 2).keySet)
  }

  test("surprisalBigram on real docs: templated word order scores below shuffled order") {
    val docs = Tables.documents(spark, sf)
    val s = LangModel.surprisalBigram(docs)
    assert(s.filter(col("avg_nats") < 0).count() === 0)
    // n_bigrams = n_tokens - 1 for every doc with >= 2 tokens
    val ts = Text.tokenStats(docs).select(col("doc_id"), col("n_tokens").as("n_ws"))
    val joined = s.join(ts, "doc_id")
    assert(joined.filter(col("n_bigrams") =!= col("n_ws") - 1).count() === 0)
    assert(s.count() === ts.filter(col("n_ws") >= 2).count())
    // order sensitivity — the point of the bigram rung: a corpus whose
    // docs repeat one bigram pattern scores lower than the same tokens
    // in a broken order with the same unigram profile
    import spark.implicits._
    val patterned = (0L until 20L).map(i => (i, "x1 y2 " * 10)).toDF("doc_id", "text")
    val broken = (0L until 20L).map { i =>
      (i, (if (i % 2 == 0) "x1 x1 y2 y2 " else "y2 x1 x1 y2 ") * 5)
    }.toDF("doc_id", "text")
    def mean(df: org.apache.spark.sql.DataFrame) =
      LangModel.surprisalBigram(df).agg(avg(col("avg_nats"))).head().getDouble(0)
    assert(mean(patterned) < mean(broken), "repeated bigram pattern must score lower")
  }

  test("surprisalTrigram equals a driver-side reimplementation on a fixed-seed random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val texts = (0L until 30L).map { id =>
      // include sub-trigram docs (0/1/2 tokens) to pin the exclusion rule
      val n = rnd.nextInt(12)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = texts.toDF("doc_id", "text")
    val (l1, l2) = (0.5, 0.3)
    val l3 = 1.0 - l1 - l2
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toVector }.toMap
    // all orders over the TRIGRAM event space (the operator's contract)
    val allTris = toks.values.flatMap(ts =>
      ts.indices.dropRight(2).map(i => (ts(i), ts(i + 1), ts(i + 2)))).toSeq
    val tri = allTris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx12 = allTris.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong).toMap
    val suf23 = allTris.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val mid2 = allTris.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val u3 = allTris.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nTotal = allTris.size.toLong
    val expect = toks.collect { case (id, ts) if ts.size >= 3 =>
      val tf = ts.indices.dropRight(2).map(i => (ts(i), ts(i + 1), ts(i + 2)))
        .groupBy(identity).view.mapValues(_.size.toLong)
      val micro = tf.map { case (tg @ (w1, w2, w3), f) =>
        val p = l1 * (tri(tg).toDouble / ctx12((w1, w2))) +
          l2 * (suf23((w2, w3)).toDouble / mid2(w2)) +
          l3 * (u3(w3).toDouble / nTotal)
        math.floor(f * -math.log(p) * 1e6 + 0.5).toLong
      }.sum
      val n = ts.size - 2L
      id -> ((n, math.floor(micro / 1e6 / n * 1e6 + 0.5) / 1e6))
    }
    val got = LangModel.surprisalTrigram(docs, l1, l2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expect)
    assert(got.nonEmpty && got.keySet === toks.filter(_._2.size >= 3).keySet)
  }

  test("surprisalTrigram on real docs: positive scores, counts, trigram order sensitivity") {
    val docs = Tables.documents(spark, sf)
    val s = LangModel.surprisalTrigram(docs)
    assert(s.filter(col("avg_nats") < 0).count() === 0)
    val ts = Text.tokenStats(docs).select(col("doc_id"), col("n_tokens").as("n_ws"))
    val joined = s.join(ts, "doc_id")
    assert(joined.filter(col("n_trigrams") =!= col("n_ws") - 2).count() === 0)
    assert(s.count() === ts.filter(col("n_ws") >= 3).count())
    // the trigram rung separates patterns the BIGRAM model cannot: both
    // corpora below share the same bigram profile ("x y" / "y x" mix),
    // but only one repeats a fixed three-token cycle
    import spark.implicits._
    val cyclic = (0L until 20L).map(i => (i, "x1 y2 z3 " * 8)).toDF("doc_id", "text")
    val broken = (0L until 20L).map { i =>
      (i, (if (i % 2 == 0) "x1 y2 x1 z3 y2 z3 " else "y2 z3 x1 y2 z3 x1 ") * 4)
    }.toDF("doc_id", "text")
    def mean(df: org.apache.spark.sql.DataFrame) =
      LangModel.surprisalTrigram(df).agg(avg(col("avg_nats"))).head().getDouble(0)
    assert(mean(cyclic) < mean(broken), "repeated trigram cycle must score lower")
  }

  test("pplFilter: bands equal a driver-side tercile computation over the surprisal scores") {
    val docs = Tables.documents(spark, sf)
    val micros = LangModel.surprisal(docs).collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(2) * 1e6 + 0.5).toLong).toMap
    val sorted = micros.values.toSeq.sorted
    val n = sorted.size
    def cut(p: Double) = sorted(math.ceil(p * n).toInt - 1)
    val (t1, t2) = (cut(1.0 / 3.0), cut(2.0 / 3.0))
    val expect = micros.view.mapValues(m =>
      if (m <= t1) "head" else if (m <= t2) "middle" else "tail").toMap
    val got = LangModel.pplFilter(docs).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(got.length === n && n > 0)
    got.foreach { case (id, band, keep) =>
      assert(band === expect(id), s"doc $id band")
      assert(keep === (if (band == "tail") 0L else 1L), s"doc $id keep")
    }
    // all three bands are populated on the real corpus, and the filter
    // keeps roughly two thirds (exact up to micro-nat ties)
    val byBand = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(Set("head", "middle", "tail").subsetOf(byBand.keySet), byBand.toString)
    assert(byBand("head") >= n / 3 && byBand("head") + byBand("middle") >= 2 * n / 3)
  }

  test("pplIncremental: batch scored under the store's smoothed LM, kept at the store's cut") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val got = LangModel.pplIncremental(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // exactly the batch slice with >=1 token
    val batchIds = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .withColumn("n", size(graft.text.Text.tokens(col("text"))))
      .filter(col("n") >= 1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.keySet === batchIds && got.nonEmpty)
    // driver-side recomputation: store counts, add-one smoothing,
    // micro-nat fixed point, store tercile cut
    val toks = docs.collect().map(r =>
      r.getLong(0) -> r.getString(r.fieldIndex("text")).split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val store = toks.filter(_._1 % 10 != 0)
    val sv = store.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = sv.values.sum
    val v = sv.size.toLong
    def score(ts: Seq[String]): (Long, Double, Long) = {
      val micro = ts.groupBy(identity).map { case (w, ws) =>
        val p = (sv.getOrElse(w, 0L).toDouble + 1.0) / (n + v + 1L).toDouble
        math.floor(ws.size * -math.log(p) * 1e6 + 0.5).toLong
      }.sum
      val avg = math.floor(micro / 1e6 / ts.size * 1e6 + 0.5) / 1e6
      (ts.size.toLong, avg, math.floor(avg * 1e6 + 0.5).toLong)
    }
    val storeMicros = store.values.filter(_.nonEmpty).map(score(_)._3).toSeq.sorted
    val t2 = storeMicros(math.ceil(2.0 / 3.0 * storeMicros.size).toInt - 1)
    toks.filter { case (id, ts) => id % 10 == 0 && ts.nonEmpty }.foreach { case (id, ts) =>
      val (nt, avg, micro) = score(ts)
      val (gn, ga, gk) = got(id)
      assert(gn === nt && ga === avg, s"doc $id score")
      assert(gk === (if (micro <= t2) 1L else 0L), s"doc $id keep")
    }
    // OOV is finite: a batch doc made of store-unseen tokens scores
    // the OOV ceiling, not infinity
    val tiny = Seq((1L, "aa bb aa cc"), (3L, "bb cc dd"), (10L, "zz yy xx")).toDF("doc_id", "text")
    val oov = LangModel.pplIncremental(tiny).collect()
    assert(oov.length === 1 && oov.head.getDouble(2) > 0 && !oov.head.getDouble(2).isInfinite)
  }

  test("LmIndex order 1: write -> read -> score hash-EQUAL to the in-session screen; disk query equals memory query") {
    import spark.implicits._
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    val docs = Tables.documents(spark, sf)
    val store = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    def set(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("lm_idx_").toString
    try {
      graft.text.LmIndex.write(store, dir, order = 1)
      val (order, n, v, t2, _, _, _) = graft.text.LmIndex.readMeta(dir)
      assert(order === 1 && n > 0 && v > 0 && t2 > 0)
      val disk = set(graft.text.LmIndex.score(spark, batch, dir))
      val mem = set(LangModel.pplScreenAgainst(batch, store))
      assert(disk === mem, "disk-served order-1 LM score drifted from the in-session screen")
      assert(disk.nonEmpty)
    } finally rmrf(dir)
    // the mod-split disk query serves identical verdicts to q135
    assert(set(LangModel.pplIncrementalDisk(docs)) === set(LangModel.pplIncremental(docs)),
      "pplIncrementalDisk drifted from pplIncremental")
    // loud corrupt-layout failure
    val bad = java.nio.file.Files.createTempDirectory("lm_bad_").toString
    try {
      intercept[IllegalArgumentException] { graft.text.LmIndex.score(spark, batch, bad) }
    } finally rmrf(bad)
  }

  test("LmIndex orders 2/3: hand-pinned interpolation + backoff; OOV contexts back off into the smoothed base, never NaN") {
    import spark.implicits._
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    // tiny deterministic store: "a b a b c" + "a b c" — known counts
    val store = Seq((1L, "a b a b c"), (3L, "a b c")).toDF("doc_id", "text")
    // store unigram base: a:3 b:3 c:2, N=8 V=3 -> p1(w)=(c+1)/12
    def p1(c: Long): Double = (c + 1.0) / 12.0
    val lambda = 0.75
    val dir2 = java.nio.file.Files.createTempDirectory("lm_bi_").toString
    try {
      graft.text.LmIndex.write(store, dir2, order = 2, lambda = lambda)
      // bigram counts over the store: (a,b):3 (b,a):1 (b,c):2; c1 = unigram(a)=3, (b)=3
      // batch doc "a b x": events (a,b) seen, (b,x) OOV w2 + unseen bigram
      val batch = Seq((10L, "a b x")).toDF("doc_id", "text")
      val got = graft.text.LmIndex.score(spark, batch, dir2).collect()
      assert(got.length === 1)
      val pAB = lambda * (3.0 / 3.0) + (1 - lambda) * p1(3) // seen bigram
      val pBX = lambda * (0.0 / 3.0) + (1 - lambda) * p1(0) // unseen bigram, OOV w2
      val micro = math.floor(1 * -math.log(pAB) * 1e6 + 0.5).toLong +
        math.floor(1 * -math.log(pBX) * 1e6 + 0.5).toLong
      val avg = math.floor(micro / 1e6 / 2.0 * 1e6 + 0.5) / 1e6
      assert(got.head.getLong(1) === 2L, "two bigram events")
      assert(got.head.getDouble(2) === avg, "hand-computed interpolated bigram score")
      assert(!got.head.getDouble(2).isInfinite && !got.head.getDouble(2).isNaN)
      // a batch doc whose w1 context is fully OOV: p = (1-lambda)*p1(w2) only
      val oov = Seq((20L, "z a")).toDF("doc_id", "text")
      val g2 = graft.text.LmIndex.score(spark, oov, dir2).collect()
      val pZA = (1 - lambda) * p1(3) // c1(z)=0 -> bigram term backs off to 0
      val exp2 = math.floor(math.floor(1 * -math.log(pZA) * 1e6 + 0.5).toLong / 1e6 / 1.0 * 1e6 + 0.5) / 1e6
      assert(g2.head.getDouble(2) === exp2, "OOV context must back off to the base term alone")
    } finally rmrf(dir2)

    val dir3 = java.nio.file.Files.createTempDirectory("lm_tri_").toString
    try {
      val (l1, l2) = (0.5, 0.3)
      graft.text.LmIndex.write(store, dir3, order = 3, l1 = l1, l2 = l2)
      // trigram events in store: doc1: (a,b,a) (b,a,b) (a,b,c); doc3: (a,b,c)
      // tri: (a,b,a):1 (b,a,b):1 (a,b,c):2; ctx12 (a,b):3 (b,a):1;
      // suf23 (b,a):1 (a,b):1 (b,c):2; mid2 b:3 a:1  (wait: mid2 from suf23 by w2: a->? )
      val batch = Seq((10L, "a b c")).toDF("doc_id", "text")
      val got = graft.text.LmIndex.score(spark, batch, dir3).collect()
      // event (a,b,c): c123=2, c12(a,b)=3, c23(b,c)=2, c2(b)= suf23 with w2=b -> (b,a):1+(b,c):2 = 3
      val p = l1 * (2.0 / 3.0) + l2 * (2.0 / 3.0) + (1 - l1 - l2) * p1(2)
      val exp = math.floor(math.floor(1 * -math.log(p) * 1e6 + 0.5).toLong / 1e6 / 1.0 * 1e6 + 0.5) / 1e6
      assert(got.length === 1 && got.head.getLong(1) === 1L)
      assert(got.head.getDouble(2) === exp, "hand-computed interpolated trigram score")
      // fully-OOV trigram: only the l3 base term survives
      val oov = Seq((20L, "x y z")).toDF("doc_id", "text")
      val g3 = graft.text.LmIndex.score(spark, oov, dir3).collect()
      val pOov = (1 - l1 - l2) * p1(0)
      val expO = math.floor(math.floor(1 * -math.log(pOov) * 1e6 + 0.5).toLong / 1e6 / 1.0 * 1e6 + 0.5) / 1e6
      assert(g3.head.getDouble(2) === expO, "fully-OOV trigram must score the l3 base alone")
      // write -> read -> score is deterministic: two reads agree exactly
      val again = graft.text.LmIndex.score(spark, batch, dir3).collect()
      assert(again.head.getDouble(2) === got.head.getDouble(2))
    } finally rmrf(dir3)
  }

  test("surprisal on real docs: positive scores, token counts agree with tokenStats") {
    val docs = Tables.documents(spark, sf)
    val s = LangModel.surprisal(docs)
    assert(s.filter(col("avg_nats") < 0).count() === 0)
    val ts = Text.tokenStats(docs).select(col("doc_id"), col("n_tokens").as("n_ws"))
    val joined = s.join(ts, "doc_id")
    assert(joined.filter(col("n_tokens") =!= col("n_ws")).count() === 0)
    // every non-empty doc is scored
    assert(s.count() === ts.filter(col("n_ws") > 0).count())
  }
}
