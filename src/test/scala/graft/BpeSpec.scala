package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, Text}

class BpeSpec extends SparkSpec {

  /** Independent driver-side greedy BPE: classic list fold per word,
    * rule by rule — the semantics the replace-chain must reproduce.
    */
  private def driverBpe(text: String, merges: Seq[(String, String)]): Seq[Seq[String]] = {
    val words = text.replace("|", "").split("\\s+").filter(_.nonEmpty).toSeq
    words.map { w =>
      merges.foldLeft(w.map(_.toString): Seq[String]) { case (toks, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2 // consume both: no rescan of own output
          } else { out += toks(i); i += 1 }
        }
        out.toSeq
      }
    }
  }

  test("hand-pinned merges: chained rules, within-word only, unknown words split to chars") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the then and"),  // the->1 tok; then->the+n; and->1 tok
      (2L, "zzq"),           // no rules apply -> 3 char tokens
      (3L, ""),              // empty -> all zeros
      (4L, "a|b")            // reserved delimiter stripped -> "ab" -> 2 toks (a,b unmergeable)
    ).toDF("doc_id", "text")
    val got = Bpe.bpeTokenize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 10L, 4L)), "the=1, then=2, and=1 -> 4 BPE tokens over 10 chars")
    assert(got(2L) === ((1L, 3L, 3L)))
    assert(got(3L) === ((0L, 0L, 0L)))
    assert(got(4L) === ((1L, 2L, 2L)))
  }

  test("overlapping candidates merge greedily left-to-right without rescanning") {
    import spark.implicits._
    val docs = Seq((1L, "aaa"), (2L, "aaaa"), (3L, "aaaaa")).toDF("doc_id", "text")
    val got = Bpe.bpeTokenize(docs, merges = Seq("a" -> "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // aaa -> [aa, a]; aaaa -> [aa, aa]; aaaaa -> [aa, aa, a]
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
  }

  test("matches the driver-side greedy reimplementation on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val got = Bpe.bpeTokenize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val words = driverBpe(text, Bpe.defaultMerges)
      val exp = (words.size.toLong, words.map(_.map(_.length).sum).sum.toLong,
        words.map(_.size).sum.toLong)
      assert(got(id) === exp, s"doc $id: expected $exp got ${got(id)}")
    }
    // BPE must actually compress vs characters on English-ish text
    val totalChars = got.values.map(_._2).sum.toDouble
    val totalToks = got.values.map(_._3).sum.toDouble
    assert(totalToks < totalChars * 0.80, s"merges should cut >20% of char tokens: $totalToks/$totalChars")
  }

  test("plan is a pure scan-side projection: no Exchange beyond the spread, no Join, no explode") {
    val plan = planOf(Bpe.bpeTokenize(Tables.documents(spark, sf)))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Generate"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 1, s"only the Spread repartition may shuffle:\n$plan")
  }

  test("fertility: hand-built per-language counts, null ratios on empty slices, no doc_id join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the then and", "en"), // 3 words, 10 chars, 4 bpe tokens
      (4L, "the the", "en"),      // 2 words, 6 chars, 2 bpe tokens
      (2L, "zzq", "xx"),          // 1 word, 3 chars, 3 bpe tokens
      (3L, "", "xx"),             // empty doc contributes zeros
      (5L, "", "yy")              // all-empty slice: ratios are null
    ).toDF("doc_id", "text", "lang")
    val f = Bpe.fertility(docs).collect().map(r => r.getString(0) -> r).toMap
    val en = f("en")
    assert((en.getLong(1), en.getLong(2), en.getLong(3), en.getLong(4)) === ((2L, 5L, 16L, 6L)))
    assert(en.getDouble(5) === math.floor(6.0 / 5.0 * 1e6 + 0.5) / 1e6)
    assert(en.getDouble(6) === math.floor(16.0 / 6.0 * 1e6 + 0.5) / 1e6)
    val xx = f("xx")
    assert((xx.getLong(1), xx.getLong(2), xx.getLong(3), xx.getLong(4)) === ((2L, 1L, 3L, 3L)))
    assert(xx.getDouble(5) === 3.0)
    assert(xx.getDouble(6) === 1.0)
    val yy = f("yy")
    assert((yy.getLong(1), yy.getLong(2)) === ((1L, 0L)))
    assert(yy.isNullAt(5) && yy.isNullAt(6), "zero-word slice must not divide")
    // lang rides the scan: no Join anywhere, one Exchange for the
    // ≤|langs|-row rollup (plus at most the Spread repartition)
    val plan = planOf(Bpe.fertility(Tables.documents(spark, sf)))
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 2, s"scan + bounded rollup only:\n$plan")
  }

  test("fertility agrees with the per-doc tokenize artifact rolled up by language") {
    val d = Tables.documents(spark, sf)
    val perDoc = Bpe.bpeTokenize(d)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_words")).as("w"),
        sum(col("n_chars")).as("c"), sum(col("n_bpe_tokens")).as("t"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val got = Bpe.fertility(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === perDoc, "fertility drifted from the per-doc artifact it summarizes")
    assert(got.nonEmpty)
  }

  /** Independent driver-side BPE TRAINER: classic histogram-based
    * loop — overlapping pair counts (get_stats), deterministic
    * argmax, non-overlapping left-to-right merge — the algorithm the
    * distributed rounds must reproduce rule for rule.
    */
  private def driverTrain(texts: Seq[String], nMerges: Int): Seq[(Long, String, String, String, Long)] = {
    def mergeOnce(toks: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) { out += a + b; i += 2 }
        else { out += toks(i); i += 1 }
      }
      out.toSeq
    }
    var hist: Map[String, (Seq[String], Long)] = texts
      .flatMap(_.replace("|", "").split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ((w.map(_.toString): Seq[String]) -> ws.size.toLong) }
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    while (learned.length < nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      hist.values.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
          case _         =>
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), s) = counts.minBy { case ((a, b), s) => (-s, a, b) }
        learned += (((learned.length + 1).toLong, a, b, a + b, s))
        hist = hist.map { case (w, (syms, cnt)) => w -> ((mergeOnce(syms, a, b), cnt)) }
      }
    }
    learned.toSeq
  }

  test("trainBpe matches the driver-side trainer rule for rule on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val got = Bpe.trainBpe(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
      .sortBy(_._1)
    val texts = docs.select(col("text")).collect().map(_.getString(0)).toSeq
    val exp = driverTrain(texts, Bpe.defaultTrainRounds)
    assert(got.length === Bpe.defaultTrainRounds, "real corpus should sustain all rounds")
    assert(got === exp)
    // supports are non-increasing in rank only per-pair-family, but the
    // FIRST rule must be the global argmax: nothing later beats it
    assert(got.tail.forall(_._5 <= got.head._5))
  }

  test("trainBpe past the old 64-round cap: 72 rounds stay driver-equal (linear flattened chain)") {
    import spark.implicits._
    // a corpus rich enough to sustain 72 distinct merges: varied words
    // with deterministic structure
    val texts = (0 until 120).map(i =>
      s"alpha$i beta${i % 7} gamma${i % 11} delta epsilon zeta${i % 5} " +
        "the quick brown fox jumps over the lazy dog repeatedly")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.trainBpe(docs, nMerges = 72).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
      .sortBy(_._1)
    val exp = driverTrain(texts, 72)
    assert(got.length === 72, s"corpus must sustain 72 rounds, got ${got.length}")
    assert(got === exp, "rounds past the checkpoint boundaries must stay rule-for-rule exact")
  }

  test("trained merges compose into bpeTokenize; more rules never inflate the token count") {
    val docs = Tables.documents(spark, sf)
    val rules = Bpe.trainBpe(docs).collect()
      .sortBy(_.getLong(0)).map(r => r.getString(1) -> r.getString(2)).toSeq
    def total(ms: Seq[(String, String)]): Long =
      Bpe.bpeTokenize(docs, merges = ms).agg(sum("n_bpe_tokens")).head.getLong(0)
    // n_chars is independent of the merges argument
    val chars = Bpe.bpeTokenize(docs).agg(sum("n_chars")).head.getLong(0)
    val half = total(rules.take(Bpe.defaultTrainRounds / 2))
    val full = total(rules)
    assert(full <= half, "extending the merges list can only merge further")
    assert(full < chars, "trained rules must actually compress the corpus")
  }

  test("training: deterministic lexicographic tie-break and chained merges") {
    import spark.implicits._
    // "the" x3: round 1 ties (h,e) vs (t,h) at 3 -> lexicographic (h,e);
    // round 2 then merges across the learned symbol: (t, he)
    val docs = Seq((1L, "the the the")).toDF("doc_id", "text")
    val got = Bpe.trainBpe(docs, nMerges = 2).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got === Seq(("h", "e", 3L), ("t", "he", 3L)))
  }

  test("training stops early when the vocabulary has no adjacent pairs left") {
    import spark.implicits._
    val single = Seq((1L, "a b c a"), (2L, "b c")).toDF("doc_id", "text")
    assert(Bpe.trainBpe(single, nMerges = 5).count() === 0, "single-char words have no pairs")
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val rules = Bpe.trainBpe(tiny, nMerges = 5).collect()
    assert(rules.length === 1, "one merge exhausts 'ab'")
    assert((rules.head.getString(1), rules.head.getString(2), rules.head.getLong(4)) === (("a", "b", 2L)))
  }

  test("train->apply composition equals tokenizing with the collected trained rules") {
    val docs = Tables.documents(spark, sf)
    val rules = Bpe.trainBpe(docs).collect()
      .sortBy(_.getLong(0)).map(r => r.getString(1) -> r.getString(2)).toSeq
    val direct = Bpe.bpeTokenize(docs, merges = rules).collect().map(_.toSeq).toSet
    val composed = Bpe.bpeTokenizeTrained(docs).collect().map(_.toSeq).toSet
    assert(composed === direct)
    // self-trained rules compress at least as well as the shipped head
    // on the corpus they were trained on (greedy argmax per round)
    val shipped = Bpe.bpeTokenize(docs).agg(sum("n_bpe_tokens")).head.getLong(0)
    val trained = Bpe.bpeTokenizeTrained(docs).agg(sum("n_bpe_tokens")).head.getLong(0)
    assert(trained <= shipped,
      s"self-trained merges should beat the generic shipped head: $trained vs $shipped")
  }

  test("BpeModel: train -> write -> read -> tokenize is hash-EQUAL to the in-session train->apply") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model_").toString
    val path = s"$dir/merges.txt"
    try {
      graft.text.BpeModel.writeTrained(docs, path)
      // the persisted file is the merges.txt shape: header + ordered rules
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      assert(lines.get(0) === "#graft-bpe-v1")
      assert(lines.size() > 1)
      // read-back rules are bit-identical to the in-session memo
      val rules = graft.text.BpeModel.read(path)
      val inSession = Bpe.trainBpe(docs).collect()
        .sortBy(_.getLong(0)).map(r => r.getString(1) -> r.getString(2)).toSeq
      assert(rules === inSession)
      // and tokenizing under the read-back model is row-identical to
      // the composed q_bpe_train_apply
      val fromDisk = graft.text.BpeModel.tokenize(docs, path).collect().map(_.toSeq).toSet
      val composed = Bpe.bpeTokenizeTrained(docs).collect().map(_.toSeq).toSet
      assert(fromDisk === composed)
      assert(fromDisk.nonEmpty)
    } finally {
      new java.io.File(path).delete()
      new java.io.File(dir).delete()
    }
  }

  test("BpeModel: corrupt, empty and headerless models fail loudly") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("bpe_model_bad_").toString
    def put(name: String, content: String): String = {
      val p = s"$dir/$name"
      Files.write(Paths.get(p), content.getBytes("UTF-8"))
      p
    }
    try {
      intercept[IllegalArgumentException](graft.text.BpeModel.write(Seq.empty, s"$dir/empty.txt"))
      intercept[IllegalArgumentException](
        graft.text.BpeModel.write(Seq("a" -> "|"), s"$dir/badtok.txt"))
      intercept[IllegalArgumentException](
        graft.text.BpeModel.read(put("noheader.txt", "a b\nc d")))
      intercept[IllegalArgumentException](
        graft.text.BpeModel.read(put("norules.txt", "#graft-bpe-v1\n")))
      intercept[IllegalArgumentException](
        graft.text.BpeModel.read(put("badline.txt", "#graft-bpe-v1\na b c")))
    } finally {
      Option(new java.io.File(dir).listFiles()).foreach(_.foreach(_.delete()))
      new java.io.File(dir).delete()
    }
  }

  test("the wrapped representation never contains a triple pipe (the SQL no-op guard)") {
    // sqlBpeTokenizeTrained coalesces an exhausted round's pattern to
    // '|||'; that is only a no-op if '|||' cannot occur in the wrapped
    // token stream (pipe runs are at most 2: |c| -> boundaries '||',
    // word gaps '| |')
    val docs = Tables.documents(spark, sf)
    val toks = Text.tokens(regexp_replace(col("text"), "\\|", ""))
    val wrapped = regexp_replace(concat_ws(" ", toks), "([^ ])", "|$1|")
    assert(docs.select(wrapped.as("w")).filter(col("w").contains("|||")).count() === 0)
  }

  test("merge tokens containing the reserved delimiter or whitespace are rejected") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Bpe.bpeTokenize(docs, merges = Seq("a" -> "|")))
    intercept[IllegalArgumentException](Bpe.bpeTokenize(docs, merges = Seq("a b" -> "c")))
    intercept[IllegalArgumentException](Bpe.bpeTokenize(docs, merges = Seq("" -> "c")))
  }
}
