package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("wordPosteriors: hand-built two-path lattice splits mass correctly") {
    // word "ab", vocab {a, b, ab} with p(a)=p(b)=0.25, p(ab)=0.5:
    // path1 = a·b = 0.0625, path2 = ab = 0.5, Z = 0.5625
    val vocab = Map("a" -> 0, "b" -> 1, "ab" -> 2)
    val lp = Array(math.log(0.25), math.log(0.25), math.log(0.5))
    val post = Unigram.wordPosteriors("ab", vocab, lp, 6)
    assert(math.abs(post(0) - 0.0625 / 0.5625) < 1e-12)
    assert(math.abs(post(1) - 0.0625 / 0.5625) < 1e-12)
    assert(math.abs(post(2) - 0.5 / 0.5625) < 1e-12)
    val z = Unigram.wordLogZ("ab", vocab, lp, 6)
    assert(math.abs(z - math.log(0.5625)) < 1e-12)
  }

  test("viterbi: best path wins; ties prefer the longer piece; coverage via chars") {
    val vocab = Map("a" -> 0, "b" -> 1, "ab" -> 2)
    assert(Unigram.viterbi("ab", vocab,
      Array(math.log(0.25), math.log(0.25), math.log(0.5)), 6) === Seq("ab"))
    // equal-probability tie: ab (one piece, p=.25) beats a·b (.25·.25)
    assert(Unigram.viterbi("ab", vocab,
      Array(math.log(0.25), math.log(0.25), math.log(0.25)), 6) === Seq("ab"))
    // unseen substring falls back to chars
    assert(Unigram.viterbi("ba", vocab,
      Array(math.log(0.25), math.log(0.25), math.log(0.5)), 6) === Seq("b", "a"))
  }

  test("train: a repetitive corpus promotes the repeated piece; EM likelihood is monotone") {
    val corpus = docs(
      1L -> "abab abab abab", 2L -> "abab abab", 3L -> "cd cd cd abab")
    val (pieces, ll) = Unigram.train(corpus,
      vocabSize = 16, seedSize = 32, emIters = 4)
    val byPiece = pieces.map(p => p.piece -> p.microLogProb).toMap
    assert(byPiece.contains("abab") || byPiece.contains("ab"),
      s"repeated piece must survive pruning: ${pieces.map(_.piece)}")
    // every single char of the corpus is in the vocabulary
    Seq("a", "b", "c", "d").foreach(c => assert(byPiece.contains(c), s"char $c"))
    // EM monotonicity in micro-nats (1 micro slack for the fixing)
    ll.sliding(2).foreach { case Seq(x, y) =>
      assert(y >= x - 1L, s"likelihood regressed: $ll")
    }
    assert(ll.length === 5) // emIters + the post-EM audit pass
  }

  test("train is bit-deterministic run to run (fresh frames, no memo)") {
    val mk = () => docs(1L -> "xyz xyz wvu", 2L -> "xyz wvu wvu xyz")
    val (p1, l1) = Unigram.train(mk(), vocabSize = 16, seedSize = 32, emIters = 3)
    val (p2, l2) = Unigram.train(mk(), vocabSize = 16, seedSize = 32, emIters = 3)
    assert(p1 === p2)
    assert(l1 === l2)
  }

  test("UnigramModel: write -> read -> tokenize bit-equal to in-session; corrupt models loud") {
    import graft.text.UnigramModel
    val corpus = docs(1L -> "foo bar foo baz", 2L -> "bar bar foo")
    val (pieces, _) = Unigram.train(corpus, vocabSize = 16, seedSize = 32, emIters = 2)
    val path = java.nio.file.Files.createTempDirectory("unigram_model_")
      .resolve("pieces.txt").toString
    UnigramModel.write(pieces, path)
    assert(UnigramModel.read(path) === pieces, "integer micros must round-trip exactly")
    val inSession = Unigram.tokenizeWith(corpus, pieces)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val viaDisk = UnigramModel.tokenize(corpus, path)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(viaDisk.toSeq === inSession.toSeq)
    intercept[IllegalArgumentException] { UnigramModel.write(Seq.empty, path) }
    val bad = java.nio.file.Files.createTempDirectory("unigram_bad_")
      .resolve("pieces.txt")
    java.nio.file.Files.write(bad, "not a header\nfoo\t1".getBytes("UTF-8"))
    intercept[IllegalArgumentException] { UnigramModel.read(bad.toString) }
  }

  test("tokenizerCompare: word totals agree across families; fertilities well-formed") {
    val corpus = Tables.documents(spark, sf)
    val out = Unigram.tokenizerCompare(corpus).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size === 5, s"langs: ${out.keySet}")
    // the same whitespace split on both sides: per-lang word totals
    // must equal a driver recomputation
    val words = corpus.collect().groupBy(_.getString(2)).map { case (l, rs) =>
      l -> rs.map(_.getString(1).split("\\s+").count(_.nonEmpty).toLong).sum
    }
    out.foreach { case (lang, r) =>
      assert(r.getLong(2) === words(lang), s"$lang word total")
      assert(r.getLong(3) >= r.getLong(2), s"$lang bpe pieces cover words")
      assert(r.getLong(5) >= r.getLong(2), s"$lang unigram pieces cover words")
      assert(r.getDouble(4) >= 1.0 && r.getDouble(6) >= 1.0)
    }
  }

  test("unigramTokenize: full corpus coverage, composition with the self-trained vocab") {
    val corpus = Tables.documents(spark, sf)
    val out = Unigram.unigramTokenize(corpus).collect()
    assert(out.length === corpus.count())
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: pieces must cover every word")
      assert(r.getString(3).length === 32)
    }
    // artifact sanity: vocab rows + ll rows, ranked, chars flagged
    val art = Unigram.unigramTrain(corpus).collect()
    val vocabRows = art.filter(!_.getString(1).startsWith("__ll_iter_"))
    assert(vocabRows.length >= 16)
    assert(vocabRows.forall(r => r.getBoolean(3) === (r.getString(1).length == 1)))
    val llRows = art.filter(_.getString(1).startsWith("__ll_iter_"))
    assert(llRows.length === Unigram.defaultEmIters + 1)
  }
}
