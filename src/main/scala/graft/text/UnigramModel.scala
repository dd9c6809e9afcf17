package graft.text

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Persistence for the unigram-LM tokenizer — the [[BpeModel]]
  * discipline applied to [[Unigram]]: the trained piece vocabulary
  * ships as a rank-ordered `pieces.txt` (`piece<TAB>micro_logprob`
  * per line — the sentencepiece `.vocab` shape with the library's
  * integer-micros determinism contract), and tokenization under a
  * read-back model is bit-equal to the in-session train→apply
  * composition (pinned in UnigramSpec). Corrupt models (missing
  * header, malformed line, empty vocabulary, a vocabulary that lost
  * its single-char coverage) fail loudly at READ time, before any
  * query is wrong.
  */
object UnigramModel {

  private val Header = "#graft-unigram-v1"

  def write(pieces: Seq[Unigram.Piece], path: String): Unit = {
    require(pieces.nonEmpty, s"refusing to write an empty unigram model to $path")
    pieces.foreach { p =>
      require(p.piece.nonEmpty && !p.piece.exists(_.isWhitespace),
        s"pieces must be non-empty and whitespace-free: '${p.piece}'")
    }
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(path),
      (Header +: pieces.map(p => s"${p.piece}\t${p.microLogProb}")).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Train on `documents` (the memoized [[Unigram.trainCached]] seam —
    * the same model q_unigram_train/q_unigram_tokenize read) and
    * persist the vocabulary in rank order.
    */
  def writeTrained(documents: DataFrame, path: String): Unit =
    write(Unigram.trainCached(documents)._1, path)

  def read(path: String): Seq[Unigram.Piece] = {
    val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala.toSeq
    require(lines.headOption.contains(Header),
      s"corrupt unigram model at $path: missing '$Header' header")
    val pieces = lines.tail.filter(_.nonEmpty).map { ln =>
      ln.split("\t", -1) match {
        case Array(p, m) if p.nonEmpty && m.matches("-?[0-9]+") =>
          Unigram.Piece(p, m.toLong)
        case _ =>
          throw new IllegalArgumentException(
            s"corrupt unigram model at $path: bad piece line '$ln'")
      }
    }
    require(pieces.nonEmpty, s"corrupt unigram model at $path: header but no pieces")
    pieces
  }

  /** Tokenize under a read-back model — [[Unigram.tokenizeWith]] over
    * the persisted vocabulary; the load-and-serve half.
    */
  def tokenize(documents: DataFrame, path: String): DataFrame =
    Unigram.tokenizeWith(documents, read(path))
}
