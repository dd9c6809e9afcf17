package graft.text

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Persistence for trained BPE merges — the tokenizer lifecycle's
  * missing artifact: every real tokenizer ships an ordered
  * `merges.txt`, and before this the trained rules
  * ([[Bpe.trainMerges]]) lived only in the session memo.
  *
  * Format: a plain ordered text file, one `lhs rhs` rule per line
  * under a version header — deliberately the merges.txt shape
  * (huggingface/sentencepiece lineage) rather than JSON: the rules
  * ARE an ordered list of token pairs, and [[Bpe.checkMerges]]
  * guarantees tokens are non-empty, `|`-free and whitespace-free, so
  * the space-separated line round-trips bit-exactly. Apply order is
  * line order (rank order), which is the entire model semantics.
  *
  * The [[PqIndex]] write/read/identity discipline applies verbatim:
  * BpeSpec proves tokenizing with read-back rules hash-EQUAL to the
  * in-session train→apply composition (q_bpe_train_apply), and a
  * corrupt or empty model fails loudly instead of silently
  * tokenizing with no rules.
  */
object BpeModel {

  private val Header = "#graft-bpe-v1"

  /** Write an ordered merges list. Refuses an empty list (an empty
    * model would silently no-op every tokenization) and re-validates
    * the token alphabet so a bad rule fails at WRITE time, not in the
    * eventual reader's query.
    */
  def write(merges: Seq[(String, String)], path: String): Unit = {
    require(merges.nonEmpty, s"refusing to write an empty BPE model to $path")
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !(a + b).exists(c => c == '|' || c.isWhitespace),
        s"merge tokens must be non-empty, '|'-free and whitespace-free: ($a, $b)")
    }
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(path),
      (Header +: merges.map { case (a, b) => s"$a $b" }).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Train on `documents` (memoized — the same seam q_bpe_train and
    * q_bpe_train_apply read) and persist the learned rules in rank
    * order.
    */
  def writeTrained(
      documents: DataFrame, path: String, nMerges: Int = Bpe.defaultTrainRounds): Unit =
    write(
      Bpe.trainMergesCached(documents, nMerges).sortBy(_._1).map { case (_, l, r, _, _) => (l, r) },
      path)

  /** Read an ordered merges list back. Fails loudly on a missing
    * header, a malformed rule line, or a model with no rules.
    */
  def read(path: String): Seq[(String, String)] = {
    val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala.toSeq
    require(lines.headOption.contains(Header),
      s"corrupt BPE model at $path: missing '$Header' header")
    val rules = lines.tail.filter(_.nonEmpty).map { ln =>
      ln.split(" ", -1) match {
        case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
        case _ =>
          throw new IllegalArgumentException(s"corrupt BPE model at $path: bad rule line '$ln'")
      }
    }
    require(rules.nonEmpty, s"corrupt BPE model at $path: header but no rules")
    rules
  }

  /** Tokenize with read-back rules — [[Bpe.bpeTokenize]] under the
    * persisted model; the load-and-serve half of the lifecycle.
    */
  def tokenize(documents: DataFrame, path: String): DataFrame =
    Bpe.bpeTokenize(documents, read(path))
}
