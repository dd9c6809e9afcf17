package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the privacy screen every training-data
  * pipeline runs before release (the C4/RefinedWeb discipline: emails,
  * phone numbers, IP addresses, payment-card numbers scrubbed to
  * placeholder tokens, with per-document counts kept as signals).
  *
  * The synthetic corpus ships zero PII by construction, so — the
  * [[graft.mm.MediaCodec]] planting discipline — the operator PLANTS
  * deterministic PII from doc_id arithmetic and then detects it FOR
  * REAL: the DuckDB twin replays both the planting and the full
  * detection/validation/redaction pipeline, so the hash gate proves
  * cross-engine equivalence of every rule (a wrong Luhn branch, octet
  * bound, or redaction order fails the hash). Planted shapes:
  *
  *   - doc_id % 5 == 0  → an email
  *   - doc_id % 7 == 0  → a VALID IPv4 (octets bounded by planting)
  *   - doc_id % 17 == 0 → an IPv4 LOOKALIKE with out-of-range octets
  *                        (999.300.1.2) — dotted-quad shape, not an IP
  *   - doc_id % 11 == 0 → a 16-digit card number whose Luhn check
  *                        digit is CORRECT for even doc_id and
  *                        deliberately broken (+5 mod 10) for odd —
  *                        so Luhn validation genuinely separates
  *   - doc_id % 13 == 0 → an E.164-ish phone (+1 and 10 digits)
  *
  * Detection semantics (the production trade-off, documented):
  * candidate extraction is regex (shared Java/RE2-safe constants —
  * no lookarounds; `\b` is ASCII in both engines), VALIDATION is
  * arithmetic (all four octets ≤ 255; Luhn mod-10 over the 16 digits,
  * fully unrolled — no per-digit lambda fold), and REDACTION is
  * conservative: every candidate is scrubbed, lookalikes included —
  * a scrub pass takes no validation risk — while the counts report
  * what actually validated (what a PII-rate dashboard reads).
  *
  * Scale shape: pure per-row Column expressions — scan-side, codegen
  * regexes, zero shuffles; the per-row candidate lists the array
  * lambdas walk are O(planted-PII-per-doc), never corpus-sized.
  */
object Pii {

  val ipv4Re  = """([0-9]{1,3}\.){3}[0-9]{1,3}"""
  val phoneRe = """\+[0-9]{10,14}"""
  val cardRe  = """\b[0-9]{16}\b"""

  private val payloadMod = 1000000000000000L // 10^15
  private val phoneMod   = 10000000000L      // 10^10

  // ---------------------------------------------------------- planting

  /** Luhn sum of a FIXED-LENGTH digit string: digits at odd 1-based
    * positions from the LEFT are doubled when the total length is even
    * (16-digit card: distance-from-right 17-i is even iff i is odd);
    * for the 15-digit payload the SAME parity holds (the check digit
    * will sit at the undoubled rightmost slot). Fully unrolled — 15 or
    * 16 fixed substring terms, no lambda, codegen-friendly.
    */
  private def luhnSum(s: Column, len: Int): Column =
    (1 to len).map { i =>
      val d = substring(s, i, 1).cast("int")
      if (i % 2 == 1) { val dd = d * 2; when(dd > 9, dd - 9).otherwise(dd) }
      else d
    }.reduce(_ + _)

  private def sqlLuhnSum(s: String, len: Int): String =
    (1 to len).map { i =>
      val d = s"CAST(substr($s, $i, 1) AS INT)"
      if (i % 2 == 1) s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString("(", " + ", ")")

  /** The 16-digit planted card: 15 payload digits from doc_id
    * arithmetic + a check digit that is Luhn-correct iff doc_id is
    * even. Exposed for the spec's driver-side recomputation.
    */
  private[graft] def cardCol(docId: Column): Column = {
    val payload = lpad((docId * 1234567L + 42L).cast("long").mod(payloadMod)
      .cast("string"), 15, "0")
    val check = pmod(lit(10) - pmod(luhnSum(payload, 15), lit(10)), lit(10))
    val digit = when(docId.mod(2) === 0, check).otherwise(pmod(check + 5, lit(10)))
    concat(payload, digit.cast("string"))
  }

  private def sqlCard: String = {
    val pay = s"lpad(CAST((doc_id * 1234567 + 42) % $payloadMod AS VARCHAR), 15, '0')"
    val chk = s"(10 - ${sqlLuhnSum(pay, 15)} % 10) % 10"
    val dig = s"CASE WHEN doc_id % 2 = 0 THEN $chk ELSE ($chk + 5) % 10 END"
    s"$pay || CAST($dig AS VARCHAR)"
  }

  /** text + the planted PII suffixes, in a fixed order. */
  private[text] def plantedCol: Column = {
    val id = col("doc_id")
    concat(col("text"),
      when(id.mod(5) === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(id.mod(7) === 0,
        concat(lit(" from 10."), id.mod(256L).cast("string"), lit("."),
          (id * 3L).mod(256L).cast("string"), lit("."),
          (id.mod(250L) + 1L).cast("string"))).otherwise(lit("")),
      when(id.mod(17) === 0, lit(" at 999.300.1.2")).otherwise(lit("")),
      when(id.mod(11) === 0, concat(lit(" card "), cardCol(id))).otherwise(lit("")),
      when(id.mod(13) === 0,
        concat(lit(" tel +1"),
          lpad((id * 999L + 7L).mod(phoneMod).cast("string"), 10, "0")))
        .otherwise(lit("")))
  }

  private def sqlPlanted: String =
    "text" +
      " || (CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END)" +
      " || (CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 3) % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 + 1 AS VARCHAR) ELSE '' END)" +
      " || (CASE WHEN doc_id % 17 = 0 THEN ' at 999.300.1.2' ELSE '' END)" +
      s" || (CASE WHEN doc_id % 11 = 0 THEN ' card ' || $sqlCard ELSE '' END)" +
      " || (CASE WHEN doc_id % 13 = 0 THEN ' tel +1' || lpad(CAST((doc_id * 999 + 7) % 10000000000 AS VARCHAR), 10, '0') ELSE '' END)"

  // --------------------------------------------------------- detection

  /** q147: the PII scan + scrub over the planted corpus. */
  def piiScrub(documents: DataFrame): DataFrame = {
    val p = plantedCol
    val ipCands = regexp_extract_all(p, lit(ipv4Re), lit(0))
    val ipValid = filter(ipCands, c => {
      val oct = split(c, "\\.")
      oct.getItem(0).cast("int") <= 255 && oct.getItem(1).cast("int") <= 255 &&
        oct.getItem(2).cast("int") <= 255 && oct.getItem(3).cast("int") <= 255
    })
    val cardCands = regexp_extract_all(p, lit(cardRe), lit(0))
    val cardValid = filter(cardCands, c => pmod(luhnSum(c, 16), lit(10)) === 0)
    val scrubbed = trim(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(p, Text.emailRe, "<email>"),
      ipv4Re, "<ip>"), cardRe, "<card>"), phoneRe, "<phone>"))
    graft.Spread(documents).select(
      col("doc_id"),
      size(regexp_extract_all(p, lit(Text.emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(p, lit(phoneRe), lit(0))).cast("long").as("n_phones"),
      size(ipCands).cast("long").as("n_ipv4_candidates"),
      size(ipValid).cast("long").as("n_ipv4_valid"),
      size(cardCands).cast("long").as("n_card_candidates"),
      size(cardValid).cast("long").as("n_cards_luhn_valid"),
      scrubbed.as("pii_scrubbed"))
      .withColumn("has_pii",
        col("n_emails") > 0 || col("n_phones") > 0 ||
          col("n_ipv4_valid") > 0 || col("n_cards_luhn_valid") > 0)
  }

  /** q163: the composed per-document POLICY table — the four
    * independent per-doc screens a curation policy reads, joined into
    * one row per doc (the #134 funnel's FILTER-side sibling: #134
    * composes quality × perplexity × dedup × containment; this
    * composes the NAMED rule bundles + the privacy screen): gopher
    * keep (#145's pinned parameters), c4 keep (#146's), has_pii
    * (#147's validated detections), the blended quality score (#19),
    * and the conjunction (pii is a veto: a doc with validated PII
    * does not ship regardless of quality). All four constituents are
    * scan-side hash-exact operators over the SAME corpus scan shape —
    * the composition is three doc_id equi-joins of same-sized
    * per-doc tables (at 100 TB: co-partitioned by doc_id, or fused
    * into one scan; the joins here keep each constituent
    * independently testable). Twin composes the constituent SQL ⇒
    * hash-exact end to end.
    */
  def policyReport(documents: DataFrame): DataFrame = {
    val g = Text.gopherFilter(documents, minStopwords = 1L)
      .select(col("doc_id"), col("keep").as("gopher_keep"))
    val c = Text.c4Filter(documents, blocklist = Seq("slow"),
      enforceTerminal = false, enforceSentences = false)
      .select(col("doc_id"), col("keep").as("c4_keep"))
    val p = piiScrub(documents).select(col("doc_id"), col("has_pii"))
    val q = Text.quality(documents)
      .select(col("doc_id"), col("quality_score"))
    g.join(c, "doc_id").join(p, "doc_id").join(q, "doc_id")
      .withColumn("keep",
        col("gopher_keep") && col("c4_keep") && !col("has_pii"))
      .select(col("doc_id"), col("gopher_keep"), col("c4_keep"),
        col("has_pii"), col("quality_score"), col("keep"))
  }

  def sqlPolicyReport: String =
    s"""WITH prg AS (
       |  SELECT doc_id, keep AS gopher_keep FROM (
       |${Text.sqlGopherFilter(minStopwords = 1L)}
       |  )
       |), prc AS (
       |  SELECT doc_id, keep AS c4_keep FROM (
       |${Text.sqlC4Filter(blocklist = Seq("slow"),
          enforceTerminal = false, enforceSentences = false)}
       |  )
       |), prp AS (
       |  SELECT doc_id, has_pii FROM (
       |$sqlPiiScrub
       |  )
       |), prq AS (
       |  SELECT doc_id, quality_score FROM (
       |${Text.sqlQuality}
       |  )
       |)
       |SELECT prg.doc_id, gopher_keep, c4_keep, has_pii, quality_score,
       |  (gopher_keep AND c4_keep AND NOT has_pii) AS keep
       |FROM prg
       |JOIN prc ON prg.doc_id = prc.doc_id
       |JOIN prp ON prg.doc_id = prp.doc_id
       |JOIN prq ON prg.doc_id = prq.doc_id""".stripMargin

  def sqlPiiScrub: String = {
    val ipOk = (k: Int) => s"CAST(string_split(c, '.')[$k] AS INT) <= 255"
    s"""WITH pp AS (
       |  SELECT doc_id, $sqlPlanted AS p FROM documents
       |), pd AS (
       |  SELECT doc_id, p,
       |    regexp_extract_all(p, '${ipv4Re}') AS ip_cands,
       |    regexp_extract_all(p, '${cardRe}') AS card_cands
       |  FROM pp
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(p, '${Text.emailRe}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(p, '${phoneRe}')) AS BIGINT) AS n_phones,
       |  CAST(len(ip_cands) AS BIGINT) AS n_ipv4_candidates,
       |  CAST(len(list_filter(ip_cands, c -> ${ipOk(1)} AND ${ipOk(2)} AND ${ipOk(3)} AND ${ipOk(4)})) AS BIGINT) AS n_ipv4_valid,
       |  CAST(len(card_cands) AS BIGINT) AS n_card_candidates,
       |  CAST(len(list_filter(card_cands, c -> ${sqlLuhnSum("c", 16)} % 10 = 0)) AS BIGINT) AS n_cards_luhn_valid,
       |  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(p,
       |    '${Text.emailRe}', '<email>', 'g'),
       |    '${ipv4Re}', '<ip>', 'g'),
       |    '${cardRe}', '<card>', 'g'),
       |    '${phoneRe}', '<phone>', 'g')) AS pii_scrubbed,
       |  (len(regexp_extract_all(p, '${Text.emailRe}')) > 0
       |   OR len(regexp_extract_all(p, '${phoneRe}')) > 0
       |   OR len(list_filter(ip_cands, c -> ${ipOk(1)} AND ${ipOk(2)} AND ${ipOk(3)} AND ${ipOk(4)})) > 0
       |   OR len(list_filter(card_cands, c -> ${sqlLuhnSum("c", 16)} % 10 = 0)) > 0) AS has_pii
       |FROM pd""".stripMargin
  }
}
