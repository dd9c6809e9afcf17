package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** q189: URL canonicalization + keep-first URL dedup — the FIRST
  * screen of every real crawl pipeline (cheaper than any content
  * screen: a re-crawled page is dropped on its address before its
  * bytes are touched). The reference corpus carries no url column, so
  * the screen measures PLANTED urls derived from doc_id arithmetic
  * (the Pii / q_dedup_normalized planting discipline: variants are
  * content-preserving under canonicalization exactly when the plant
  * says so, and the DuckDB twin replays the planting + every
  * canonicalization rule ⇒ hash-exact gate).
  *
  * Canonicalization rules (each pinned in isolation in UrlDedupSpec —
  * the standard crawl-frontier set):
  *   1. scheme + host LOWERCASED (case-insensitive by RFC 3986; the
  *      PATH keeps its case — paths are case-sensitive),
  *   2. fragment stripped (`#...` never reaches the server),
  *   3. trailing slashes stripped from the path,
  *   4. `utm_*` tracking params dropped,
  *   5. remaining query params SORTED (param order is almost always
  *      semantically irrelevant; sorting makes the form canonical).
  *
  * Scale shape: canonicalization is pure scan-side codegen string work
  * (regex + split/filter/sort HOFs, no UDF); the verdict is ONE
  * groupBy(canonical_url) with map-side partial aggregation (min +
  * count — the q_dedup_exact shape) and a slim join back. At 100 TB
  * this is a single keyed shuffle of (hash, 16 bytes) — the cheapest
  * screen in the family, which is why crawls run it first.
  */
object UrlDedup {

  /** The canonical form of a raw url — rules 1-5 above as one pure
    * Column expression (composable over any real url column; the
    * planted query applies it to [[plantedUrl]]).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // scheme://host (everything before the first /, ? or # past the
    // scheme) — the case-insensitive part
    val prefix = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = noFrag.substr(length(prefix) + 1, lit(1 << 24))
    val qPos = instr(rest, "?")
    val path = when(qPos > 0, rest.substr(lit(1), qPos - 1)).otherwise(rest)
    val query = when(qPos > 0, rest.substr(qPos + 1, lit(1 << 24))).otherwise(lit(""))
    val cPath = regexp_replace(path, "/+$", "")
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val qs = array_join(array_sort(params), "&")
    concat(lower(prefix), cPath,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** The planted raw url for a doc_id. Variant class v = doc_id % 5,
    * canonical identity cid = doc_id − v for v < 3 (so consecutive
    * docs {cid, cid+1, cid+2} present THREE raw spellings of one
    * canonical url) and cid = doc_id for v ∈ {3, 4} (unique pages):
    *   v=0 → the canonical presentation,
    *   v=1 → scheme+host UPPERCASED, query params reversed,
    *   v=2 → trailing slash + a utm_source param + a fragment,
    *   v=3 → a unique https blog url (scheme/host diversity),
    *   v=4 → a unique query-less article url (cannot collide with the
    *         v<3 groups: their cids are ≡ 0 (mod 5), this doc_id ≡ 4).
    */
  private[graft] def plantedUrl(docId: Column): Column = {
    val v = pmod(docId, lit(5L))
    val cid = when(v < 3, docId - v).otherwise(docId).cast("string")
    val did = docId.cast("string")
    val h = pmod(when(v < 3, docId - v).otherwise(docId), lit(20L)).cast("string")
    val host = concat(lit("www.site"), h, lit(".com"))
    when(v === 0,
      concat(lit("http://"), host, lit("/articles/item"), cid, lit("?a=1&b=2")))
      .when(v === 1,
        concat(lit("HTTP://"), upper(host), lit("/articles/item"), cid, lit("?b=2&a=1")))
      .when(v === 2,
        concat(lit("http://"), host, lit("/articles/item"), cid,
          lit("/?utm_source=feed&a=1&b=2#section-2")))
      .when(v === 3,
        concat(lit("https://blog.site"), h, lit(".com/posts/p"), did, lit("?id="), did))
      .otherwise(concat(lit("http://"), host, lit("/articles/item"), did))
  }

  /** The keep-first screen over ANY (id, url) frame: one row per input
    * row with the canonical form, the canonical group's copy count,
    * and keep = 1 iff this row carries the group's minimum id (the
    * first-crawled convention — the q_dedup_exact keep rule applied to
    * addresses instead of content hashes).
    */
  def urlScreen(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val c = df.select(col(idCol), col(urlCol),
      canonicalizeUrl(col(urlCol)).as("canonical_url"))
    val groups = c.groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
    c.join(groups, Seq("canonical_url"))
      .select(col(idCol), col(urlCol), col("canonical_url"), col("n_copies"),
        when(col(idCol) === col("keep_id"), lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  /** q189 query entry: the screen over the planted urls. */
  def urlDedup(documents: DataFrame): DataFrame =
    urlScreen(
      graft.Spread(documents)
        .select(col("doc_id"), plantedUrl(col("doc_id")).as("url")),
      "doc_id", "url")

  /** DuckDB twin: the planting and every canonicalization rule
    * replayed in SQL over the same documents table.
    */
  def sqlUrlDedup: String = {
    // the planted url (v/cid/h arithmetic mirrored exactly)
    val planted =
      """CASE doc_id % 5
        |    WHEN 0 THEN 'http://www.site' || (doc_id % 20) || '.com/articles/item' || doc_id || '?a=1&b=2'
        |    WHEN 1 THEN 'HTTP://WWW.SITE' || ((doc_id - 1) % 20) || '.COM/articles/item' || (doc_id - 1) || '?b=2&a=1'
        |    WHEN 2 THEN 'http://www.site' || ((doc_id - 2) % 20) || '.com/articles/item' || (doc_id - 2) || '/?utm_source=feed&a=1&b=2#section-2'
        |    WHEN 3 THEN 'https://blog.site' || (doc_id % 20) || '.com/posts/p' || doc_id || '?id=' || doc_id
        |    ELSE 'http://www.site' || (doc_id % 20) || '.com/articles/item' || doc_id
        |  END""".stripMargin
    s"""WITH u0 AS (
       |  SELECT doc_id, $planted AS url FROM documents
       |), u1 AS (
       |  SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS nf FROM u0
       |), u2 AS (
       |  SELECT doc_id, url, nf,
       |    regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*') AS pre,
       |    substr(nf, length(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) + 1) AS rest
       |  FROM u1
       |), u3 AS (
       |  SELECT doc_id, url, pre,
       |    CASE WHEN instr(rest, '?') > 0 THEN substr(rest, 1, instr(rest, '?') - 1) ELSE rest END AS path,
       |    CASE WHEN instr(rest, '?') > 0 THEN substr(rest, instr(rest, '?') + 1) ELSE '' END AS query
       |  FROM u2
       |), u4 AS (
       |  SELECT doc_id, url,
       |    lower(pre) || regexp_replace(path, '/+$$', '') ||
       |      CASE WHEN coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
       |             p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&'), '') <> ''
       |           THEN '?' || array_to_string(list_sort(list_filter(string_split(query, '&'),
       |             p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&')
       |           ELSE '' END AS canonical_url
       |  FROM u3
       |), g AS (
       |  SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_copies, min(doc_id) AS keep_id
       |  FROM u4 GROUP BY 1
       |)
       |SELECT u4.doc_id, u4.url, u4.canonical_url, g.n_copies,
       |  CAST(CASE WHEN u4.doc_id = g.keep_id THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM u4 JOIN g USING (canonical_url)""".stripMargin
  }
}
