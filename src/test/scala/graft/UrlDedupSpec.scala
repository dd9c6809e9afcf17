package graft

import org.apache.spark.sql.functions._

import graft.dedup.UrlDedup

class UrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlDedup.canonicalizeUrl(col("u"))).head().getString(0)

  test("canonicalization rules, each in isolation") {
    // 1. scheme + host lowercased; PATH case preserved
    assert(canon("HTTP://WWW.X.COM/Article/One") === "http://www.x.com/Article/One")
    // 2. fragment stripped
    assert(canon("http://x.com/a#section-2") === "http://x.com/a")
    // 3. trailing slashes stripped from the path
    assert(canon("http://x.com/a/") === "http://x.com/a")
    assert(canon("http://x.com/a///") === "http://x.com/a")
    // 4. utm_* params dropped
    assert(canon("http://x.com/a?utm_source=feed&id=7") === "http://x.com/a?id=7")
    // 5. remaining params sorted
    assert(canon("http://x.com/a?b=2&a=1") === "http://x.com/a?a=1&b=2")
    // a query emptied by the utm strip loses its '?'
    assert(canon("http://x.com/a?utm_source=feed&utm_medium=rss") === "http://x.com/a")
    // rules compose (the v=2 planting shape)
    assert(canon("http://x.com/a/?utm_source=f&b=2&a=1#frag") === "http://x.com/a?a=1&b=2")
    // identity on an already-canonical url
    assert(canon("http://x.com/a?a=1&b=2") === "http://x.com/a?a=1&b=2")
    // rules that must NOT fire: non-utm params kept, query-less url
    // untouched, https scheme preserved
    assert(canon("https://x.com/a?autumn=1") === "https://x.com/a?autumn=1")
    assert(canon("https://x.com/a") === "https://x.com/a")
  }

  test("planted groups: three raw spellings collapse to one canonical url; uniques stay unique") {
    val docsDf = Tables.documents(spark, sf)
    val out = UrlDedup.urlDedup(docsDf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.length === docsDf.count())
    val byDoc = out.map(r => r._1 -> r).toMap
    // every v<3 triple shares one canonical url and keeps exactly the
    // v=0 member (the group minimum)
    val maxId = out.map(_._1).max
    for (cid <- 0L to (maxId - 2) by 5L) {
      val group = Seq(cid, cid + 1, cid + 2).flatMap(byDoc.get)
      if (group.length == 3) {
        assert(group.map(_._3).distinct.length === 1,
          s"group at cid=$cid must share one canonical url: ${group.map(_._3)}")
        assert(group.map(_._2).distinct.length === 3,
          s"group at cid=$cid must present three distinct raw spellings")
        assert(group.forall(_._4 === 3L))
        assert(group.map(g => g._1 -> g._5).toMap === Map(
          cid -> 1L, (cid + 1) -> 0L, (cid + 2) -> 0L),
          s"keep-first must keep exactly the minimum doc_id at cid=$cid")
      }
    }
    // v in {3, 4} docs are singletons and keep
    out.filter(r => r._1 % 5 >= 3).foreach { r =>
      assert(r._4 === 1L && r._5 === 1L, s"doc ${r._1} must be a kept singleton")
    }
    // global invariant: exactly one keeper per canonical group
    out.groupBy(_._3).foreach { case (cu, rows) =>
      assert(rows.count(_._5 == 1L) === 1, s"one keeper per group: $cu")
      assert(rows.forall(_._4 === rows.length.toLong))
    }
  }

  test("urlScreen over an arbitrary (id, url) frame — the library entry") {
    val df = Seq(
      (10L, "http://a.com/x?b=2&a=1"),
      (11L, "HTTP://A.COM/x/?a=1&b=2#f"),
      (12L, "http://a.com/y")).toDF("id", "u")
    val got = UrlDedup.urlScreen(df, "id", "u").collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(10L) === (("http://a.com/x?a=1&b=2", 2L, 1L)))
    assert(got(11L) === (("http://a.com/x?a=1&b=2", 2L, 0L)))
    assert(got(12L) === (("http://a.com/y", 1L, 1L)))
  }
}
