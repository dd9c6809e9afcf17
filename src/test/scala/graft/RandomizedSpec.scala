package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Relational}

/** Fixed-seed randomized equivalence tests: the window-trick operators
  * (as-of, sessionize, funnel, rolling features, packing) checked
  * against independent BRUTE-FORCE driver-side reimplementations on
  * adversarial random inputs — many users, heavy timestamp collisions,
  * empty/singleton groups. Hand-built cases pin the documented
  * semantics; these catch the interactions nobody thought to
  * hand-build. Seeds are fixed, so failures reproduce.
  */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Long, n: Int, users: Int, tsRange: Int) = {
    val rnd = new Random(seed)
    val types = Seq("signup", "click", "purchase", "view")
    (0 until n).map { i =>
      (i.toLong, rnd.nextInt(users).toLong, rnd.nextInt(tsRange).toLong * 1000L,
        types(rnd.nextInt(types.length)), (rnd.nextInt(10000) + 1) / 100.0)
    }
  }

  test("asof attribution equals a brute quadratic scan on collision-heavy random events") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val rows = randomEvents(seed, 400, 7, 50) // dense ts collisions
      val df = rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val got = AsOf.attribution(df).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      // brute: for each purchase, the latest click at-or-before it;
      // ties on ts broken by max event_id (the window orders by
      // (ts, is_probe, event_id) and takes the running last)
      val clicks = rows.filter(_._4 == "click")
      val expected = rows.filter(_._4 == "purchase").flatMap { p =>
        val cands = clicks.filter(c => c._2 == p._2 && c._3 <= p._3)
        if (cands.isEmpty) None
        else {
          val best = cands.maxBy(c => (c._3, c._1))
          Some((p._1, best._1, p._3 - best._3))
        }
      }.toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("sessionize equals a naive per-user pass on random events") {
    for (seed <- Seq(4L, 5L)) {
      val rows = randomEvents(seed, 300, 5, 100000) // sparse -> real gaps
      val df = rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val got = Relational.sessionize(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val gapMs = 30 * 60 * 1000L
      val expected = rows.groupBy(_._2).flatMap { case (uid, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._1))
        var seq = 0L; var last = Long.MinValue
        val assigned = sorted.map { e =>
          if (last == Long.MinValue || e._3 - last > gapMs) seq += 1
          last = e._3
          (uid, seq)
        }
        assigned.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      }
      assert(got === expected, s"seed $seed")
    }
  }

  test("funnel equals a naive chained min-after-min pass on random events") {
    val stages = Seq("signup", "click", "purchase")
    for (seed <- Seq(6L, 7L, 8L)) {
      val rows = randomEvents(seed, 300, 9, 40)
      val df = rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val got = Relational.funnel(df, stages).collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      val byUser = rows.groupBy(_._2)
      // naive: t0 = min signup; t_i = min ts of stage i STRICTLY after t_{i-1}
      val reached: Seq[Long] = stages.indices.map { i =>
        byUser.count { case (_, evs) =>
          stages.take(i + 1).foldLeft(Option(Long.MinValue)) { (prev, s) =>
            prev.flatMap { p =>
              val cand = evs.filter(e => e._4 == s && (p == Long.MinValue || e._3 > p))
                .map(_._3)
              if (cand.isEmpty) None else Some(cand.min)
            }
          }.isDefined
        }.toLong
      }
      assert(got === stages.zip(reached).toMap, s"seed $seed")
    }
  }

  test("rollingUserStats equals a naive trailing-window scan on random events") {
    for (seed <- Seq(9L, 10L)) {
      val rows = randomEvents(seed, 300, 4, 1400000) // spread over ~16 days
      val df = rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val got = Relational.rollingUserStats(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      val span = 7L * 86400000L
      val expected = rows.map { e =>
        val win = rows.filter(o => o._2 == e._2 && o._3 <= e._3 && o._3 >= e._3 - span)
        val cents = win.map(o => math.floor(o._5 * 100.0 + 0.5).toLong).sum
        e._1 -> (win.size.toLong, cents.toDouble / 100.0)
      }.toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("cohortRetention equals a naive per-user first-week scan on random events") {
    for (seed <- Seq(13L, 14L)) {
      val rnd = new Random(seed)
      // events across ~10 ISO weeks; ts in ms from a Monday epoch anchor
      val anchor = 1704067200000L // 2024-01-01 (a Monday)
      val rows = (0 until 300).map { i =>
        (i.toLong, rnd.nextInt(20).toLong, anchor + rnd.nextInt(70).toLong * 86400000L)
      }
      val df = rows.toDF("event_id", "user_id", "ts_ms")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withColumn("event_type", lit("view")).withColumn("value", lit(1.0))
      val got = Relational.cohortRetention(df).collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      // naive: week = Monday-truncated day; cohort = user's min week
      def week(ms: Long): Long = (ms - anchor) / (7L * 86400000L)
      val firstWeek = rows.groupBy(_._2).map { case (u, es) => u -> es.map(e => week(e._3)).min }
      val expected = rows.map(e => (e._2, week(e._3))).distinct
        .groupBy { case (u, w) => (firstWeek(u), (w - firstWeek(u)).toInt) }
        .map { case ((cw, off), us) =>
          val cohortDate = java.time.Instant.ofEpochMilli(anchor + cw * 7L * 86400000L)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
          (cohortDate, off) -> us.map(_._1).distinct.size.toLong
        }
      assert(got === expected, s"seed $seed")
    }
  }

  test("topNPerGroup (two-phase rank) equals a naive per-brand sort on random lineitems") {
    for (seed <- Seq(15L, 16L)) {
      val rnd = new Random(seed)
      val lines = (0 until 500).map { _ =>
        val pk = rnd.nextInt(60).toLong
        (pk, (rnd.nextInt(100000) + 1) / 100.0)
      }
      val parts = (0L until 60L).map(pk => (pk, s"Brand#${pk % 5}"))
      val lineDf = lines.toDF("l_partkey", "l_extendedprice")
      val partDf = parts.toDF("p_partkey", "p_brand")
      val got = graft.ops.Relational.topNPerGroup(lineDf, partDf, n = 3)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      val perPart = lines.groupBy(_._1).map { case (pk, ls) =>
        pk -> ls.map(l => math.floor(l._2 * 100.0 + 0.5).toLong).sum
      }
      val expected = parts.groupBy(_._2).flatMap { case (brand, ps) =>
        ps.flatMap(p => perPart.get(p._1).map(c => (p._1, c)))
          .toSeq.sortBy { case (pk, c) => (-c, pk) }
          .take(3).zipWithIndex
          .map { case ((pk, _), i) => (brand, i + 1, pk) }
      }.toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("ngramVocab equals a naive count-and-sort on random docs") {
    for (seed <- Seq(17L, 18L)) {
      val rnd = new Random(seed)
      val langs = Seq("en", "de")
      val docs = (0 until 150).map { i =>
        val words = Seq.fill(rnd.nextInt(20) + 1)("w" + rnd.nextInt(6)).mkString(" ")
        (i.toLong, words, langs(rnd.nextInt(2)))
      }
      val df = docs.toDF("doc_id", "text", "lang")
      val got = graft.text.Corpus.ngramVocab(df, k = 4, buckets = 8)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      val expected = docs
        .flatMap { case (_, text, lang) =>
          val t = text.split("\\s+").filter(_.nonEmpty)
          t.sliding(2).filter(_.length == 2).map(b => (lang, b.mkString(" ")))
        }
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
        .groupBy(_._1._1).flatMap { case (lang, grams) =>
          grams.toSeq.map { case ((_, g), c) => (g, c) }
            .sortBy { case (g, c) => (-c, g) }
            .take(4).zipWithIndex
            .map { case ((g, c), i) => (lang, (i + 1).toLong, g, c) }
        }.toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("packSequences equals a naive global cumsum on random docs") {
    for (seed <- Seq(11L, 12L)) {
      val rnd = new Random(seed)
      val docs = (0 until 200).map { i =>
        // variable token counts incl. empty docs; sparse non-contiguous ids
        val words = Seq.fill(rnd.nextInt(30))("w" + rnd.nextInt(9)).mkString(" ")
        (i.toLong * (1 + rnd.nextInt(3)), words)
      }.distinct.toMap.toSeq // dedupe ids
      val df = docs.toDF("doc_id", "text")
      val got = graft.text.Corpus.packSequences(df, seqLen = 64, blockSize = 16)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      var off = 0L
      val expected = docs.sortBy(_._1).map { case (id, text) =>
        val n = text.split("\\s+").count(_.nonEmpty).toLong
        val r = id -> (n, off / 64, off % 64)
        off += n
        r
      }.toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("latestSnapshot equals a brute per-user max on collision-heavy random logs") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val rows = randomEvents(seed, 400, 7, 40) // many equal-ts ties
      val df = rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val got = graft.ops.Temporal.latestSnapshot(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(5))))
        .toMap
      val expected = rows.groupBy(_._2).map { case (uid, evs) =>
        val w = evs.maxBy(e => (e._3, e._1))
        uid -> ((w._3, w._1, w._4, evs.size.toLong))
      }
      assert(got === expected, s"seed $seed")
    }
  }

  test("intervalJoin equals a brute pair scan on collision-heavy random logs") {
    for (seed <- Seq(14L, 15L)) {
      // ts in [0, 120min) seconds-granularity => pairs straddle bands
      val rows = randomEvents(seed, 500, 5, 7200)
      val df = rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val got = graft.ops.Temporal.intervalJoin(df).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val w = 30 * 60000L
      val clicks = rows.filter(_._4 == "click")
      val expected = rows.filter(_._4 == "purchase").flatMap { p =>
        clicks.filter(c => c._2 == p._2 && c._3 >= p._3 - w && c._3 < p._3)
          .map(c => (p._1, c._1, p._3 - c._3))
      }.toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("snapshotDiff equals a brute two-cutoff compare on random logs") {
    for (seed <- Seq(16L, 17L)) {
      val rows = randomEvents(seed, 400, 9, 40)
      val df = rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val (t1, t2) = (15000L, 30000L)
      val got = graft.ops.Temporal.snapshotDiff(df, t1, t2).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      def winner(evs: Seq[(Long, Long, Long, String, Double)], t: Long) =
        evs.filter(_._3 <= t) match {
          case Seq() => None
          case c     => Some(c.maxBy(e => (e._3, e._1))._1)
        }
      val expected = rows.groupBy(_._2).flatMap { case (uid, evs) =>
        (winner(evs.toSeq, t1), winner(evs.toSeq, t2)) match {
          case (_, None)          => None
          case (None, Some(b))    => Some(uid -> (("added", -1L, b)))
          case (Some(a), Some(b)) =>
            Some(uid -> ((if (a == b) "unchanged" else "changed", a, b)))
        }
      }
      assert(got === expected, s"seed $seed")
    }
  }

  test("priceQuantiles equals a driver-side sort on ties-heavy random prices") {
    for (seed <- Seq(21L, 22L)) {
      val rnd = new Random(seed)
      // heavy ties: only 40 distinct price points over 5000 rows, so
      // rank boundaries routinely land inside runs of equal values
      val prices = (0 until 5000).map(_ => (rnd.nextInt(40) + 1) * 7.25)
      val df = prices.map(Tuple1(_)).toDF("l_extendedprice")
      val got = graft.ops.Relational.priceQuantiles(df, bucketCents = 5000L).head()
      val cents = prices.map(p => math.floor(p * 100.0 + 0.5).toLong).sorted
      def ref(p: Double) = cents(math.ceil(p * cents.length).toInt - 1) / 100.0
      assert(got.getLong(0) === 5000L, s"seed $seed")
      assert((got.getDouble(1), got.getDouble(2), got.getDouble(3), got.getDouble(4)) ===
        ((ref(0.5), ref(0.9), ref(0.99), ref(0.999))), s"seed $seed")
    }
  }

  test("scd2 intervals equal a brute sorted walk on random logs") {
    for (seed <- Seq(18L, 19L)) {
      val rows = randomEvents(seed, 300, 6, 60)
      val df = rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val got = graft.ops.Temporal.scd2(df).collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
      val expected = rows.groupBy(_._2).flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._1))
        val nexts = sorted.drop(1).map(n => Some(n._3)) :+ None
        sorted.zip(nexts).map { case (e, to) =>
          e._1 -> ((e._3, to.getOrElse(-1L), to.isEmpty))
        }
      }
      assert(got === expected, s"seed $seed")
    }
  }
}
