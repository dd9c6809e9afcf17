package graft

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val audit = ZOrder.zorderAudit(Tables.events(spark, sf)).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7), r.getLong(8)))

  private def mortonRef(u: Int, t: Int): Int =
    (0 until 8).map(k => (((u >> k) & 1) << (2 * k + 1)) | (((t >> k) & 1) << (2 * k))).sum

  test("zorder audit: both layouts cover every row exactly once") {
    val total = Tables.events(spark, sf).count()
    audit.groupBy(_._1).foreach { case (layout, rows) =>
      assert(rows.map(_._3).sum === total, s"$layout row coverage")
    }
  }

  test("zorder buckets are aligned 32x32 Morton tiles: both spans bounded by 32") {
    val z = audit.filter(_._1 == "zorder")
    z.foreach { r =>
      assert(r._8 <= 32L, s"zorder bucket ${r._2} u_span ${r._8}")
      assert(r._9 <= 32L, s"zorder bucket ${r._2} t_span ${r._9}")
      // the tile is ALIGNED: min is inside the tile's 32-aligned cell
      assert(r._4 / 32 === r._5 / 32, s"bucket ${r._2} u straddles tiles")
      assert(r._6 / 32 === r._7 / 32, s"bucket ${r._2} t straddles tiles")
    }
  }

  test("linear layout pays for its primary dim with an unbounded secondary span") {
    val lin = audit.filter(_._1 == "linear")
    lin.foreach(r => assert(r._8 <= 4L, s"linear bucket ${r._2} primary span"))
    // the uniform events table fills time in every user slice
    assert(lin.map(_._9).max >= 128L, "secondary span should be near-global under linear")
  }

  test("a 2-D range predicate touches fewer zorder buckets than linear buckets") {
    // probe several 32x32 query windows; envelope intersection = the
    // min-max skipping a reader would do from footer stats
    val windows = Seq((0, 0), (64, 64), (128, 192), (224, 32))
    windows.foreach { case (qu, qt) =>
      def touched(layout: String): Int = audit.count { r =>
        r._1 == layout &&
          r._4 <= qu + 31 && r._5 >= qu && r._6 <= qt + 31 && r._7 >= qt
      }
      assert(touched("zorder") <= touched("linear"),
        s"window ($qu,$qt): zorder ${touched("zorder")} vs linear ${touched("linear")}")
    }
    // and strictly better in aggregate
    val zSum = windows.map { case (qu, qt) => audit.count(r => r._1 == "zorder" &&
      r._4 <= qu + 31 && r._5 >= qu && r._6 <= qt + 31 && r._7 >= qt) }.sum
    val lSum = windows.map { case (qu, qt) => audit.count(r => r._1 == "linear" &&
      r._4 <= qu + 31 && r._5 >= qu && r._6 <= qt + 31 && r._7 >= qt) }.sum
    assert(zSum < lSum, s"aggregate pruning: zorder $zSum vs linear $lSum")
  }

  test("Spark morton column matches the driver reference bit-by-bit; bits round-trip") {
    val plants = Seq((170L, 85L), (0L, 255L), (255L, 0L), (37L, 200L), (255L, 255L))
    val got = plants.toDF("u8", "t8")
      .select(col("u8"), col("t8"), ZOrder.morton(col("u8"), col("t8")).as("z"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt))
    got.foreach { case (u, t, z) =>
      assert(z === mortonRef(u, t), s"morton($u, $t)")
      assert(z >= 0 && z <= 65535)
      // odd bits recover u, even bits recover t
      val ur = (0 until 8).map(k => ((z >> (2 * k + 1)) & 1) << k).sum
      val tr = (0 until 8).map(k => ((z >> (2 * k)) & 1) << k).sum
      assert(ur === u && tr === t)
    }
  }
}
