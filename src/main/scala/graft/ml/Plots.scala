package graft.ml

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** JDK-only (java.awt + ImageIO) PNG renderings of the two training
  * artifacts the reference ships as matplotlib figures:
  * `threshold_curve.png` (reference plot_threshold.py:63-86 — P/R/F1
  * vs threshold with a dashed best-threshold marker) and
  * `feature_importance.png` (reference plot_feature_importance.py:17-63
  * — signed horizontal coefficient bars, red = churn risk up, blue =
  * retention signal). Pure driver-side rendering of tiny result
  * tables (101 sweep rows / ~10 coefficients) — the cluster never
  * sees a pixel, and the library gains no plotting dependency.
  */
object Plots {

  private val seriesColors = Map(
    "f1" -> new Color(0x2c, 0xa0, 0x2c),
    "precision" -> new Color(0x1f, 0x77, 0xb4),
    "recall" -> new Color(0xff, 0x7f, 0x0e))
  private val posBar = new Color(0xd6, 0x27, 0x28) // churn risk up
  private val negBar = new Color(0x1f, 0x77, 0xb4) // retention signal

  private def canvas(w: Int, h: Int): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
    g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, w, h)
    (img, g)
  }

  private def save(img: BufferedImage, path: String): Unit = {
    val f = new File(path)
    if (f.getParentFile != null) f.getParentFile.mkdirs()
    ImageIO.write(img, "png", f)
  }

  /** P/R/F1 vs threshold. `rows` = (threshold, precision, recall, f1),
    * any order (sorted internally); both axes span [0, 1].
    */
  def thresholdCurve(
      rows: Seq[(Double, Double, Double, Double)],
      bestThr: Option[Double],
      path: String,
      title: String = "Threshold Optimization Curve (val)"): Unit = {
    require(rows.nonEmpty, "thresholdCurve: empty sweep")
    val sorted = rows.sortBy(_._1)
    val (w, h) = (1050, 750)
    val (left, right, top, bottom) = (90, 40, 60, 70)
    val (img, g) = canvas(w, h)
    val plotW = w - left - right
    val plotH = h - top - bottom
    def px(t: Double) = left + (t * plotW).toInt
    def py(v: Double) = top + ((1.0 - v) * plotH).toInt

    // grid + ticks at 0.0, 0.2, ..., 1.0 on both axes
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 16))
    (0 to 5).foreach { i =>
      val v = i / 5.0
      g.setColor(new Color(0xe6, 0xe6, 0xe6))
      g.drawLine(px(v), top, px(v), top + plotH)
      g.drawLine(left, py(v), left + plotW, py(v))
      g.setColor(Color.DARK_GRAY)
      val label = f"$v%.1f"
      g.drawString(label, px(v) - g.getFontMetrics.stringWidth(label) / 2, top + plotH + 25)
      g.drawString(label, left - g.getFontMetrics.stringWidth(label) - 8, py(v) + 6)
    }
    g.setColor(Color.BLACK)
    g.drawRect(left, top, plotW, plotH)

    // series
    def polyline(select: ((Double, Double, Double, Double)) => Double, color: Color): Unit = {
      g.setColor(color)
      g.setStroke(new BasicStroke(2.5f))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          g.drawLine(px(a._1), py(select(a).max(0).min(1)), px(b._1), py(select(b).max(0).min(1)))
        case _ => ()
      }
    }
    polyline(_._4, seriesColors("f1"))
    polyline(_._2, seriesColors("precision"))
    polyline(_._3, seriesColors("recall"))

    // best-threshold marker (dashed vline, like the reference axvline)
    bestThr.foreach { t =>
      g.setColor(Color.GRAY)
      g.setStroke(new BasicStroke(2f, BasicStroke.CAP_BUTT, BasicStroke.JOIN_MITER,
        10f, Array(8f, 8f), 0f))
      g.drawLine(px(t), top, px(t), top + plotH)
    }

    // titles + legend
    g.setStroke(new BasicStroke(1f))
    g.setColor(Color.BLACK)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 22))
    g.drawString(title, left, 38)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 18))
    g.drawString("Threshold", left + plotW / 2 - 40, h - 20)
    val entries = Seq("F1" -> seriesColors("f1"), "Precision" -> seriesColors("precision"),
      "Recall" -> seriesColors("recall")) ++
      bestThr.map(t => f"Best thr = $t%.2f" -> Color.GRAY)
    val legendW = 200
    val legendX = left + plotW - legendW - 10
    var legendY = top + 15
    g.setColor(new Color(255, 255, 255, 230))
    g.fillRect(legendX - 10, legendY - 12, legendW, entries.size * 26 + 10)
    g.setColor(Color.LIGHT_GRAY)
    g.drawRect(legendX - 10, legendY - 12, legendW, entries.size * 26 + 10)
    entries.foreach { case (name, color) =>
      g.setColor(color)
      g.fillRect(legendX, legendY - 5, 24, 5)
      g.setColor(Color.BLACK)
      g.drawString(name, legendX + 32, legendY + 4)
      legendY += 26
    }
    g.dispose()
    save(img, path)
  }

  /** Signed horizontal coefficient bars sorted by |coef| descending —
    * red positive (churn risk), blue negative (retention), gray zero
    * line, value labels beside each bar.
    */
  def featureImportance(rows: Seq[(String, Double)], path: String,
      title: String = "Feature Importance (signed LR coefficients)"): Unit = {
    require(rows.nonEmpty, "featureImportance: empty coefficient table")
    val sorted = rows.sortBy { case (f, c) => (-math.abs(c), f) }
    val barH = 34
    val gap = 14
    val (left, right, top, bottom) = (260, 120, 70, 40)
    val plotH = sorted.size * (barH + gap)
    val (w, h) = (1100, top + plotH + bottom)
    val (img, g) = canvas(w, h)
    val plotW = w - left - right
    val maxAbs = math.max(sorted.map { case (_, c) => math.abs(c) }.max, 1e-12)
    val x0 = left + plotW / 2
    def px(c: Double) = x0 + (c / maxAbs * (plotW / 2 - 10)).toInt

    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 22))
    g.setColor(Color.BLACK)
    g.drawString(title, 30, 40)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 16))

    sorted.zipWithIndex.foreach { case ((feature, c), i) =>
      val y = top + i * (barH + gap)
      g.setColor(if (c > 0) posBar else negBar)
      val (bx, bw) = if (c >= 0) (x0, px(c) - x0) else (px(c), x0 - px(c))
      g.fillRect(bx, y, math.max(bw, 1), barH)
      g.setColor(Color.DARK_GRAY)
      val name = feature
      g.drawString(name, left - g.getFontMetrics.stringWidth(name) - 12, y + barH / 2 + 6)
      val vLabel = f"$c%+.4f"
      val vx = if (c >= 0) px(c) + 8 else px(c) - g.getFontMetrics.stringWidth(vLabel) - 8
      g.drawString(vLabel, vx, y + barH / 2 + 6)
    }
    // zero line over the bars
    g.setColor(Color.GRAY)
    g.drawLine(x0, top - 10, x0, top + plotH + 5)
    g.dispose()
    save(img, path)
  }
}
