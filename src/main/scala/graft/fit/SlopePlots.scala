package graft.fit

import java.util.Locale

import org.apache.spark.sql.DataFrame

/** Minimal SVG rendering over the three pinned plot DataFrames — the
  * `plot(fit)` one-liners a reference user loses otherwise (plot.Owl,
  * R/plot.R:19-109; plot.TrainedOwl, R/plot.R:144-299; plotDiagnostics,
  * R/plotDiagnostics.R:22-73). Deliberately dependency-free and
  * DETERMINISTIC: series sort by label, numbers format under Locale.ROOT,
  * layout constants are fixed — the same data always renders the same
  * bytes (golden-file pinned in SlopePlotsSpec).
  *
  * The inputs are driver-sized by construction (path steps × features,
  * CV grid cells, solver iterations — the same driver-held state the
  * solver itself keeps), so the `collect()` here is bounded and the
  * rendering cost is nil next to any fit.
  */
object SlopePlots {

  final case class Series(label: String, points: Seq[(Double, Double)])

  /** (x, lo, hi) confidence band per series, drawn behind its line. */
  final case class Band(label: String, points: Seq[(Double, Double, Double)])

  private val W = 640
  private val H = 400
  private val ML = 70; private val MR = 20; private val MT = 40; private val MB = 50
  private val palette = Vector("#1f77b4", "#d62728", "#2ca02c", "#9467bd",
    "#ff7f0e", "#8c564b", "#17becf", "#7f7f7f")

  private def fmt(v: Double): String = String.format(Locale.ROOT, "%.6g", Double.box(v))

  private def fmtTick(v: Double): String = String.format(Locale.ROOT, "%.3g", Double.box(v))

  /** Shared cartesian frame: linear scales from the data envelope, 4 ticks
    * per axis, one polyline per series (+ optional translucent CI bands).
    */
  def render(title: String, xLabel: String, yLabel: String,
             series: Seq[Series], bands: Seq[Band] = Nil): String = {
    val sorted = series.sortBy(_.label)
    val bandsSorted = bands.sortBy(_.label)
    val xs = sorted.flatMap(_.points.map(_._1)) ++ bandsSorted.flatMap(_.points.map(_._1))
    val ys = sorted.flatMap(_.points.map(_._2)) ++
      bandsSorted.flatMap(b => b.points.flatMap(p => Seq(p._2, p._3)))
    require(xs.nonEmpty && ys.nonEmpty, s"nothing to plot for '$title'")
    val (x0, x1) = (xs.min, xs.max)
    val (y0raw, y1raw) = (ys.min, ys.max)
    // a flat series still needs a finite y span
    val (y0, y1) = if (y0raw == y1raw) (y0raw - 1.0, y1raw + 1.0) else (y0raw, y1raw)
    val xSpan = if (x1 == x0) 1.0 else x1 - x0
    def sx(x: Double): Double = ML + (x - x0) / xSpan * (W - ML - MR)
    def sy(y: Double): Double = H - MB - (y - y0) / (y1 - y0) * (H - MT - MB)

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">\n"""
    sb ++= s"""<rect width="$W" height="$H" fill="white"/>\n"""
    sb ++= s"""<text x="${W / 2}" y="22" text-anchor="middle" font-family="sans-serif" font-size="15">$title</text>\n"""
    // frame + ticks
    sb ++= s"""<rect x="$ML" y="$MT" width="${W - ML - MR}" height="${H - MT - MB}" fill="none" stroke="#333" stroke-width="1"/>\n"""
    for (i <- 0 to 3) {
      val fx = x0 + i * (x1 - x0) / 3
      val fy = y0 + i * (y1 - y0) / 3
      val px = fmt(sx(fx)); val py = fmt(sy(fy))
      sb ++= s"""<line x1="$px" y1="${H - MB}" x2="$px" y2="${H - MB + 5}" stroke="#333"/>\n"""
      sb ++= s"""<text x="$px" y="${H - MB + 18}" text-anchor="middle" font-family="sans-serif" font-size="11">${fmtTick(fx)}</text>\n"""
      sb ++= s"""<line x1="${ML - 5}" y1="$py" x2="$ML" y2="$py" stroke="#333"/>\n"""
      sb ++= s"""<text x="${ML - 8}" y="$py" text-anchor="end" dominant-baseline="middle" font-family="sans-serif" font-size="11">${fmtTick(fy)}</text>\n"""
    }
    sb ++= s"""<text x="${W / 2}" y="${H - 12}" text-anchor="middle" font-family="sans-serif" font-size="12">$xLabel</text>\n"""
    sb ++= s"""<text x="16" y="${H / 2}" text-anchor="middle" font-family="sans-serif" font-size="12" transform="rotate(-90 16 ${H / 2})">$yLabel</text>\n"""
    // CI bands first (behind the lines), matched to their series color
    bandsSorted.foreach { b =>
      val ci = sorted.indexWhere(_.label == b.label)
      val color = palette(math.max(ci, 0) % palette.size)
      val pts = b.points.sortBy(_._1)
      val up = pts.map(p => s"${fmt(sx(p._1))},${fmt(sy(p._3))}")
      val dn = pts.reverse.map(p => s"${fmt(sx(p._1))},${fmt(sy(p._2))}")
      sb ++= s"""<polygon points="${(up ++ dn).mkString(" ")}" fill="$color" fill-opacity="0.15" stroke="none"/>\n"""
    }
    sorted.zipWithIndex.foreach { case (s, i) =>
      val color = palette(i % palette.size)
      val pts = s.points.sortBy(_._1).map(p => s"${fmt(sx(p._1))},${fmt(sy(p._2))}")
      sb ++= s"""<polyline points="${pts.mkString(" ")}" fill="none" stroke="$color" stroke-width="1.5"/>\n"""
      val ly = MT + 14 + i * 14
      sb ++= s"""<line x1="${W - MR - 110}" y1="$ly" x2="${W - MR - 90}" y2="$ly" stroke="$color" stroke-width="2"/>\n"""
      sb ++= s"""<text x="${W - MR - 85}" y="${ly + 4}" font-family="sans-serif" font-size="11">${s.label}</text>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Coefficient path: β vs log₁₀σ, one line per (feature, target) —
    * the reference's `plot(fit)`. Intercept rows are skipped like the
    * reference's default.
    */
  def pathSvg(pathDf: DataFrame): String = {
    val rows = pathDf.select("sigma", "feature", "target", "beta").collect()
    val series = rows.filter(_.getString(1) != "intercept")
      .groupBy(r => (r.getString(1), r.getInt(2)))
      .toSeq.map { case ((f, t), rs) =>
        Series(if (t == 0) f else s"$f:$t",
          rs.map(r => (math.log10(r.getDouble(0)), r.getDouble(3))).toSeq)
      }
    render("Coefficient path", "log10(sigma)", "beta", series)
  }

  /** CV mean ± 95% CI vs log₁₀σ per (measure, q) — the reference's
    * `plot(trained)`.
    */
  def cvSvg(cvSummaryDf: DataFrame): String = {
    val rows = cvSummaryDf.select("q", "sigma", "measure", "mean", "lo", "hi").collect()
    val grouped = rows.groupBy(r => (r.getString(2), r.getDouble(0))).toSeq
    val series = grouped.map { case ((m, q), rs) =>
      Series(s"$m q=$q", rs.map(r => (math.log10(r.getDouble(1)), r.getDouble(3))).toSeq)
    }
    val bands = grouped.map { case ((m, q), rs) =>
      Band(s"$m q=$q",
        rs.map(r => (math.log10(r.getDouble(1)), r.getDouble(4), r.getDouble(5))).toSeq)
    }
    render("Cross-validation", "log10(sigma)", "mean score", series, bands)
  }

  /** Solver primal/dual objectives vs iteration for one path step —
    * the reference's `plotDiagnostics(fit)`.
    */
  def diagnosticsSvg(diagDf: DataFrame, step: Int = 0): String = {
    val rows = diagDf.filter(diagDf("step") === step)
      .select("iteration", "primal", "dual").collect()
    val primal = Series("primal", rows.map(r => (r.getInt(0).toDouble, r.getDouble(1))).toSeq)
    val dual = Series("dual", rows.map(r => (r.getInt(0).toDouble, r.getDouble(2))).toSeq)
    render(s"Solver trace (step $step)", "iteration", "objective", Seq(primal, dual))
  }

  def write(path: String, svg: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), svg)
}
