package graft.extract

import java.nio.charset.StandardCharsets

/** PDF layout path: text-run extraction, column segmentation,
  * reading-order sweep.
  *
  * The reference's binary path parses real PDFs with PyMuPDF
  * (reference: processor.py:76-83). No PDF library ships in this
  * environment, so the binary payload format is a deterministic synthetic
  * "layout stream" produced by the corpus generator (FIXTURES.md §1:
  * "magic `%PDF` + synthetic layout stream"). The *Spark-side semantics* —
  * positioned text runs in, column-segmented reading-ordered text out — are
  * real and fully tested; only the container format is the stub.
  *
  * Payload grammar (one record per line, UTF-8):
  * {{{
  *   %PDF-GRAFT <version>
  *   P <width> <height>          -- page start
  *   T <x> <y> <text...>         -- text run at (x, y); y grows downward
  * }}}
  */
object PdfExtractor {

  val Magic: Array[Byte] = "%PDF".getBytes(StandardCharsets.UTF_8)

  def isPdf(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 4 &&
      payload(0) == Magic(0) && payload(1) == Magic(1) &&
      payload(2) == Magic(2) && payload(3) == Magic(3)

  final case class Run(x: Int, y: Int, text: String)
  final case class Page(width: Int, height: Int, runs: Vector[Run])

  /** Extracted text in reading order; one entry per (page, column) with the
    * column id, so the job layer can emit spans with kind "pdf-col<k>".
    */
  final case class Extraction(columns: Vector[(String, String)]) {
    def text: String = columns.map(_._2).mkString("\n\n")
  }

  def parse(payload: Array[Byte]): Either[String, Vector[Page]] = {
    val s = new String(payload, StandardCharsets.UTF_8)
    if (!s.startsWith("%PDF-GRAFT")) return Left("unsupported_pdf_container")
    val pages = Vector.newBuilder[Page]
    var width = 612
    var height = 792
    var runs = Vector.newBuilder[Run]
    var havePage = false
    def flushPage(): Unit =
      if (havePage) pages += Page(width, height, runs.result())
    s.split("\n").iterator.drop(1).foreach { line =>
      val t = line.stripTrailing()
      if (t.startsWith("P ")) {
        flushPage()
        val parts = t.split(" ")
        if (parts.length < 3) return Left("malformed_page_record")
        try { width = parts(1).toInt; height = parts(2).toInt }
        catch { case _: NumberFormatException => return Left("malformed_page_record") }
        runs = Vector.newBuilder[Run]
        havePage = true
      } else if (t.startsWith("T ")) {
        val rest = t.substring(2)
        val sp1 = rest.indexOf(' ')
        val sp2 = if (sp1 < 0) -1 else rest.indexOf(' ', sp1 + 1)
        if (sp2 < 0) return Left("malformed_text_record")
        try {
          runs += Run(
            rest.substring(0, sp1).toInt,
            rest.substring(sp1 + 1, sp2).toInt,
            rest.substring(sp2 + 1)
          )
        } catch { case _: NumberFormatException => return Left("malformed_text_record") }
      } else if (t.nonEmpty) return Left("unknown_record")
    }
    flushPage()
    Right(pages.result())
  }

  /** Column segmentation: cluster run x-origins, split at the largest gap
    * when it exceeds width/4 (two-column detection); then a geometric
    * reading-order sweep per column — sort by (y, x), join same-line runs
    * with spaces, emit paragraph breaks on y-jumps > 1.5x the median line
    * advance.
    */
  def extract(payload: Array[Byte]): Either[String, Extraction] =
    parse(payload).map { pages =>
      val cols = Vector.newBuilder[(String, String)]
      pages.zipWithIndex.foreach { case (page, pi) =>
        val columns = segmentColumns(page)
        columns.zipWithIndex.foreach { case (colRuns, ci) =>
          val textOut = sweepColumn(colRuns)
          if (textOut.nonEmpty) cols += ((s"pdf-p$pi-col$ci", textOut))
        }
      }
      Extraction(cols.result())
    }

  private def segmentColumns(page: Page): Vector[Vector[Run]] = {
    if (page.runs.isEmpty) return Vector.empty
    val xs = page.runs.map(_.x).distinct.sorted
    if (xs.length < 2) return Vector(page.runs)
    var bestGap = 0
    var splitAt = -1
    var i = 1
    while (i < xs.length) {
      val gap = xs(i) - xs(i - 1)
      if (gap > bestGap) { bestGap = gap; splitAt = xs(i) }
      i += 1
    }
    if (bestGap > page.width / 4) {
      val (left, right) = page.runs.partition(_.x < splitAt)
      Vector(left, right).filter(_.nonEmpty)
    } else Vector(page.runs)
  }

  private def sweepColumn(runs: Vector[Run]): String = {
    val sorted = runs.sortBy(r => (r.y, r.x))
    // group same-y runs into lines
    val lines = Vector.newBuilder[(Int, String)]
    var curY = Int.MinValue
    var cur = new StringBuilder
    sorted.foreach { r =>
      if (r.y != curY) {
        if (cur.nonEmpty) lines += ((curY, cur.toString))
        cur = new StringBuilder(r.text)
        curY = r.y
      } else {
        cur.append(' ').append(r.text)
      }
    }
    if (cur.nonEmpty) lines += ((curY, cur.toString))
    val ls = lines.result()
    if (ls.isEmpty) return ""
    val advances = ls.sliding(2).collect { case Vector(a, b) => b._1 - a._1 }.filter(_ > 0).toVector
    val median =
      if (advances.isEmpty) 12
      else advances.sorted.apply((advances.length - 1) / 2)
    val sb = new StringBuilder(ls.head._2)
    ls.sliding(2).foreach {
      case Vector((y1, _), (y2, t2)) =>
        sb.append(if (y2 - y1 > median * 3 / 2) "\n\n" else "\n").append(t2)
      case _ => ()
    }
    sb.toString
  }
}
