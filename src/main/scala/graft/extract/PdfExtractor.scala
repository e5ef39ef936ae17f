package graft.extract

import java.nio.charset.StandardCharsets

/** PDF layout path: text-run extraction, column segmentation,
  * reading-order sweep.
  *
  * The reference's binary path parses real PDFs with PyMuPDF
  * (reference: processor.py:76-83). Two container front-ends feed the same
  * positioned-run page model here:
  *
  *   - REAL containers (`%PDF-1.x`): [[PdfContainer]], a from-scratch
  *     ISO 32000 subset reader (classic xref AND PDF 1.5+ xref streams /
  *     object streams with PNG predictors, incl. hybrid files and lenient
  *     body-scan recovery; full object syntax; FlateDecode; page tree;
  *     the text-showing operator set) — no PDF library ships in this
  *     environment and none is needed for that subset; out-of-subset
  *     features (encryption, non-Flate filters, CID fonts) fail loudly as
  *     contained failure rows.
  *   - the deterministic `%PDF-GRAFT` synthetic layout stream produced by
  *     the corpus generator (FIXTURES.md §1), kept as the high-volume
  *     fixture format.
  *
  * Everything downstream — column segmentation, reading-order sweeps,
  * per-page selective heavy reprocessing — is container-independent.
  *
  * Synthetic payload grammar (one record per line, UTF-8):
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

  private def hasBytePrefix(payload: Array[Byte], prefix: String): Boolean = {
    if (payload.length < prefix.length) return false
    var i = 0
    while (i < prefix.length) {
      if (payload(i) != prefix.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  def parse(payload: Array[Byte]): Either[String, Vector[Page]] = {
    graft.util.StepBudget.tick(payload.length.toLong) // B3 row work budget
    // container routing ON BYTES (a real container is mostly binary; a full
    // lossy UTF-8 decode just to sniff the header would allocate a
    // payload-sized replacement-char string per call): the deterministic
    // %PDF-GRAFT layout stream (the corpus generator's format) parses
    // below; any other %PDF- header is a REAL container and goes through
    // the ISO 32000 subset reader, which produces the same positioned-run
    // page model (PdfContainer scaladoc lists the supported subset and the
    // loud-failure boundaries)
    if (!hasBytePrefix(payload, "%PDF-GRAFT")) {
      if (hasBytePrefix(payload, "%PDF-")) return PdfContainer.parsePages(payload)
      return Left("unsupported_pdf_container")
    }
    val s = new String(payload, StandardCharsets.UTF_8)
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
    parse(payload).map(pages =>
      Extraction(pages.zipWithIndex.flatMap { case (page, pi) => extractPage(page, pi) }))

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

  // ---- heavy engine ---------------------------------------------------------

  /** Fixed-pitch advance model of the synthetic container: px per character.
    * Real PDFs carry per-run font metrics; the synthetic layout stream is
    * fixed-pitch by construction (CorpusGen emits run x-origins on this
    * grid), so the advance model is exact here and a drop-in for metric
    * widths on a real container.
    */
  val CharWidth = 6

  /** Heavy line clustering folds baselines within this many px into one
    * visual line (the fast sweep groups on exact y and fragments jittered
    * baselines).
    */
  val YTolerance = 2

  /** An empty vertical band at least this wide (px) separates columns in the
    * occupancy projection.
    */
  val MinGutter = 24

  /** A run starting within this many px of the previous run's advance end
    * continues the same word (no space inserted).
    */
  val JoinSlack = 3

  /** Hard ceiling on the occupancy-projection extent (px). Run coordinates
    * are attacker-controlled input: without a clamp, a single
    * `T 2000000000 50 a` record would size a ~2 GB array (OutOfMemoryError
    * escapes the Exception containment) and scan it un-ticked. Real page
    * widths are a few thousand px; runs beyond the ceiling clamp into the
    * last band.
    */
  val MaxProjectionExtent = 1 << 16

  /** Heavy re-segmentation — the expensive second engine for flagged PDF
    * rows (the reference's Surya slot, surya.py:97-150; write-back semantics
    * batch.py:439-481). Three upgrades over [[extract]]:
    *
    *   1. column detection by whitespace-gutter occupancy projection
    *      (handles 3+ columns and word-split runs; the fast path splits only
    *      at the single largest run-start gap),
    *   2. y-tolerance line clustering (recovers jittered baselines the fast
    *      exact-y grouping fragments across lines),
    *   3. x-advance-aware run joining (rejoins words split across runs: a
    *      run starting at the previous run's advance end continues the word;
    *      a one-char-width gap is a space).
    */
  def heavyExtract(payload: Array[Byte]): Either[String, Extraction] =
    parse(payload).map(pages =>
      Extraction(pages.zipWithIndex.flatMap { case (page, pi) => heavyExtractPage(page, pi) }))

  /** Fast-path (kind, text) columns of ONE page — the unit of selective
    * reprocessing: the heavy stage re-segments only flagged pages and keeps
    * these columns for pages that pass the quality gate.
    */
  def extractPage(page: Page, pi: Int): Vector[(String, String)] =
    segmentColumns(page).zipWithIndex.flatMap { case (colRuns, ci) =>
      val textOut = sweepColumn(colRuns)
      if (textOut.nonEmpty) Some((s"pdf-p$pi-col$ci", textOut)) else None
    }

  /** Heavy-path (kind, text) columns of ONE page (gutter columns +
    * y-tolerance clustering + advance-aware joining).
    */
  def heavyExtractPage(page: Page, pi: Int): Vector[(String, String)] =
    gutterColumns(page).zipWithIndex.flatMap { case (colRuns, ci) =>
      val textOut = heavySweep(colRuns)
      if (textOut.nonEmpty) Some((s"pdf-p$pi-col$ci", textOut)) else None
    }

  /** Occupancy-projection column segmentation: mark [x, x + len*CharWidth)
    * for every run, then split at maximal empty bands >= MinGutter px strictly
    * inside the occupied extent.
    */
  private def gutterColumns(page: Page): Vector[Vector[Run]] = {
    if (page.runs.isEmpty) return Vector.empty
    val wanted = math.max(
      page.width.toLong,
      page.runs.iterator
        .map(r => r.x.toLong + math.max(1, r.text.length).toLong * CharWidth)
        .max) + 1
    val extent = math.max(1L, math.min(MaxProjectionExtent.toLong, wanted)).toInt
    graft.util.StepBudget.tick(extent.toLong) // B3: projection scan is O(extent)
    val occ = new Array[Boolean](extent)
    page.runs.foreach { r =>
      // clamp attacker-controlled coordinates into the projection
      var i = math.min(extent - 1, math.max(0, r.x))
      val end = math.min(
        extent.toLong,
        math.max(0, r.x).toLong + math.max(1, r.text.length).toLong * CharWidth).toInt
      occ(i) = true
      while (i < end) { occ(i) = true; i += 1 }
    }
    val first = occ.indexOf(true)
    val last = occ.lastIndexOf(true)
    val boundaries = Vector.newBuilder[Int]
    var i = first
    while (i <= last) {
      if (!occ(i)) {
        var j = i
        while (j <= last && !occ(j)) j += 1
        if (j - i >= MinGutter) boundaries += i
        i = j
      } else i += 1
    }
    val bs = boundaries.result()
    if (bs.isEmpty) Vector(page.runs)
    else
      page.runs
        .groupBy(r => bs.count(_ <= r.x))
        .toVector
        .sortBy(_._1)
        .map(_._2)
  }

  /** Reading-order sweep with y-tolerance line clustering and advance-aware
    * run joining; paragraph-break logic shared with the fast sweep.
    */
  private def heavySweep(runs: Vector[Run]): String = {
    if (runs.isEmpty) return ""
    val sorted = runs.sortBy(r => (r.y, r.x))
    // cluster into visual lines: a run within YTolerance of the line's base
    // baseline joins it
    val lines = Vector.newBuilder[(Int, Vector[Run])]
    var base = Int.MinValue
    var cur = Vector.newBuilder[Run]
    var curHas = false
    sorted.foreach { r =>
      if (!curHas || r.y - base > YTolerance) {
        if (curHas) lines += ((base, cur.result()))
        cur = Vector.newBuilder[Run]
        base = r.y
        curHas = true
      }
      cur += r
    }
    if (curHas) lines += ((base, cur.result()))
    val ls = lines.result().map { case (y, rs) =>
      val xs = rs.sortBy(r => (r.x, r.y))
      val sb = new StringBuilder
      var expectedEnd = Int.MinValue
      xs.foreach { r =>
        if (sb.nonEmpty && math.abs(r.x - expectedEnd) > JoinSlack) sb.append(' ')
        sb.append(r.text)
        expectedEnd = r.x + r.text.length * CharWidth
      }
      (y, sb.toString)
    }
    assembleLines(ls)
  }

  /** Join (baselineY, lineText) pairs with \n, upgrading y-jumps > 1.5x the
    * median line advance to paragraph breaks. Shared by both sweeps.
    */
  private def assembleLines(ls: Vector[(Int, String)]): String = {
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
    assembleLines(lines.result())
  }
}
