package graft.extract

/** Streaming HTML main-content extractor.
  *
  * Fills the reference's cheap-extraction slot (reference: processor.py:76-83
  * extracts the embedded text layer; here the "embedded layer" is the HTML
  * byte payload). Single-pass character-level tokenizer -> flat block stream
  * with per-block text/link statistics -> Boilerpipe/Readability-style
  * text-density + link-density classification. No DOM materialization: at
  * 10^12 documents the per-row allocation budget matters more than tree
  * fidelity, and density classification only needs the block stream.
  */
object HtmlExtractor {

  /** One text block with its classification features. */
  final case class Block(
      tag: String,
      text: String,
      words: Int,
      linkWords: Int,
      inBoilerplateTag: Boolean
  ) {
    def linkDensity: Double = if (words == 0) 0.0 else linkWords.toDouble / words
  }

  final case class Extraction(
      title: String,
      blocks: Vector[Block],
      contentFlags: Vector[Boolean]
  ) {
    def contentBlocks: Vector[Block] =
      blocks.zip(contentFlags).collect { case (b, true) => b }
  }

  /** Tags that terminate the current text block. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "blockquote", "pre", "section", "article",
    "header", "footer", "nav", "aside", "main", "form", "figure",
    "figcaption", "hr", "body", "html", "head", "title", "dl", "dt", "dd")

  /** Structural-boilerplate containers: everything inside is boilerplate. */
  private val BoilerplateTags: Set[String] = Set("nav", "footer", "header", "aside", "form")

  /** Content ignored entirely. */
  private val SkipContentTags: Set[String] = Set("script", "style", "noscript", "svg", "template")

  private val HeadingTags: Set[String] = Set("h1", "h2", "h3", "h4", "h5", "h6")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "shy" -> "­", "rsquo" -> "’", "lsquo" -> "‘", "rdquo" -> "”",
    "ldquo" -> "“", "copy" -> "©", "reg" -> "®", "laquo" -> "«",
    "raquo" -> "»", "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß")

  // Classification thresholds (Boilerpipe NumWordsRules-inspired: the
  // canonical published heuristic keys on curr/prev/next word counts and a
  // 0.33 link-density cut).
  private val MaxContentLinkDensity = 0.33
  private val MinContentWords = 12
  private val MinNeighborWords = 6

  /** Tokenize + classify. Pure; one call per row inside mapPartitions. */
  def extract(html: String): Extraction = {
    val blocks = tokenize(html)
    val flags = classify(blocks._2)
    Extraction(blocks._1, blocks._2, flags)
  }

  /** Returns (title, blocks). */
  private def tokenize(html: String): (String, Vector[Block]) = {
    graft.util.StepBudget.tick(html.length.toLong) // B3 row work budget
    val n = html.length
    var i = 0
    val text = new StringBuilder
    var words = 0
    var linkWords = 0
    var inWord = false
    var wordStartedInLink = false
    var anchorDepth = 0
    var boilerDepth = 0
    var inTitle = false
    var skipUntil: String = null // inside script/style: skip until this close tag
    var currentTag = "body"
    val title = new StringBuilder
    val out = Vector.newBuilder[Block]

    def endWord(): Unit = {
      if (inWord) {
        words += 1
        if (wordStartedInLink) linkWords += 1
        inWord = false
      }
    }

    def flush(nextTag: String): Unit = {
      endWord()
      val t = text.toString.strip()
      if (t.nonEmpty) out += Block(currentTag, t, words, linkWords, boilerDepth > 0)
      text.clear(); words = 0; linkWords = 0
      currentTag = nextTag
    }

    def appendChar(c: Char): Unit = {
      if (inTitle) { title.append(c); return }
      if (Character.isWhitespace(c)) {
        endWord()
        if (text.nonEmpty && text.last != ' ') text.append(' ')
      } else {
        if (!inWord) { inWord = true; wordStartedInLink = anchorDepth > 0 }
        text.append(c)
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (skipUntil != null) {
        // scan for the closing tag of script/style/etc.
        if (c == '<' && i + 1 < n && html.charAt(i + 1) == '/') {
          val close = i + 2
          val end = html.indexOf('>', close)
          if (end > 0 && html.substring(close, end).strip().toLowerCase == skipUntil) {
            skipUntil = null
            i = end + 1
          } else i += 1
        } else i += 1
      } else if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (i + 1 >= n ||
          (!isAsciiLetter(html.charAt(i + 1)) && html.charAt(i + 1) != '/')) {
          // HTML5: '<' not followed by an ASCII letter (or '/') is literal
          // text — "5 < 6" must not swallow content to the next '>' (and an
          // apostrophe after a stray '<' must not eat the whole document via
          // attribute-quote skipping). ASCII letter per the spec's tag-open
          // state: '<' before a non-ASCII letter is literal too.
          appendChar(c)
          i += 1
        } else if (html.charAt(i + 1) == '/' &&
          (i + 2 >= n || !isAsciiLetter(html.charAt(i + 2)))) {
          // HTML5 "bogus comment": '</' + non-letter consumes to '>'
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else {
          val end = findTagEnd(html, i + 1)
          if (end < 0) { i = n } // truncated tag: drop the tail
          else {
            val inner = html.substring(i + 1, end)
            val closing = inner.startsWith("/")
            val raw = if (closing) inner.substring(1) else inner
            val name = raw.takeWhile(ch => Character.isLetterOrDigit(ch)).toLowerCase
            if (name.nonEmpty) {
              val selfClosing = isSelfClosing(inner, name)
              if (!closing && SkipContentTags.contains(name) && !selfClosing)
                skipUntil = name
              else if (name == "a") {
                endWord()
                if (closing) anchorDepth = math.max(0, anchorDepth - 1)
                else if (!selfClosing) anchorDepth += 1
              } else if (name == "br") {
                endWord()
                if (text.nonEmpty && text.last != ' ') text.append(' ')
              } else if (name == "title") {
                // self-closing <title/> must not route the document into the
                // title buffer
                if (closing) inTitle = false
                else if (!selfClosing) inTitle = true
              } else if (BlockTags.contains(name)) {
                flush(if (closing) "body" else name)
                if (BoilerplateTags.contains(name)) {
                  if (closing) boilerDepth = math.max(0, boilerDepth - 1)
                  else boilerDepth += 1
                }
              }
              // inline tags (span, b, i, em, strong, img, ...) don't break blocks
            }
            i = end + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = html.substring(i + 1, semi)
          val decoded =
            if (ent.startsWith("#x") || ent.startsWith("#X"))
              try Some(Character.toString(Integer.parseInt(ent.substring(2), 16)))
              catch { case _: Exception => None }
            else if (ent.startsWith("#"))
              try Some(Character.toString(Integer.parseInt(ent.substring(1))))
              catch { case _: Exception => None }
            else Entities.get(ent)
          decoded match {
            case Some(s) =>
              // NBSP normalizes to a plain space exactly like the named
              // &nbsp; mapping — &#160; and &nbsp; must extract identically
              s.foreach(ch => appendChar(if (ch == '\u00a0') ' ' else ch))
              i = semi + 1
            case None => appendChar(c); i += 1
          }
        } else { appendChar(c); i += 1 }
      } else {
        appendChar(c)
        i += 1
      }
    }
    flush("body")
    (title.toString.strip(), out.result())
  }

  /** Find the closing '>' of a tag starting after '<', skipping quoted
    * attribute values (an href containing '>' must not end the tag).
    */
  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** XHTML-style self-closing flag: a trailing '/' counts only when it is
    * the whole tag (`<br/>`) or preceded by whitespace or a closing quote
    * (`<img src="x" />`). A '/' ending an UNQUOTED attribute value
    * (`<title data-href=http://x/>`) is part of the value per HTML5 and
    * must not make the element self-closing.
    */
  private def isSelfClosing(inner: String, name: String): Boolean =
    inner.endsWith("/") && {
      inner.length == name.length + 1 || {
        val before = inner.charAt(inner.length - 2)
        Character.isWhitespace(before) || before == '"' || before == '\''
      }
    }

  private def findTagEnd(html: String, from: Int): Int = {
    var i = from
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '>') return i
      if (c == '"' || c == '\'') {
        val close = html.indexOf(c, i + 1)
        if (close < 0) return -1
        i = close + 1
      } else i += 1
    }
    -1
  }

  /** Density classification with neighbor context:
    *   - structural boilerplate (nav/footer/header/aside/form) is never content
    *   - big low-link blocks are content
    *   - short low-link blocks are content when adjacent to content
    *   - headings are content when the following block is content.
    * Two passes over the block vector; O(blocks) per row.
    */
  private def classify(blocks: Vector[Block]): Vector[Boolean] = {
    val n = blocks.size
    val core = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val b = blocks(i)
      core(i) = !b.inBoilerplateTag && b.words >= MinContentWords &&
        b.linkDensity <= MaxContentLinkDensity
      i += 1
    }
    val flags = new Array[Boolean](n)
    i = 0
    while (i < n) {
      val b = blocks(i)
      if (core(i)) flags(i) = true
      else if (!b.inBoilerplateTag && b.linkDensity <= MaxContentLinkDensity) {
        val prevCore = i > 0 && core(i - 1)
        val nextCore = i + 1 < n && core(i + 1)
        if (b.words >= MinNeighborWords && (prevCore || nextCore)) flags(i) = true
        else if (HeadingTags.contains(b.tag) && nextCore) flags(i) = true
      }
      i += 1
    }
    flags.toVector
  }

  /** Heavy re-segmentation: maximum-scoring contiguous block window
    * (CETD-style text-density sum), used when the cheap classifier's output
    * failed the quality gate. This is the graft's expensive second engine
    * (the reference's Surya slot, surya.py:97-150): costlier (two extra
    * O(blocks) sweeps + re-tokenization) but recovers content pages whose
    * per-block features fooled the fast rules.
    */
  def heavySegment(html: String): Extraction = {
    val (title, blocks) = tokenize(html)
    val n = blocks.size
    if (n == 0) return Extraction(title, blocks, Vector.empty)
    // Kadane over block scores: words - 3*linkWords - flat block penalty.
    val score = blocks.map { b =>
      (if (b.inBoilerplateTag) -b.words.toDouble else b.words.toDouble) -
        3.0 * b.linkWords - 4.0
    }
    var best = 0.0; var bestStart = 0; var bestEnd = -1
    var cur = 0.0; var curStart = 0
    var i = 0
    while (i < n) {
      if (cur <= 0) { cur = 0; curStart = i }
      cur += score(i)
      if (cur > best) { best = cur; bestStart = curStart; bestEnd = i }
      i += 1
    }
    val flags = Vector.tabulate(n) { k =>
      k >= bestStart && k <= bestEnd && !blocks(k).inBoilerplateTag &&
      blocks(k).linkDensity <= 0.5
    }
    Extraction(title, blocks, flags)
  }
}
