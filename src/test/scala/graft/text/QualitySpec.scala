package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Signal + composite scoring semantics (reference: tests/test_quality.py
  * coverage re-derived: clean/garbled ordering, neutral short texts, German
  * terms, floors, short-circuits, gray zone).
  */
class QualitySpec extends AnyFunSuite {

  private val clean =
    ("the question of meaning in language and history has a long tradition " +
      "of careful reading and patient interpretation across many works ") * 3

  private val garbled =
    clean.split(" ").zipWithIndex.map { case (w, i) =>
      if (i % 3 == 2) "xkqzwvbn" else w
    }.mkString(" ")

  test("clean text scores higher than garbled text") {
    val c = GarbledSignal.score(clean)
    val g = GarbledSignal.score(garbled)
    assert(c.score > g.score)
    assert(c.score == 1.0)
    assert(g.garbledCount > 0)
  }

  test("texts under 100 chars are neutral (score 1.0)") {
    val r = GarbledSignal.score("short garbled xkqzwvbn @#$%^&")
    assert(r.score == 1.0 && r.totalWords == 0)
  }

  test("score formula: max(0, 1 - 2*ratio)") {
    val words = (1 to 50).map(i => if (i <= 10) "xkqzwvbn" else "meaning")
    val text = words.mkString(" ") + " " + ("padding " * 10) // ensure >100 chars
    val r = GarbledSignal.score(text)
    val ratio = r.garbledCount.toDouble / r.totalWords
    assert(math.abs(r.score - math.max(0.0, 1.0 - 2 * ratio)) < 1e-12)
  }

  test("NBSP splits tokens like Python str.split (parity)") {
    // "alpha<NBSP>beta" must count as two words, not one glued token
    val text = ("alpha\u00a0beta gamma delta epsilon zeta " * 6)
    val r = GarbledSignal.score(text)
    assert(r.totalWords == 36, s"got ${r.totalWords}")
    assert(r.score == 1.0)
  }

  test("Unicode word boundary: mixed-script CamelCase is not weird_case (parity)") {
    // Python \\b sees no boundary inside letters; ASCII \\b would split at the
    // non-ASCII letter and falsely match the trailing CamelCase
    assert(GarbledSignal.classifyWord("Gro\u00dfWortCase").isEmpty)
    // pure-ASCII CamelCase still fires
    assert(GarbledSignal.classifyWord("GarBled").contains("weird_case"))
  }

  test("german philosophy terms are not garbled despite consonant clusters") {
    assert(GarbledSignal.classifyWord("Erschlossenheit").isEmpty)
    assert(GarbledSignal.classifyWord("zuhandenheit").isEmpty)
    // german suffix exemption applies even off-whitelist
    assert(GarbledSignal.classifyWord("verschrobenheit").isEmpty)
  }

  test("reference patterns (page ranges, ISBN, roman numerals) are skipped") {
    for (w <- Seq("123", "12-34", "xiv", "1984", "ISBN0123", "pp. 12", "(3)", "[12]", "§4"))
      assert(GarbledSignal.classifyWord(w).isEmpty, w)
  }

  test("garble detectors fire by type") {
    assert(GarbledSignal.classifyWord("bcdfghjk").contains("consonant_cluster"))
    assert(GarbledSignal.classifyWord("abc@#$%^xyz").contains("symbol_run"))
    assert(GarbledSignal.classifyWord("GarBled").contains("weird_case"))
    assert(GarbledSignal.classifyWord("ab\u0001cd").contains("control_char"))
    assert(GarbledSignal.classifyWord("ab1@2#3$4%").contains("low_alpha"))
  }

  test("dictionary signal: known=1.0, structured=0.5, garbled=0.0 weighting") {
    val words = Set("meaning", "language")
    // 2 known + 1 structured (valid shape, unknown) + 1 garbled
    val r = DictionarySignal.score("meaning language katabasis zzzzzqk", words)
    assert(r.knownCount == 2 && r.unknownStructured == 1 && r.unknownGarbled == 1)
    assert(r.score == DictionarySignal.round4((2 * 1.0 + 1 * 0.5) / 4))
  }

  test("dictionary structural validity rules") {
    assert(DictionarySignal.isStructurallyValid("katabasis"))
    assert(!DictionarySignal.isStructurallyValid("bcdfgh")) // no vowels
    assert(!DictionarySignal.isStructurallyValid("aeiouae")) // all vowels, len>4
    assert(!DictionarySignal.isStructurallyValid("azzzza")) // 4x repeat... wait has 4 z
    assert(!DictionarySignal.isStructurallyValid("xzxzxz")) // alternating
    assert(!DictionarySignal.isStructurallyValid("abababab")) // low unique ratio + alternating
  }

  test("dictionary skips short and numeric tokens") {
    val r = DictionarySignal.score("ab 12 345 a1", Set.empty[String])
    assert(r.total == 0 && r.score == 1.0)
  }

  test("confidence signal is length-weighted") {
    import ConfidenceSignal.WordConf
    val r = ConfidenceSignal.score(Seq(WordConf("aaaa", 80), WordConf("bb", 20)))
    // (80*4 + 20*2) / 6 = 60
    assert(math.abs(r.score - 0.6) < 1e-12)
    assert(r.meanConf.contains(60.0))
  }

  test("confidence neutral 0.5 with no valid words") {
    val r = ConfidenceSignal.score(Nil)
    assert(r.score == 0.5 && r.wordCount == 0)
  }

  test("composite weights: without confidence .55/.45, with .4/.3/.3") {
    val a = QualityAnalyzer()
    val s1 = a.combine(Map("garbled" -> 1.0, "dictionary" -> 0.0))
    assert(math.abs(s1 - 0.55) < 1e-12)
    val s2 = a.combine(Map("garbled" -> 1.0, "dictionary" -> 0.0, "confidence" -> 0.0))
    assert(math.abs(s2 - 0.4) < 1e-12)
  }

  test("floor failure flags even above threshold") {
    // all-unknown-but-structured text: dictionary lands at exactly 0.5;
    // raise the dictionary floor above it so only the floor can flag
    val text = ("katabasis anagoge parousia kenosis semiosis peras " * 8)
    val a = QualityAnalyzer(
      threshold = 0.2,
      signalFloors = Map("dictionary" -> 0.6),
      words = Set("nothing"))
    val q = a.analyze(text)
    assert(q.signalScores("dictionary") == 0.5)
    assert(q.score >= 0.2, "composite itself passes the threshold")
    assert(q.flagged, s"floor fail must flag: $q")
  }

  test("confidence short-circuits lift and cap the composite") {
    import ConfidenceSignal.WordConf
    val a = QualityAnalyzer(threshold = 0.85)
    val strong = Seq.fill(30)(WordConf("wordword", 99))
    val qHigh = a.analyze(clean, Some(strong))
    assert(qHigh.score >= 0.9)
    val weak = Seq.fill(30)(WordConf("wordword", 10))
    val qLow = a.analyze(clean, Some(weak))
    assert(qLow.score <= 0.3)
  }

  test("gray zone and struggle classification") {
    val cats = QualityAnalyzer.classifyStruggle(
      Map("garbled" -> 0.6, "dictionary" -> 0.8), compositeScore = 0.84, threshold = 0.85)
    assert(cats.contains("gray_zone"))
    assert(cats.contains("character_confusion"))
    val cats2 = QualityAnalyzer.classifyStruggle(
      Map("garbled" -> 0.9, "dictionary" -> 0.5), 0.7, 0.85)
    assert(cats2.contains("vocabulary_miss"))
    assert(cats2.contains("signal_disagreement"))
  }

  test("heavy_insufficient fires for BOTH heavy and mixed engines") {
    val scores = Map("garbled" -> 0.9, "dictionary" -> 0.9)
    def cats(engine: String) = QualityAnalyzer.classifyStruggle(
      scores, compositeScore = 0.7, threshold = 0.85,
      engine = engine, heavyScore = Some(0.7))
    assert(cats(graft.model.Engines.Heavy).contains("heavy_insufficient"))
    // a spliced doc also ran the heavy engine on its flagged pages
    assert(cats(graft.model.Engines.Mixed).contains("heavy_insufficient"))
    assert(!cats(graft.model.Engines.Html).contains("heavy_insufficient"))
  }

  test("signal disagreements are pairwise, rounded, name-ordered") {
    val d = QualityAnalyzer.signalDisagreements(
      Map("garbled" -> 0.91, "dictionary" -> 0.5, "confidence" -> 0.7))
    assert(d.size == 3)
    assert(d.head.signals == Seq("confidence", "dictionary"))
    assert(d.map(_.magnitude).forall(m => m == QualityAnalyzer.round4(m)))
  }

  test("word diff reports additions, deletions, substitutions") {
    val d = WordDiff.diff("the quick brown fox", "the slow brown fox jumps")
    assert(d.substitutions == Seq(("quick", "slow")))
    assert(d.additions == Seq("jumps"))
    assert(d.summary("deletions") == 0)
  }

  // ADVICE r1: tokenizers must treat U+001C-U+001F as whitespace (Python
  // str.split() parity — Hashing.isPyWhitespace already does).
  test("null text scores Neutral, never NPE (budget tick after the guard)") {
    assert(GarbledSignal.score(null).score == 1.0)
    assert(DictionarySignal.score(null).score == 1.0)
  }

  test("FS/GS separators split tokens like spaces (garbled + dictionary)") {
    // >= 100 chars so GarbledSignal's short-text neutral rule does NOT make
    // the garbled half vacuous, and a planted garbled token so the score is
    // not trivially 1.0 — a reverted tokenizer fix must fail this test
    val spaceText = "language meaning truth reason world nature history " +
      "culture science method theory practice xkqzwvbn concept form matter"
    assert(spaceText.length >= 100)
    val fsText = spaceText.replace(" ", "\u001c")
    val g = GarbledSignal.score(spaceText)
    assert(g.score < 1.0, "the planted garbled token must register")
    assert(g.totalWords > 1, "tokenizer must split the text")
    val gFs = GarbledSignal.score(fsText)
    assert(gFs.score == g.score)
    assert(gFs.totalWords == g.totalWords)
    assert(DictionarySignal.score(fsText) == DictionarySignal.score(spaceText))
  }
}
