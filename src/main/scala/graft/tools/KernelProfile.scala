package graft.tools

import java.nio.charset.StandardCharsets

import graft.corpus.CorpusGen
import graft.extract.{Extractor, HtmlExtractor}
import graft.text.{DictionarySignal, GarbledSignal, Postprocess, QualityAnalyzer}

/** Single-thread microbenchmark of the per-row kernel components. */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = 4000
    val rows = (0 until n).map(i => CorpusGen.genRow(42L, i * 20)) // class 0 html rows
    val htmls = rows.map(r => new String(r.html, StandardCharsets.UTF_8))
    val cfg = Extractor.Config()

    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e6 / n}%.4f ms/doc")
    }

    time("tokenize+classify") { htmls.foreach(HtmlExtractor.extract) }
    val extractions = htmls.map(HtmlExtractor.extract)
    val blockTexts = extractions.map(_.contentBlocks.map(b => (b.tag, b.text)))
    time("assemble(postprocess)") { blockTexts.foreach(Extractor.assemble) }
    val texts = blockTexts.map(b => Extractor.assemble(b)._1)
    time("garbled") { texts.foreach(GarbledSignal.score(_)) }
    time("dictionary") { texts.foreach(DictionarySignal.score) }
    val analyzer = QualityAnalyzer()
    time("full analyze") { texts.foreach(t => analyzer.analyzeWith(t, None)) }
    time("fastExtract e2e") { rows.foreach(Extractor.fastExtract(_, cfg)) }
  }
}
