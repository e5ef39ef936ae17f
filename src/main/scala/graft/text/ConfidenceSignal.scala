package graft.text

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.model.Signal

/** Length-weighted extraction-confidence signal.
  *
  * Semantics from the reference's OCR confidence signal
  * (reference: confidence.py:44-88): score = sum(conf * len(word)) /
  * sum(len(word)) / 100; no valid words -> neutral 0.5. In the graft,
  * per-token confidence comes from the extractor (block-classification
  * margin scaled to 0-100) rather than Tesseract.
  */
object ConfidenceSignal {

  final case class WordConf(text: String, conf: Int)

  final case class Result(
      score: Double,
      wordCount: Int,
      meanConf: Option[Double],
      minConf: Option[Int],
      lowConfWords: Seq[String]
  ) {
    def toSignal: Signal = Signal(
      "confidence",
      score,
      passed = score >= 0.5,
      Map("word_count" -> wordCount.toString) ++
        meanConf.map("mean_conf" -> _.toString) ++
        minConf.map("min_conf" -> _.toString)
    )
  }

  private val Neutral = Result(0.5, 0, None, None, Nil)

  def score(data: Seq[WordConf]): Result = {
    val valid = data.filter(w => w.conf > 0 && w.text.strip().nonEmpty)
    if (valid.isEmpty) Neutral
    else {
      val weights = valid.map(w => math.max(1, w.text.length))
      val totalWeight = weights.sum.toDouble
      val weightedSum = valid.zip(weights).map { case (w, wt) => w.conf.toDouble * wt }.sum
      val meanConf = weightedSum / totalWeight
      Result(
        score = meanConf / 100.0,
        wordCount = valid.size,
        meanConf = Some(round2(meanConf)),
        minConf = Some(valid.map(_.conf).min),
        lowConfWords = valid.filter(_.conf < 30).map(_.text).take(20)
      )
    }
  }

  private def round2(x: Double): Double =
    new JBigDecimal(x).setScale(2, RoundingMode.HALF_EVEN).doubleValue()
}
