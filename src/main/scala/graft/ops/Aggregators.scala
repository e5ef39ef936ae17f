package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Corpus-level statistics aggregators (the `Aggregator[IN, BUF, OUT]`
  * surface — SURVEY.md §2.12 reserved this for exactly this use: corpus
  * token-frequency stats the built-in aggregates can't express in one pass).
  */
object Aggregators {

  final case class TokenCount(token: String, cnt: Long)

  /** One-pass corpus top-k token frequency. Buffer = per-partition token
    * counts (bounded by vocabulary size, not row count); merge = map union;
    * finish = top-k with deterministic (count desc, token asc) tie-break.
    * The partial-aggregation shape means each partition ships one
    * vocab-sized map through the shuffle, never per-row data.
    *
    * Scale boundary: "vocab-sized" is only small for NATURAL-language
    * vocabularies. On raw web text (numbers, urls, typos) the distinct-token
    * count keeps growing with corpus size and the single global merge
    * becomes the bottleneck — there, use the explode -> groupBy(token) ->
    * count -> orderBy/limit formulation (fully distributed; the
    * q_explode_tokens building block) or a sketched heavy-hitters pass.
    * This Aggregator is the typed-UDAF taxonomy slot (SURVEY §2.12), right
    * when the vocabulary genuinely is bounded.
    */
  final class TopKTokens(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[TokenCount]] {

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(
        buf: mutable.HashMap[String, Long],
        text: String): mutable.HashMap[String, Long] = {
      if (text != null) {
        var i = 0
        val n = text.length
        while (i <= n) {
          var j = i
          while (j < n && text.charAt(j) != ' ') j += 1
          if (j > i) {
            val tok = text.substring(i, j)
            buf.update(tok, buf.getOrElse(tok, 0L) + 1L)
          }
          i = j + 1
        }
      }
      buf
    }

    override def merge(
        a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
      from.foreach { case (t, c) => into.update(t, into.getOrElse(t, 0L) + c) }
      into
    }

    override def finish(buf: mutable.HashMap[String, Long]): Seq[TokenCount] =
      buf.toSeq
        .sortBy { case (t, c) => (-c, t) }
        .take(k)
        .map { case (t, c) => TokenCount(t, c) }

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]

    override def outputEncoder: Encoder[Seq[TokenCount]] =
      ExpressionEncoder[Seq[TokenCount]]()
  }
}
