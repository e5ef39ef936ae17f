package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.Extractor
import graft.job.ExtractionJob
import graft.model.{DocResult, RawPage}

/** Structured Streaming surface: the same extraction kernels applied to a
  * stream of pages (continuous crawl ingestion), plus a watermarked windowed
  * quality rollup.
  *
  * The reference is strictly batch (SURVEY.md §2.12); its nearest streaming
  * analogue is the async job surface (mcp_server.py:106-254). This module is
  * the engine's forward door for continuous ingestion: extraction is a
  * stateless per-row kernel, so the batch and streaming paths share ALL
  * logic — a streaming micro-batch produces byte-identical rows to the batch
  * job on the same input (tested), and exactly-once delivery comes from the
  * sink checkpoint instead of the batch lineage table.
  */
object StreamingExtraction {

  /** Stateless streaming transformation: RawPage stream -> DocResult stream.
    * Inline heavy fallback only (a shuffle barrier has no place mid-stream).
    */
  def extract(pages: DataFrame, cfg: ExtractionJob.JobConfig)(
      implicit spark: SparkSession): Dataset[DocResult] = {
    import spark.implicits._
    val exCfg = cfg.extractorConfig
    pages
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
      .as[RawPage]
      .mapPartitions { it =>
        it.map { raw =>
          val fastDoc = Extractor.fastExtract(raw, exCfg)
          if (fastDoc.success && fastDoc.quality.flagged)
            Extractor.heavyExtract(raw, fastDoc, exCfg)
          else fastDoc
        }
      }
  }

  /** Watermarked per-window quality metrics over the extracted stream —
    * the streaming form of the batch lineage rollup: docs, failures, flags,
    * mean quality per crawl-timestamp window.
    */
  def qualityByWindow(
      pages: DataFrame,
      cfg: ExtractionJob.JobConfig,
      window: String = "1 minute",
      watermark: String = "2 minutes"
  )(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val exCfg = cfg.extractorConfig
    val docs = pages
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
      .as[RawPage]
      .mapPartitions { it =>
        it.map { raw =>
          val d = Extractor.fastExtract(raw, exCfg)
          (raw.warc_ts, d.success, d.quality.flagged, d.quality.score)
        }
      }
      .toDF("warc_ts", "success", "flagged", "score")
    docs
      .withWatermark("warc_ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(!col("success"), 1L).otherwise(0L)).as("failures"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("flagged"),
        avg(col("score")).as("mean_quality"))
      .select(
        col("window.start").as("window_start"),
        col("docs"), col("failures"), col("flagged"), col("mean_quality"))
  }
}
