package graft.tools

import java.nio.file.{Files, Paths}

import graft.corpus.{CorpusGen, WarcGen}

/** Writes a small deterministic WARC demo corpus (one plain archive + one
  * per-record-gzip archive, Common Crawl layout) for driving the CLI's
  * `--input warc:<glob>` path end to end.
  */
object WarcDemo {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/warc_demo")
    val n = if (args.length > 1) args(1).toLong else 100L
    Files.createDirectories(dir)
    val rows = (0L until n).map(CorpusGen.genRow(42L, _))
    Files.write(dir.resolve("seg0.warc"), WarcGen.archive(rows.take(rows.length / 2)))
    Files.write(
      dir.resolve("seg1.warc.gz"),
      WarcGen.archive(rows.drop(rows.length / 2), gzip = true))
    println(s"""{"warc_demo":"$dir","rows":$n}""")
  }
}
