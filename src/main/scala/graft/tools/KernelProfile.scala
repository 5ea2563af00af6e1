package graft.tools

import graft.core.{Confidence, Consensus, LangDetect, TextClean}
import graft.media.{DeterministicMediaStore, DeterministicOcr}
import graft.pipeline.{ExtractConf, ExtractKernel, Fixtures}

/** Single-threaded micro-profile of the extraction kernel over the bench
  * corpus doc classes — separates where a doc's budget goes (OCR passes,
  * consensus, pairwise confidence, clean, lang detect) so kernel
  * optimization targets the measured hot spot, not a guess (guide §1).
  * Usage: runMain graft.tools.KernelProfile [numDocs]
  */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val conf = ExtractConf(level = "medium")
    val docs = (1 to n).map(Fixtures.doc)

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warm JIT
    docs.take(2000).foreach(d =>
      ExtractKernel.extractWhole(d, DeterministicMediaStore, DeterministicOcr, conf))

    time("extractWhole (e2e)") {
      docs.foreach(d =>
        ExtractKernel.extractWhole(d, DeterministicMediaStore, DeterministicOcr, conf))
    }

    // component breakdown over the raw pages of the same corpus
    val raws = time("rawPages (decode+ocr only)") {
      docs.flatMap(d =>
        ExtractKernel.plan(d, DeterministicMediaStore, conf).flatMap(u =>
          ExtractKernel.rawPages(u, DeterministicMediaStore, DeterministicOcr, conf)))
    }
    println(s"pages: ${raws.length}, multi-pass pages: ${raws.count(_.passes.length > 1)}")
    val merged = time("consensus.merge") {
      raws.map(rp => if (rp.passes.length == 1) rp.passes.head else Consensus.merge(rp.passes))
    }
    time("confidence.pairwise") {
      raws.foreach(rp => if (rp.passes.length > 1) Confidence.pairwise(rp.passes))
    }
    val cleaned = time("textclean.clean") { merged.map(TextClean.clean) }
    time("langdetect.detect") { cleaned.foreach(LangDetect.detect) }
  }
}
