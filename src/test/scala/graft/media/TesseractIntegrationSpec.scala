package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** BINARY-GATED integration of the executable production OCR engine
  * (round-3 verdict item 7): runs `TesseractCliOcr` end-to-end — AWT page
  * raster → per-pass preprocessing (`main.py:219-227` semantics) →
  * `tesseract` subprocess → recognized text — on one fixture page, so the
  * first production deploy is not this engine's first execution.
  *
  * In the sandbox (no tesseract binary, zero egress to install one) every
  * test self-CANCELS via `assume` — visibly skipped, never silently green.
  * Run `scripts/run_ocr_integration.sh` on any host with tesseract-ocr
  * installed to execute it for real.
  */
class TesseractIntegrationSpec extends AnyFunSuite {

  private def gate(): Unit = assume(TesseractCliOcr.available(),
    "tesseract binary not on PATH — install tesseract-ocr to run this")

  /** OCR noise tolerance: compare letters-only lowercase forms. */
  private def normalize(s: String): String =
    s.toLowerCase.replaceAll("[^a-z ]", " ").replaceAll(" +", " ").trim

  test("pass 0 (identity): fixture page text round-trips through tesseract") {
    gate()
    val page = DeterministicMediaStore.page("mem://doc00000001/0", 1)
    val out = new TesseractCliOcr().recognize(page, 0)
    val want = normalize(page.baseText.replaceAll("p\\d+ of .*", ""))
    val got = normalize(out)
    // word-level overlap ≥ 80%: OCR on clean rendered monospace text
    // should recover essentially all dictionary words
    val wantW = want.split(" ").filter(_.length > 2).toSet
    val gotW = got.split(" ").toSet
    val hit = wantW.count(gotW.contains).toDouble / math.max(wantW.size, 1)
    assert(hit >= 0.8, s"recovered $hit of fixture words\nwant: $want\ngot:  $got")
  }

  test("all four passes produce non-empty recognitions on a noisy page") {
    gate()
    // class-7 doc → noisy media: passes differ upstream in the consensus
    // kernel; here we assert the full preprocess→subprocess path executes
    // for every pass variant
    val page = DeterministicMediaStore.page("mem://doc00000007/0", 1)
    val eng = new TesseractCliOcr()
    for (p <- 0 to 3) {
      val out = eng.recognize(page, p)
      assert(normalize(out).nonEmpty, s"pass $p recognized nothing")
    }
  }

  test("engine swap: extraction pipeline runs with the CLI engine") {
    gate()
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val docs = spark.createDataset((0 until 4).map(graft.pipeline.Fixtures.doc))
    val conf = graft.pipeline.ExtractConf(numPartitions = 2)
    val out = graft.pipeline.Extract.extractDS(spark, docs, conf = conf,
      engine = new TesseractCliOcr())
    assert(out.count() == 4)
  }
}
