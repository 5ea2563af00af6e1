package graft.media

/** OCR boundary. The reference spawns one `tesseract` subprocess per pass per
  * page (`pytesseract.image_to_string`, `main.py:229,655,678`); here the
  * engine is a trait constructed ONCE PER PARTITION inside `mapPartitions`
  * (amortized init — the Spark-native answer to subprocess-per-call,
  * SURVEY.md §3.4).
  *
  * `recognize(media, passIdx)` returns the raw text of one OCR pass. Pass
  * preprocessing in the reference (`main.py:219-227`): 0 = identity,
  * 1 = binarize(>128), 2 = 3×3 median filter, 3 = sharpen — each applied to
  * the ORIGINAL image, not cumulatively (`processed_image = image` reset).
  */
trait OcrEngine extends Serializable {
  def recognize(media: PageMedia, passIdx: Int): String
}

/** Deterministic sandbox engine (FIXTURES.md §3 class 7 noise schedule):
  * pass 0 returns the media's base text; for `noisy` media the preprocessing
  * variants are emulated by a fixed text-space perturbation so the
  * consensus/confidence kernels are exercised exactly as specified:
  *   pass 1 (binarize)  → flip char at index 5 ('X', or 'Y' if already 'X')
  *   pass 2 (median)    → drop last char
  *   pass 3 (sharpen)   → uppercase char 0
  * Non-noisy media return identical text on every pass (consensus = base,
  * pairwise confidence = 100.0).
  */
object DeterministicOcr extends OcrEngine {
  override def recognize(media: PageMedia, passIdx: Int): String = {
    val base = media.baseText
    if (!media.noisy || passIdx == 0) base
    else passIdx match {
      case 1 =>
        if (base.length > 5) {
          val c = if (base.charAt(5) == 'X') 'Y' else 'X'
          base.substring(0, 5) + c + base.substring(6)
        } else base
      case 2 => if (base.nonEmpty) base.substring(0, base.length - 1) else base
      case 3 => if (base.nonEmpty) Character.toUpperCase(base.charAt(0)) + base.substring(1) else base
      case _ => base
    }
  }
}

/** Production engine skeleton: Tesseract via JNI (tess4j-style), one native
  * `TessBaseAPI` per partition, batched page handoff. Compiled but unused in
  * the sandbox (no tesseract binary / native lib here — Dockerfile:1-26 of
  * the reference installs tesseract-ocr + 11 language packs for prod). The
  * pipeline depends only on the `OcrEngine` trait, so swapping this in
  * touches no pipeline code (SURVEY.md §7.4).
  */
final class TesseractJniOcr(langs: String = "eng") extends OcrEngine {
  @transient private lazy val api: AnyRef =
    throw new UnsupportedOperationException(
      "TesseractJniOcr requires the tesseract native library (prod image only); " +
      "use DeterministicOcr in the sandbox")
  override def recognize(media: PageMedia, passIdx: Int): String = {
    val _ = api
    throw new IllegalStateException("unreachable")
  }
}
