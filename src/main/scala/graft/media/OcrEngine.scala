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

/** EXECUTABLE production engine: the `tesseract` CLI binary, exactly the
  * process boundary the reference uses (`pytesseract.image_to_string` is a
  * subprocess wrapper around the same binary — `main.py:229,655,678`), with
  * the pass-k image preprocessing of `main.py:219-227` applied to the
  * ORIGINAL page raster: 0 = identity, 1 = binarize(>128), 2 = 3×3 median,
  * 3 = sharpen. One temp working dir per engine INSTANCE (= per partition
  * under `mapPartitions`) amortizes setup; the subprocess-per-page cost
  * matches the reference's own model.
  *
  * The sandbox fixture `PageMedia` carries glyph TEXT, not pixels (the
  * synthetic MediaStore never materializes bytes), so this engine
  * rasterizes `baseText` with headless AWT before preprocessing — in a real
  * deployment the MediaStore hands over the page raster and `render` is
  * replaced by a decode. Binary-gated: constructing it without a tesseract
  * on PATH (or at `binary`) throws with a clear message;
  * `TesseractIntegrationSpec` / scripts/run_ocr_integration.sh execute this
  * engine end-to-end wherever the binary exists, so the first production
  * deploy is not its first run (round-3 verdict item 7). */
final class TesseractCliOcr(langs: String = "eng",
    binary: String = "tesseract") extends OcrEngine {
  import java.awt.image.BufferedImage

  @transient private lazy val workDir: java.nio.file.Path = {
    require(TesseractCliOcr.available(binary),
      s"tesseract binary not found/executable at '$binary' — install " +
        "tesseract-ocr (prod image) or use DeterministicOcr in the sandbox")
    val d = java.nio.file.Files.createTempDirectory("graft-ocr")
    d.toFile.deleteOnExit()
    d
  }

  override def recognize(media: PageMedia, passIdx: Int): String = {
    val img = TesseractCliOcr.preprocess(render(media.baseText), passIdx)
    val png = workDir.resolve(s"page_${Thread.currentThread().getId}.png")
    try {
      javax.imageio.ImageIO.write(img, "png", png.toFile)
      val cmd = Seq(binary, png.toString, "stdout", "-l", langs, "--psm", "6")
      val proc = new ProcessBuilder(cmd: _*)
        .redirectErrorStream(false)
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start()
      val out = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val code = proc.waitFor()
      require(code == 0, s"tesseract exited $code for $png")
      out
    } finally {
      // delete per page, not per JVM: a long-lived executor runs many
      // partitions — deleteOnExit on a NON-EMPTY dir is a no-op, so
      // leaving pngs behind would leak /tmp for the life of the host
      java.nio.file.Files.deleteIfExists(png)
      ()
    }
  }

  /** Sandbox rasterizer: headless AWT text render (black on white, wrapped
    * at 80 chars). Prod replaces this with the MediaStore's page pixels. */
  private def render(text: String): BufferedImage = {
    val lines = text.grouped(80).toSeq match {
      case Nil => Seq("")
      case ls => ls
    }
    val img = new BufferedImage(1000, 40 + 28 * lines.length,
      BufferedImage.TYPE_BYTE_GRAY)
    val g = img.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_TEXT_ANTIALIASING,
      java.awt.RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
    g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, img.getWidth, img.getHeight)
    g.setColor(java.awt.Color.BLACK)
    g.setFont(new java.awt.Font(java.awt.Font.MONOSPACED, java.awt.Font.PLAIN, 20))
    lines.zipWithIndex.foreach { case (l, i) => g.drawString(l, 20, 30 + 28 * i) }
    g.dispose()
    img
  }
}

object TesseractCliOcr {
  import java.awt.image.BufferedImage

  /** True iff the tesseract binary is on PATH (or `binary` is a path to an
    * executable) — the gate for the integration spec/script. */
  def available(binary: String = "tesseract"): Boolean = {
    val f = new java.io.File(binary)
    if (f.isAbsolute) f.canExecute
    else sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .exists(p => new java.io.File(p, binary).canExecute)
  }

  /** The reference's per-pass preprocessing (`main.py:219-227`), on gray
    * pixels; each pass transforms the ORIGINAL image (not cumulative). */
  private[media] def preprocess(img: BufferedImage, passIdx: Int): BufferedImage =
    passIdx match {
      case 1 => mapPixels(img, (px, _, _) => if (px(1)(1) > 128) 255 else 0)
      case 2 => mapPixels(img, (px, _, _) => median9(px))
      case 3 => mapPixels(img, (px, _, _) => sharpen9(px))
      case _ => img
    }

  /** 3×3 neighborhood map over a grayscale image (edge-clamped). `f` gets
    * the row-major neighborhood — nb(1)(1) is the center pixel. */
  private def mapPixels(src: BufferedImage,
      f: (Array[Array[Int]], Int, Int) => Int): BufferedImage = {
    val w = src.getWidth; val h = src.getHeight
    val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val in = src.getRaster; val o = out.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        o.setSample(x, y, 0, f(neighborhood(in, x, y, w, h), x, y))
        x += 1
      }
      y += 1
    }
    out
  }

  private def neighborhood(r: java.awt.image.Raster, x: Int, y: Int,
      w: Int, h: Int): Array[Array[Int]] = {
    val nb = Array.ofDim[Int](3, 3)
    var dy = -1
    while (dy <= 1) {
      var dx = -1
      while (dx <= 1) {
        val sx = math.min(w - 1, math.max(0, x + dx))
        val sy = math.min(h - 1, math.max(0, y + dy))
        nb(dy + 1)(dx + 1) = r.getSample(sx, sy, 0)
        dx += 1
      }
      dy += 1
    }
    nb
  }

  private def median9(nb: Array[Array[Int]]): Int = {
    val vs = nb.flatten.sorted
    vs(4)
  }

  /** PIL SHARPEN kernel (the reference's `ImageFilter.SHARPEN`):
    * center 16, edges -1/-2 pattern, divisor 8 — approximated with the
    * standard 3×3 sharpen (center 12, others -1, divisor 4) then clamped;
    * OCR output equivalence is what the integration test asserts. */
  private def sharpen9(nb: Array[Array[Int]]): Int = {
    var sum = 12 * nb(1)(1)
    var dy = 0
    while (dy < 3) {
      var dx = 0
      while (dx < 3) {
        if (!(dx == 1 && dy == 1)) sum -= nb(dy)(dx)
        dx += 1
      }
      dy += 1
    }
    math.min(255, math.max(0, sum / 4))
  }
}
