package graft.pipeline

import graft.core.Hash64
import graft.model.{Doc, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic corpus generator (FIXTURES.md). Everything derives
  * from the doc index via `Hash64` — no RNG state, no wall clock — so any
  * scale regenerates bit-identically and the `local[8]` vs `local[32]` bench
  * levels read identical data.
  *
  * Doc id format `doc%08d`; class = idx % 8 (FIXTURES.md §3):
  *   0 text-plain | 1 text-dirty | 2 html | 3 pdf-4pp (p3 empty) | 4 image
  *   5 interleaved (text,image,html,pdf2pp) | 6 lang-mix | 7 consensus-noisy
  * Mega-docs: idx >= 1000 && idx % 1000 == 0 → single 256-page pdf span
  * (the skew/salting path); idx % 101 == 100 → 32-page pdf (moderate skew).
  * Page counts must match `DeterministicMediaStore.pageCount`.
  */
object Fixtures {

  val TestDocIds: Seq[Int] = (0 until 48) ++ Seq(1000, 2000)

  def docId(idx: Int): String = f"doc$idx%08d"

  private def ref(idx: Int, offset: Int): String = s"mem://${docId(idx)}/$offset"

  private val langSeeds = Vector(
    // rotating keyword seeds for class 6 (FIXTURES.md): es, fr, en, de,
    // a tie case, and an all-zero case (→ spanish default, main.py:156-158)
    "contrato arrendamiento fecha importe mensual firmado", // spanish-ish
    "contrat bailleur locataire mois signature annexe",     // french-ish
    "lease tenant landlord month contract signed year",     // english-ish
    "mietvertrag vermieter mieter monat jahr datum",        // german-ish
    "zz contrato zz lease zz",                              // tie-ish → insertion order decides
    "qqq zzz 12345 xxxx")                                   // all-zero → spanish

  private def htmlBody(idx: Int): String = {
    val h = Hash64(s"html#$idx")
    val p1 = s"This agreement describes the monthly payment schedule and the deposit terms agreed " +
      s"by both parties for property number ${((h % 9000) + 9000) % 9000 + 1000}. The tenant shall remit payment on the first business day."
    val p2 = s"Renewal notice must be delivered in writing at least thirty days before the term ends. " +
      s"Clause ${(((h >> 8) % 40) + 40) % 40 + 1} covers early termination and the handling of the security deposit."
    s"""<html><head><title>Lease ${docId(idx)}</title><style>body{font:12px}</style></head>
       |<body>
       |<nav><ul><li><a href="/">Home</a></li><li><a href="/docs">Docs</a></li><li><a href="/contact">Contact</a></li></ul></nav>
       |<div class="promo"><a href="/signup">Sign up now</a> <a href="/offer">Special offer</a></div>
       |<article><p>$p1</p><p>$p2</p></article>
       |<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a> copyright</footer>
       |</body></html>""".stripMargin
  }

  private def dirtyText(idx: Int): String = {
    // Exercises the full sanitizer: quotes, backslashes, tab/newline/bell
    // control chars, a euro sign (non-ASCII -> space), zero-width U+200B
    // (removed -> neighbors join), CJK (spaced out), trailing double spaces.
    val h = Hash64(s"dirty#$idx")
    "Amount\tdue:\t\"" + ((((h % 900) + 900) % 900) + 100) + "\"\u20ac  \\path\\to\\file\n" +
      "line\u0007two \u200bzero\u200bwidth\u200b joined \u4e2d\u6587 chars and  trailing  "
  }

  private def plainText(idx: Int): String = {
    val h = Hash64(s"plain#$idx")
    s"Invoice ${(((h % 90000) + 90000) % 90000) + 10000}  issued on day ${(((h >> 7) % 28) + 28) % 28 + 1}   total amount ${(((h >> 13) % 999) + 999) % 999 + 1}.00 USD  "
  }

  def doc(idx: Int): Doc = {
    val id = docId(idx)
    if (idx >= 1000 && idx % 1000 == 0) {
      // mega-doc: one 256-page pdf span
      Doc(id, Seq(Span("pdf", "", ref(idx, 0), 0)))
    } else if (idx % 101 == 100) {
      Doc(id, Seq(Span("pdf", "", ref(idx, 0), 0)))
    } else (idx % 8) match {
      case 0 => Doc(id, Seq(Span("text", plainText(idx), "", 0)))
      case 1 => Doc(id, Seq(Span("text", dirtyText(idx), "", 0)))
      case 2 => Doc(id, Seq(Span("html", htmlBody(idx), "", 0)))
      case 3 => Doc(id, Seq(Span("pdf", "", ref(idx, 0), 0)))
      case 4 => Doc(id, Seq(Span("image", "", ref(idx, 0), 0)))
      case 5 => Doc(id, Seq(
        Span("text", plainText(idx), "", 0),
        Span("image", "", ref(idx, 1), 1),
        Span("html", htmlBody(idx), "", 2),
        Span("pdf", "", ref(idx, 3), 3)))
      case 6 => Doc(id, Seq(Span("text", langSeeds((idx / 8) % langSeeds.length), "", 0)))
      case 7 => Doc(id, Seq(Span("image", "", ref(idx, 0), 0)))
      case _ => throw new IllegalStateException
    }
  }

  /** The 50-doc test corpus (48 class docs + 2 mega). */
  def testDocs: Seq[Doc] = TestDocIds.map(doc)

  /** Parameterized bench corpus: indexes 1..numDocs (so multiples of 1000
    * give a deterministic ~0.1% mega-doc fraction and idx%101==100 a ~1%
    * moderate-skew fraction, FIXTURES.md §5). */
  def benchDocs(spark: SparkSession, numDocs: Int, numPartitions: Int): Dataset[Doc] = {
    import spark.implicits._
    spark.range(1, numDocs + 1, 1, numPartitions)
      .map(i => doc(i.toInt))
  }

  def testDocsDS(spark: SparkSession): Dataset[Doc] = {
    import spark.implicits._
    spark.createDataset(testDocs)
  }
}
