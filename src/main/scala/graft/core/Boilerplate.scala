package graft.core

import scala.collection.mutable

/** HTML boilerplate stripping — the north-rule capability beyond the
  * reference surface (SURVEY.md §7.6; the reference never parses HTML).
  * Specified from published public work: Kohlschütter, Fankhauser, Nejdl,
  * "Boilerplate Detection Using Shallow Text Features", WSDM 2010
  * (Boilerpipe), using the densitometric `NumWordsRulesClassifier` decision
  * tree published in the Boilerpipe source.
  *
  * Deterministic pure function: lightweight tag tokenizer → text blocks at
  * block-level tag boundaries → per-block number-of-words, link density
  * (anchor-words / words) and text density (words per 80-char wrapped line)
  * → classify each block CONTENT/BOILERPLATE from (prev, curr, next) block
  * features → concatenate content-block text in document order.
  *
  * No external parser; handles the HTML subset our corpus generator emits
  * plus common real-world structure (scripts/styles/comments skipped,
  * basic entities decoded). Not a full HTML5 tree builder by design — block
  * segmentation only needs tag boundaries, not the DOM.
  */
object Boilerplate {

  private val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "dd", "div",
    "dl", "dt", "fieldset", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "html", "li", "main", "nav", "ol", "p",
    "pre", "section", "table", "tbody", "td", "tfoot", "th", "thead", "title",
    "tr", "ul")

  // Content inside these elements is never text.
  private val SkipTags: Set[String] = Set("script", "style", "noscript", "head", "title")

  final case class Block(text: String, numWords: Int, linkDensity: Double, textDensity: Double)

  /** Tokenize and segment into blocks with word/anchor-word counts. */
  private[core] def blocks(html: String): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    val text = new java.lang.StringBuilder
    var words = 0
    var anchorWords = 0
    var anchorDepth = 0
    var skipDepth = 0

    def flush(): Unit = {
      val t = text.toString.trim
      if (t.nonEmpty && words > 0) {
        val ld = if (words == 0) 0.0 else anchorWords.toDouble / words
        // Boilerpipe text density: words per line when greedily wrapped at
        // 80 chars; blocks shorter than one line count as one line.
        val lines = math.max(1, wrappedLines(t))
        out += Block(t, words, ld, words.toDouble / lines)
      }
      text.setLength(0); words = 0; anchorWords = 0
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val e = html.indexOf('>', i + 1)
          if (e < 0) { i = n }
          else {
            val raw = html.substring(i + 1, e).trim
            val closing = raw.startsWith("/")
            val name = raw.dropWhile(_ == '/').takeWhile(ch => ch.isLetterOrDigit).toLowerCase
            if (SkipTags.contains(name)) {
              if (closing) skipDepth = math.max(0, skipDepth - 1)
              else if (!raw.endsWith("/")) skipDepth += 1
            } else if (name == "a") {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1) else anchorDepth += 1
            } else if (BlockTags.contains(name)) {
              flush()
            }
            i = e + 1
          }
        }
      } else {
        // text run up to next tag
        val e = html.indexOf('<', i)
        val end = if (e < 0) n else e
        if (skipDepth == 0) {
          val seg = decodeEntities(html.substring(i, end))
          val segWords = seg.split("[ \\t\\n\\r\\f\\x0B]+").count(_.nonEmpty)
          if (segWords > 0) {
            if (text.length() > 0) text.append(' ')
            text.append(seg.trim.replaceAll("[ \\t\\n\\r\\f\\x0B]+", " "))
            words += segWords
            if (anchorDepth > 0) anchorWords += segWords
          }
        }
        i = end
      }
    }
    flush()
    out.result()
  }

  private def wrappedLines(t: String): Int = {
    var lines = 1
    var col = 0
    t.split(' ').foreach { w =>
      val add = if (col == 0) w.length else w.length + 1
      if (col + add > 80) { lines += 1; col = w.length }
      else col += add
    }
    lines
  }

  private def decodeEntities(s: String): String =
    s.replace("&nbsp;", " ").replace("&amp;", "&").replace("&lt;", "<")
      .replace("&gt;", ">").replace("&quot;", "\"").replace("&#39;", "'")

  /** Boilerpipe `NumWordsRulesClassifier` (published decision tree) over
    * (prev, curr, next) blocks. Returns true iff `curr` is content. */
  private[core] def isContent(prev: Option[Block], curr: Block, next: Option[Block]): Boolean = {
    val prevWords = prev.map(_.numWords).getOrElse(0)
    val prevLd    = prev.map(_.linkDensity).getOrElse(0.0)
    val nextWords = next.map(_.numWords).getOrElse(0)
    if (curr.linkDensity > 0.333333) false
    else if (prevLd <= 0.555556) {
      if (curr.numWords <= 16) {
        if (nextWords <= 15) prevWords > 4
        else true
      } else true
    } else {
      if (curr.numWords <= 40) nextWords > 17
      else true
    }
  }

  /** Main-content extraction: content blocks' text in document order, joined
    * with "\n". Downstream `TextClean.clean` flattens the newlines to spaces
    * (reference sanitizer semantics), so block order is the only thing that
    * survives — which is exactly the invariant (span order). */
  def extract(html: String): String = {
    val bs = blocks(html)
    val kept = mutable.ArrayBuffer.empty[String]
    var idx = 0
    while (idx < bs.length) {
      val prev = if (idx > 0) Some(bs(idx - 1)) else None
      val next = if (idx < bs.length - 1) Some(bs(idx + 1)) else None
      if (isContent(prev, bs(idx), next)) kept += bs(idx).text
      idx += 1
    }
    kept.mkString("\n")
  }
}
