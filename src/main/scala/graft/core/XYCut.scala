package graft.core

/** Recursive XY-cut page segmentation — the north-rule PDF layout capability
  * (SURVEY.md §7.6; the reference rasterizes+OCRs PDFs, `main.py:350-355`,
  * and never does layout analysis). Specified from the published algorithm:
  * Nagy & Seth, "Hierarchical representation of optically scanned documents",
  * ICPR 1984 (recursive X-Y cut).
  *
  * Input: a page's text blocks with axis-aligned bounding boxes (from the
  * fixture `MediaStore` in the sandbox; from a real PDF text extractor in
  * prod). Output: blocks in reading order.
  *
  * Algorithm: project block extents onto each axis; find the widest
  * whitespace valley (gap between the sorted merged intervals) on each axis;
  * cut along the axis with the wider gap (ties prefer the horizontal cut,
  * i.e. splitting top/bottom) provided it exceeds `minGap`; recurse into the
  * two sides (side order: top before bottom, left before right). A region
  * with no admissible gap is a leaf: its blocks are ordered by (y, x).
  * Deterministic for any input.
  */
object XYCut {

  final case class Box(x: Int, y: Int, w: Int, h: Int, text: String) {
    def x2: Int = x + w
    def y2: Int = y + h
  }

  /** Largest gap between merged occupied intervals; returns (gapStart, gapLen)
    * with gapLen 0 if none. */
  private def largestGap(iv: Seq[(Int, Int)]): (Int, Int) = {
    val sorted = iv.sortBy(_._1)
    var bestStart = 0
    var bestLen = 0
    var curEnd = sorted.head._2
    sorted.tail.foreach { case (s, e) =>
      if (s > curEnd && s - curEnd > bestLen) { bestStart = curEnd; bestLen = s - curEnd }
      if (e > curEnd) curEnd = e
    }
    (bestStart, bestLen)
  }

  def order(blocks: Seq[Box], minGap: Int = 8): Seq[Box] = {
    if (blocks.length <= 1) return blocks
    val (gy, gyLen) = largestGap(blocks.map(b => (b.y, b.y2)))
    val (gx, gxLen) = largestGap(blocks.map(b => (b.x, b.x2)))
    if (gyLen >= gxLen && gyLen >= minGap) {
      val cut = gy + gyLen / 2
      val (top, bottom) = blocks.partition(_.y2 <= cut)
      order(top, minGap) ++ order(bottom, minGap)
    } else if (gxLen > gyLen && gxLen >= minGap) {
      val cut = gx + gxLen / 2
      val (left, right) = blocks.partition(_.x2 <= cut)
      order(left, minGap) ++ order(right, minGap)
    } else {
      blocks.sortBy(b => (b.y, b.x))
    }
  }

  /** Reading-order page text: ordered block texts joined with "\n". */
  def readingOrder(blocks: Seq[Box], minGap: Int = 8): String =
    order(blocks, minGap).map(_.text).mkString("\n")
}
