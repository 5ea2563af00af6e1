package graft.pipeline

import graft.SparkTestBase
import graft.model.DocOut
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** THE north-rule invariant (BASELINE.json `input_hint`): exact
  * span-sequence equality `(kind, text, media_ref, order)` per doc — plus
  * exact metadata — between the distributed Spark pipeline and goldens
  * produced by executing the REFERENCE's own pure functions
  * (`/root/reference/main.py` `clean_text_for_json` / `get_consensus_text` /
  * `calculate_confidence` / `detect_language_from_text`) with the
  * reference's orchestration over the same raw page passes
  * (scripts/gen_golden.py). Covers all 4 verification levels and the
  * mega-doc salting/reassembly path (2×256-page docs are in the corpus).
  */
class GoldenPipelineSpec extends AnyFunSuite {

  private case class Golden(
      docId: String, confidence: Double, lang: String, totalPages: Int,
      charCount: Long, spans: Seq[(String, String, String, Int)])

  private def loadGolden(level: String): Map[String, Golden] = {
    val src = Source.fromResource(s"golden_$level.txt")
    val lines = try src.getLines().toVector finally src.close()
    val docs = Vector.newBuilder[Golden]
    var cur: Golden = null
    lines.foreach { line =>
      val f = line.split("\t", -1)
      f(0) match {
        case "D" =>
          if (cur != null) docs += cur
          cur = Golden(f(1), f(2).toDouble, f(3), f(4).toInt, f(5).toLong, Vector.empty)
        case "S" =>
          cur = cur.copy(spans = cur.spans :+ ((f(1), f(4), f(3), f(2).toInt)))
      }
    }
    if (cur != null) docs += cur
    docs.result().map(g => g.docId -> g).toMap
  }

  private def runLevel(level: String): Map[String, DocOut] = {
    val spark = SparkTestBase.spark
    val out = Extract.extractDS(spark, Fixtures.testDocsDS(spark),
      conf = ExtractConf(level = level, numPartitions = 4))
    out.collect().map(d => d.doc_id -> d).toMap
  }

  for (level <- Seq("low", "medium", "high", "ultra")) {
    test(s"span-sequence equality vs reference goldens at level=$level") {
      val golden = loadGolden(level)
      val got = runLevel(level)
      assert(got.keySet == golden.keySet, "doc id sets differ")
      golden.foreach { case (id, g) =>
        val d = got(id)
        val gotSpans = d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
        assert(gotSpans == g.spans, s"span sequence mismatch for $id at $level")
        assert(d.detected_language == g.lang, s"language mismatch for $id")
        assert(d.total_pages == g.totalPages, s"total_pages mismatch for $id")
        assert(d.character_count == g.charCount, s"character_count mismatch for $id")
        assert(math.abs(d.confidence - g.confidence) < 1e-9,
          s"confidence mismatch for $id: ${d.confidence} vs ${g.confidence}")
      }
    }
  }

  test("mega-docs took the salted path and reassembled in order") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val mega = Fixtures.testDocsDS(spark).filter(_.doc_id == "doc00001000")
    val conf = ExtractConf(level = "medium", numPartitions = 4)
    // planner must split 256 pages into 16-page units
    val units = ExtractKernel.plan(mega.head(), graft.media.DeterministicMediaStore, conf)
    assert(units.length == 16)
    assert(units.forall(_.nsalts == 16))
    // distributed output must equal the sequential whole-doc kernel
    val seq = ExtractKernel.extractWhole(mega.head(),
      graft.media.DeterministicMediaStore, graft.media.DeterministicOcr, conf)
    val dist = Extract.extractDS(spark, mega, conf = conf).collect().head
    assert(dist.spans == seq.spans)
    assert(dist.confidence == seq.confidence)
    assert(dist.spans.map(_.offset) == dist.spans.indices)
  }
}
