package graft.pipeline

import graft.SparkTestBase
import graft.model.{Doc, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Boundary robustness: real corpora carry nulls — the pipeline must
  * degrade per-doc, never fail a task. */
class NullSafetySpec extends AnyFunSuite {

  test("null spans / null fields / ref-less media degrade gracefully") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq(
      Doc("d_null_spans", null),
      Doc("d_null_span_elem", Seq(null, Span("text", "ok text", "", 1))),
      Doc("d_null_kind", Seq(Span(null, "treated as text", "", 0))),
      Doc("d_null_text", Seq(Span("text", null, "", 0))),
      Doc("d_refless_pdf", Seq(Span("pdf", "", null, 0))),
      Doc("d_refless_image", Seq(Span("image", "", "", 0))))
    val out = Extract.extractDS(spark, spark.createDataset(docs),
        conf = ExtractConf(numPartitions = 2))
      .collect().map(d => d.doc_id -> d).toMap

    assert(out.size == docs.size)
    assert(out("d_null_spans").spans.isEmpty)
    assert(out("d_null_spans").confidence == 0.0) // main.py:546 else-branch
    assert(out("d_null_span_elem").spans.map(_.text) == Seq("ok text"))
    assert(out("d_null_kind").spans.map(_.text) == Seq("treated as text"))
    assert(out("d_null_text").spans.isEmpty)      // null text → clean "" → dropped
    assert(out("d_refless_pdf").spans.isEmpty)    // no media → empty page, dropped
    assert(out("d_refless_image").spans.isEmpty)
    // physical page still counted → confidence 100 for the degraded docs
    assert(out("d_refless_pdf").confidence == 100.0)
  }
}
