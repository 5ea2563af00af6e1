package graft.pipeline

import graft.SparkTestBase
import graft.media.{DeterministicMediaStore, DeterministicOcr}
import org.scalatest.funsuite.AnyFunSuite

/** Distributed == sequential over a WIDER corpus than the 50 golden docs:
  * 400 generator docs spanning all classes plus the mega/moderate skew ids,
  * at two levels — any partitioning/salting/merge-order bug that slips past
  * the fixtures shows up here as a span or confidence diff. */
class EquivalenceSpec extends AnyFunSuite {

  for (level <- Seq("low", "ultra")) {
    test(s"extractDS == extractWhole for 400-doc corpus at level=$level") {
      val spark = SparkTestBase.spark
      import spark.implicits._
      val idxs = (1 to 360) ++ Seq(1000, 2000, 3000, 100, 201, 302, 403, 504)
      val docs = idxs.distinct.map(Fixtures.doc)
      val conf = ExtractConf(level = level, numPartitions = 8)
      val dist = Extract.extractDS(spark, spark.createDataset(docs), conf = conf)
        .collect().map(d => d.doc_id -> d).toMap
      assert(dist.size == docs.size)
      docs.foreach { d =>
        val seq = ExtractKernel.extractWhole(d, DeterministicMediaStore, DeterministicOcr, conf)
        val g = dist(d.doc_id)
        assert(g.spans == seq.spans, s"spans diff for ${d.doc_id} at $level")
        assert(g.confidence == seq.confidence, s"confidence diff for ${d.doc_id}")
        assert(g.detected_language == seq.detected_language)
        assert(g.character_count == seq.character_count)
      }
    }
  }
}
