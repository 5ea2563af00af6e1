package graft.pipeline

import graft.SparkTestBase
import graft.model.Doc
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** North-rule resumability (SURVEY.md §5.5): run the pipeline on half the
  * corpus, then rerun over the full corpus into the same output — only the
  * missing doc_ids may be reprocessed (lineage rows prove it) and the final
  * table equals a fresh full run. A third run must process zero docs
  * (idempotent no-op). */
class ResumeSpec extends AnyFunSuite {

  test("idempotent resume: only missing doc_ids reprocessed; final table complete") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-resume").toFile.getAbsolutePath
    val out = s"$tmp/docs_extracted"

    val all: Seq[Doc] = Fixtures.testDocs
    val (firstHalf, _) = all.splitAt(all.length / 2)
    val conf1 = ExtractConf(level = "medium", numPartitions = 4, runId = "run-1")

    val s1 = Extract.run(spark, spark.createDataset(firstHalf), out, conf1)
    assert(s1.docsProcessed == firstHalf.length)

    val conf2 = conf1.copy(runId = "run-2")
    val s2 = Extract.run(spark, spark.createDataset(all), out, conf2)
    assert(s2.docsProcessed == all.length - firstHalf.length,
      s"resume must process only the missing docs, processed ${s2.docsProcessed}")
    // lineage rows prove which partitions did work in run-2
    assert(s2.lineage.forall(_.run_id == "run-2"))
    assert(s2.lineage.map(_.doc_count).sum == all.length - firstHalf.length)

    val conf3 = conf1.copy(runId = "run-3")
    val s3 = Extract.run(spark, spark.createDataset(all), out, conf3)
    assert(s3.docsProcessed == 0, "third run must be a no-op")

    // final table equals the in-memory sequential golden for every doc
    val finalRows = spark.read.parquet(out).as[graft.model.DocOut]
      .collect().map(d => d.doc_id -> d).toMap
    assert(finalRows.keySet == all.map(_.doc_id).toSet)
    all.foreach { d =>
      val seq = ExtractKernel.extractWhole(d, graft.media.DeterministicMediaStore,
        graft.media.DeterministicOcr, conf1)
      assert(finalRows(d.doc_id).spans == seq.spans, s"spans differ for ${d.doc_id}")
    }

    // lineage table persisted per run
    val lineage = spark.read.parquet(s"${out}_lineage")
    assert(lineage.count() == (s1.lineage.size + s2.lineage.size + s3.lineage.size))
  }

  test("crash resume: committed files without _SUCCESS converge to the exact golden table") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-crash").toFile.getAbsolutePath
    val out = s"$tmp/docs_extracted"
    val all: Seq[Doc] = Fixtures.testDocs
    val conf1 = ExtractConf(level = "medium", numPartitions = 4, runId = "run-1")
    val (firstHalf, rest) = all.splitAt(all.length / 2)
    Extract.run(spark, spark.createDataset(firstHalf), out, conf1)

    // Simulate a job that DIED mid-write: some of the remaining docs'
    // output files are visible (Spark task-commit renames files whole, so
    // any visible .parquet contains only complete rows) but the job never
    // reached its _SUCCESS job-commit marker. committedIds treats visible
    // files as committed — this pins that the rerun neither duplicates the
    // crashed job's docs nor loses the rest (round-2 verdict item 6).
    val crashed = rest.take(5).map(d => ExtractKernel.extractWhole(d,
      graft.media.DeterministicMediaStore, graft.media.DeterministicOcr, conf1))
    spark.createDataset(crashed).write.mode("append").parquet(out)
    val succ = new java.io.File(out, "_SUCCESS")
    assert(succ.exists, "append should have rewritten the marker")
    assert(succ.delete(), "simulated crash: remove the job-commit marker")

    val s2 = Extract.run(spark, spark.createDataset(all), out,
      conf1.copy(runId = "run-2"))
    assert(s2.docsProcessed == all.length - firstHalf.length - 5,
      s"rerun must skip the crashed job's visible docs, processed ${s2.docsProcessed}")

    val finalRows = spark.read.parquet(out).as[graft.model.DocOut].collect()
    assert(finalRows.length == all.length, "no duplicates, no losses")
    val byId = finalRows.map(d => d.doc_id -> d).toMap
    all.foreach { d =>
      val seq = ExtractKernel.extractWhole(d, graft.media.DeterministicMediaStore,
        graft.media.DeterministicOcr, conf1)
      assert(byId(d.doc_id).spans == seq.spans, s"spans differ for ${d.doc_id}")
    }
  }
}
