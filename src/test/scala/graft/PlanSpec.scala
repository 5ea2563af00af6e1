package graft

import graft.pipeline.{Extract, ExtractConf, Fixtures}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the "is this the plan you'd want at 100 TB"
  * checks: predicate pushdown reaches the parquet scan, column pruning
  * shrinks ReadSchema, small dims broadcast, and the extraction pipeline's
  * two branches REUSE one range-shuffle exchange instead of scanning twice.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("predicate pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 100).select(col("doc_id"), col("lang"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)"),
      s"filter not pushed:\n$plan")
  }

  test("column pruning: scan reads only referenced columns") {
    val df = Queries.all("q_filter_nonempty")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("lang") && readSchema.contains("text"))
    assert(!readSchema.contains("source") && !readSchema.contains("n_chars"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("star-join query broadcasts the dimension tables") {
    val df = Queries.all("q2_revenue_by_nation")(spark, sf)
    df.write.format("noop").mode("overwrite").save() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("semi/anti joins plan as left_semi / left_anti (no row explosion)") {
    val semi = Queries.all("q3_semi_join")(spark, sf)
    val anti = Queries.all("q4_anti_join")(spark, sf)
    assert(semi.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(anti.queryExecution.optimizedPlan.toString.contains("LeftAnti"))
  }

  test("extraction common path is a single stage: zero shuffles source→sink") {
    // corpus without mega docs → no skew branch at all
    val spark2 = spark
    import spark2.implicits._
    val small = spark.createDataset((0 until 48).map(Fixtures.doc))
    val ds = Extract.extractDS(spark, small, conf = ExtractConf(numPartitions = 4))
    ds.collect()
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"common path must not shuffle:\n$plan")
  }

  test("skew branch: only mega docs shuffle, spread by (doc_id, salt)") {
    val ds = Extract.extractDS(spark, Fixtures.testDocsDS(spark),
      conf = ExtractConf(numPartitions = 4))
    ds.collect()
    val plan = ds.queryExecution.executedPlan.toString
    // exactly the salted-branch exchanges: the (doc_id, salt) spread and
    // the per-doc merge; NO full-corpus exchange
    assert(plan.contains("hashpartitioning(doc_id"), s"no salted spread:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"unexpected full shuffle:\n$plan")
  }

  test("skew probe prunes to doc_id + spans.{kind,media_ref} — text never read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString
    Fixtures.testDocsDS(spark).toDF().write.mode("overwrite").parquet(s"$tmp/docs")
    val docs = graft.sources.Io().readDocs(spark, s"$tmp/docs")
    import org.apache.spark.sql.functions.col
    val probe = docs.toDF()
      .select(col("doc_id"), col("spans.kind"), col("spans.media_ref"))
    val plan = probe.queryExecution.executedPlan.toString
    val rs = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs.contains("spans:array<struct<kind:string,media_ref:string>>"),
      s"nested pruning failed — probe would read the text payload: $rs")
    assert(!rs.contains("text"), s"text column not pruned: $rs")
  }

  test("mega re-read pushes the doc_id IN filter to the parquet scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan").toString
    Fixtures.testDocsDS(spark).toDF().write.mode("overwrite").parquet(s"$tmp/docs")
    val docs = graft.sources.Io().readDocs(spark, s"$tmp/docs")
    val ds = Extract.extractDS(spark, docs, conf = ExtractConf(numPartitions = 4))
    ds.collect()
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(doc_id"),
      s"mega IN-filter not pushed to scan:\n${plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")}")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() == Fixtures.testDocs.length)
  }
}
