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

  test("extraction pipeline: both branches reuse ONE range-shuffle of the input") {
    val ds = Extract.extractDS(spark, Fixtures.testDocsDS(spark),
      conf = ExtractConf(numPartitions = 4))
    ds.collect() // drive THIS queryExecution so AQE finalizes its stages
    val plan = ds.queryExecution.executedPlan.toString
    // The union's two branches both consume repartitionByRange(doc_id); AQE
    // must materialize the range shuffle once and feed the skew branch from
    // a ReusedExchange of it (verified: ReusedExchange → rangepartitioning).
    assert("ReusedExchange.*rangepartitioning".r.findFirstIn(plan).isDefined,
      s"range exchange not reused:\n$plan")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() == Fixtures.testDocs.length)
  }
}
