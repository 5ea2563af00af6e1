package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-pinned JSONL ingest: valid lines parse against the pinned
  * schema, corrupt lines are quarantined with the raw text preserved
  * (auditable — counts must always reconcile: good + corrupt = input). */
class JsonlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("corrupt lines quarantined with raw text; good lines parse; counts reconcile") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "n_chars": 11}""",
      """{"doc_id": 2, "text": "quoted \" and unicode é", "n_chars": 20}""",
      """{"doc_id": 3 "text": "missing comma"}""", // malformed
      """not json at all""",
      """{"doc_id": 4, "text": null, "n_chars": 0}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("n_chars", LongType)))
    val r = Jsonl.read(spark, s"$dir/in.json", schema)
    val good = r.good.collect().map(x => (x.getLong(0), Option(x.getString(1)))).toMap
    assert(good == Map(1L -> Some("hello world"),
      2L -> Some("quoted \" and unicode é"), 4L -> None), good)
    val corrupt = r.corrupt.collect().map(_.getString(0)).toSet
    assert(corrupt == Set(lines(2), lines(3)), s"raw corrupt lines must be preserved: $corrupt")
    assert(good.size + corrupt.size == lines.size, "every input line must be accounted for")
  }
}
