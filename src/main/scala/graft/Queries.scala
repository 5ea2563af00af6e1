package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query registry. Grows one entry per operator; split from
  * SparkEntry so the contract file stays stable. */
object Queries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_nonempty" -> ((s, dir) => {
      // empty-page filter analogue (main.py:367): drop docs whose trimmed
      // text is empty, count per language. Pushed-down scan: only text+lang.
      s.read.parquet(t(dir, "documents"))
        .filter(length(trim(col("text"))) > 0)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_filter_nonempty" ->
      """SELECT lang, count(*) AS n_docs
        |FROM documents WHERE length(trim(text)) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
