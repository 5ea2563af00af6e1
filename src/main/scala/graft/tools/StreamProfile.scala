package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch instrumentation: phase timing of the streaming contract-query
  * shape (collect → start → per-batch → stop → read-back) to locate the
  * residual cost. Usage: runMain graft.tools.StreamProfile [sfDir] */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[sp] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round (shufflePartitions=4 for the stream) ---")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"))
      val aug = d.unionAll(d.select(col("doc_id") + lit(1000000L), col("text"), col("source")))
        .toDF("doc_id", "text", "source")
      val rows = t("collect") {
        aug.select(col("doc_id").cast("long"), col("text")).as[(Long, String)].collect()
      }
      val (orig, dups) = rows.partition(_._1 < 1000000L)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val sink = s"sp_sink_${round}_${System.nanoTime()}"
      val q = t("start") {
        graft.streaming.StreamOps.nearDupStream(in.toDS())
          .toDF("doc_id", "base")
          .writeStream.outputMode("append").format("memory").queryName(sink).start()
      }
      try {
        t("batch1") { in.addData(orig.toSeq); q.processAllAvailable() }
        t("batch2") { in.addData(dups.toSeq); q.processAllAvailable() }
      } finally t("stop") { q.stop() }
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      t("readback") {
        val cands = spark.table(sink).groupBy(col("doc_id")).agg(min(col("base")).as("dup_of"))
        aug.select(col("doc_id"))
          .join(cands, Seq("doc_id"), "left")
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
