package graft

import graft.pipeline.{Extract, ExtractConf, Fixtures}
import org.apache.spark.sql.SparkSession

/** Round benchmark (driver contract: ONE JSON line to stdout).
  *
  * Part 1 — the BASELINE.json metric: documents/sec extraction throughput
  * over the deterministic synthetic interleaved corpus (FIXTURES.md §5,
  * includes 0.1% 256-page mega-docs + ~1% 32-page docs so skew handling is
  * exercised), measured at parallelism N=8 and 4N=32 (`local[k]` is the
  * sandbox proxy for k executors — no real cluster here; see BASELINE.md).
  * Scaling efficiency = (docs/s@4N / docs/s@N) / 4. Each session runs a
  * warmup slice first so JIT state doesn't bias either level.
  *
  * Part 2 — per-query wall seconds for every registry query on
  * `SPARK_GRAFT_SF_DIR`, forced through a noop sink (count() would let
  * Catalyst prune the very columns under test).
  */
object Bench {

  private def session(cores: Int, shufflePartitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def extractionRate(cores: Int, numDocs: Int, warmupDocs: Int): Double = {
    val spark = session(cores, math.max(cores, 32))
    try {
      val conf = ExtractConf(level = "medium", numPartitions = 128)
      def run(n: Int): Unit =
        Extract.extractDS(spark, Fixtures.benchDocs(spark, n, 128), conf = conf)
          .write.format("noop").mode("overwrite").save()
      run(warmupDocs)
      val t0 = System.nanoTime()
      run(numDocs)
      numDocs / ((System.nanoTime() - t0) / 1e9)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val numDocs = sys.env.getOrElse("GRAFT_BENCH_DOCS", "40000").toInt
    val nLow = 8
    val nHigh = 32

    val rateLow = extractionRate(nLow, numDocs, numDocs / 10)
    val rateHigh = extractionRate(nHigh, numDocs, numDocs / 10)
    val efficiency = (rateHigh / rateLow) / (nHigh.toDouble / nLow)

    // per-query timings
    val spark = session(cpus, cpus)
    val timings = Queries.all.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    spark.stop()

    val qs = timings.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val totalSec = timings.filter(_._2 >= 0).map(_._2).sum
    println(
      s"""{"metric":"documents/sec extraction throughput (interleaved corpus, medium level, local[$nHigh] vs local[$nLow])",""" +
      s""""value":${f"$rateHigh%.1f"},"unit":"docs/sec",""" +
      s""""scaling":{"n_cores":$nLow,"docs_per_sec_n":${f"$rateLow%.1f"},""" +
      s""""four_n_cores":$nHigh,"docs_per_sec_4n":${f"$rateHigh%.1f"},""" +
      s""""efficiency":${f"$efficiency%.3f"},"num_docs":$numDocs},""" +
      s""""queries_total_sec":${f"$totalSec%.2f"},""" +
      s""""queries":$qs,"sf":"$sfDir"}""")
  }
}
