package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round instrumentation bench (guide §1.4): the QUERY phase of
  * `Bench` in isolation, with per-query selection, repeat counts, and
  * `.explain("formatted")` dumps — so individual operators can be measured
  * and re-measured quickly without paying the scaling phase. The
  * measurement methodology is IDENTICAL to Bench's query phase (same
  * session config, same untimed warm execution, same noop sink forcing
  * every column of every row); `Bench` itself stays the driver contract.
  *
  * Usage: sbt "runMain graft.BenchExtra [query ...]"
  *   SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS    core count for local[n] + shuffle partitions (32)
  *   GRAFT_BENCH_REPS    timed repetitions per query, min reported (1)
  *   GRAFT_PLANS_DIR     if set, write <query>.txt explain("formatted") here
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "1").toInt
    val plansDir = sys.env.get("GRAFT_PLANS_DIR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Queries.all.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      try {
        spark.read.parquet(s"$sfDir/nation.parquet")
          .write.format("noop").mode("overwrite").save()
        Queries.prepareIndexes(spark, sfDir)
      } catch { case scala.util.control.NonFatal(e) =>
        // best-effort warmup, but never silently: a failed index build
        // makes every *_indexed query fail confusingly downstream
        System.err.println(s"[benchextra] warmup/prepareIndexes failed: $e")
      }
      val timings = names.map { name =>
        val fn = Queries.all(name)
        spark.sparkContext.setJobDescription(s"benchextra: $name")
        def exec(): Unit =
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val warmOk = try { exec(); true }
        catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name failed: ${e.getMessage}"); false
        }
        plansDir.foreach { dir =>
          try {
            val df = fn(spark, sfDir)
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$dir/$name.txt"),
              df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode))
          } catch { case e: Throwable =>
            System.err.println(s"[benchextra] plan dump $name failed: ${e.getMessage}")
          }
        }
        val samples = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          val ok = warmOk && (try { exec(); true }
          catch { case e: Throwable =>
            System.err.println(s"[benchextra] $name failed: ${e.getMessage}"); false
          })
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val best = if (samples.exists(_ >= 0)) samples.filter(_ >= 0).min else -1.0
        System.err.println(f"[benchextra] $name%-24s ${best}%8.3f s  ${samples.map(s => f"$s%.3f").mkString(",")}")
        name -> best
      }
      val qs = timings.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      val totalSec = timings.filter(_._2 >= 0).map(_._2).sum
      println(s"""{"queries":$qs,"queries_total_sec":${f"$totalSec%.2f"},"reps":$reps,"sf":"$sfDir"}""")
    } finally spark.stop()
  }
}
