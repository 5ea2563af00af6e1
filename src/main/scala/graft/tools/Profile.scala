package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc query profiler: runs named registry queries N times in one
  * session and prints per-iteration wall seconds — separates plan/codegen
  * compile cost (iteration 1) from steady-state eval cost (iterations 2+).
  * Usage: runMain graft.tools.Profile <sfDir> <iters> <query...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = graft.Queries.all(name)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
