package graft.pipeline

import graft.media.{DeterministicMediaStore, DeterministicOcr, MediaStore, OcrEngine}
import graft.model._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

/** The batch extraction pipeline (SURVEY.md §3.4) — the Spark-native
  * replacement for the reference's request loop, designed for a
  * 1000-executor cluster over 10^12 docs:
  *
  * {{{
  * scan (parquet sandbox / Iceberg prod; resume anti-join)
  *   → repartitionByRange(doc_id)              // ONE full shuffle, range-
  *                                             // clustered lineage buckets
  *   → [common path]  filter(small) → mapPartitions(kernel) → DocOut
  *   → [skew path]    filter(mega)  → flatMap(salted WorkUnits)
  *                    → repartition(doc_id, salt)   // tiny slice only
  *                    → mapPartitions(kernel) → groupByKey(doc_id) → merge
  *   → union → observe(metrics) → idempotent append
  * }}}
  *
  * Scale properties:
  *  - The expensive extraction runs exactly once per page either way.
  *  - ~99.9% of docs take the common path: NO post-extraction shuffle at
  *    all — extracted bytes land straight in the writer. Only the mega-doc
  *    slice (0.1% of docs by count) pays the salted repartition + merge
  *    shuffle; its units are spread over (doc_id, salt) so no single task
  *    owns a 256-page doc (SURVEY.md §4.2 salting).
  *  - Both branches hang off the SAME RepartitionByRange exchange, so
  *    Catalyst's ReuseExchange executes the scan + range shuffle once.
  *  - AQE coalesces/splits post-shuffle partitions at runtime.
  *  - OCR engine init is amortized once per partition inside
  *    `mapPartitions` (the reference pays a subprocess spawn per page pass,
  *    `main.py:229`).
  *  - Per-partition lineage rows (run_id, partition, doc range, span/byte
  *    counts, wall ms) are collected via an accumulator and persisted next
  *    to the output — the north-rule lineage + resume proof.
  */
object Extract {

  final case class Summary(
      runId: String,
      docsProcessed: Long,
      spanCount: Long,
      byteCount: Long,
      lineage: Seq[LineageRow])

  /** Pure transformation: docs → extracted docs. No I/O; callers choose
    * source/sink. `store`/`engine` must be serializable singletons or
    * lightweight factories (shipped to executors). */
  def extractDS(
      spark: SparkSession,
      docs: Dataset[Doc],
      store: MediaStore = DeterministicMediaStore,
      engine: OcrEngine = DeterministicOcr,
      conf: ExtractConf = ExtractConf(),
      lineageAcc: Option[CollectionAccumulator[LineageRow]] = None): Dataset[DocOut] = {
    import spark.implicits._

    // One full shuffle: range-cluster by doc_id. Everything downstream —
    // both branches — reuses this exchange (verified via explain: Catalyst
    // ReuseExchange). Range partitioning gives contiguous doc_id buckets →
    // deterministic lineage ranges and clustered output files.
    val clustered = docs
      .repartitionByRange(conf.numPartitions, col("doc_id"))
      .as[Doc]

    val kconf = conf
    val kstore = store
    val kengine = engine

    def withLineage[T](path: String, docIdOf: T => String, spansOf: T => Seq[Span])(
        it: Iterator[T]): Iterator[T] = lineageAcc match {
      case None => it
      case Some(acc) =>
        val t0 = System.nanoTime()
        var minId: String = null
        var maxId: String = null
        var docs = 0L
        var spans = 0L
        var bytes = 0L
        val pid = TaskContext.getPartitionId()
        new Iterator[T] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && docs >= 0) {
              acc.add(LineageRow(kconf.runId, path, pid, Option(minId).getOrElse(""),
                Option(maxId).getOrElse(""), docs, spans, bytes,
                (System.nanoTime() - t0) / 1000000))
              docs = -1 // emit once
            }
            h
          }
          def next(): T = {
            val r = it.next()
            val id = docIdOf(r)
            if (minId == null || id < minId) minId = id
            if (maxId == null || id > maxId) maxId = id
            docs += 1
            val ss = spansOf(r)
            spans += ss.length
            bytes += ss.iterator.map(_.text.length.toLong).sum
            r
          }
        }
    }

    // --- common path: small docs, extracted in place, no further shuffle
    val wholeOut: Dataset[DocOut] = clustered
      .mapPartitions { it =>
        val small = it.flatMap { d =>
          val units = ExtractKernel.plan(d, kstore, kconf)
          if (units.length == 1) Iterator.single(
            ExtractKernel.merge(d.doc_id, Seq(
              ExtractKernel.extractUnit(units.head, kstore, kengine, kconf))))
          else Iterator.empty
        }
        withLineage[DocOut]("common", _.doc_id, _.spans)(small)
      }

    // --- skew path: mega docs → salted page-range units → spread shuffle →
    //     extract → reassemble. Only the skewed tail pays this shuffle.
    val saltedUnits: Dataset[WorkUnit] = clustered
      .flatMap { d =>
        val units = ExtractKernel.plan(d, kstore, kconf)
        if (units.length > 1) units else Nil
      }

    val saltedOut: Dataset[DocOut] = saltedUnits
      .repartition(conf.numPartitions, col("doc_id"), col("salt"))
      .mapPartitions { it =>
        it.map(u => ExtractKernel.extractUnit(u, kstore, kengine, kconf))
      }
      .groupByKey(_.doc_id)
      .mapGroups { (id, us) => ExtractKernel.merge(id, us.toSeq) }
      .mapPartitions(it => withLineage[DocOut]("salted", _.doc_id, _.spans)(it))

    wholeOut.union(saltedOut)
  }

  /** Read → resume filter → extract → observed metrics → idempotent append
    * + lineage. Sandbox storage is parquet; the prod path is the same code
    * with `format("iceberg")` (SURVEY.md §2.1 S1/S7 — snapshot commit as the
    * atomic checkpoint).
    */
  def run(
      spark: SparkSession,
      in: Dataset[Doc],
      outPath: String,
      conf: ExtractConf = ExtractConf(),
      store: MediaStore = DeterministicMediaStore,
      engine: OcrEngine = DeterministicOcr): Summary = {
    import spark.implicits._

    // Resume (north rule: idempotent restart): drop doc_ids already in the
    // committed output. left_anti scales to any committed size (sort-merge);
    // at small committed sets AQE turns it into a broadcast anti-join.
    val todo: Dataset[Doc] = committedIds(spark, outPath) match {
      case Some(done) => in.join(done, Seq("doc_id"), "left_anti").as[Doc]
      case None => in
    }

    val acc = new CollectionAccumulator[LineageRow]
    spark.sparkContext.register(acc, "lineage")

    val out = extractDS(spark, todo, store, engine, conf, Some(acc))
      .observe("extract_metrics",
        count(lit(1)).as("docs"),
        sum(size(col("spans"))).as("span_count"),
        sum(col("character_count")).as("byte_count"))

    out.write.mode(SaveMode.Append).parquet(outPath)

    val lineage = {
      import scala.jdk.CollectionConverters._
      // Retried/speculated tasks can deliver duplicate accumulator updates
      // for shuffle-map stages; dedupe by (path, partition), keeping the
      // update that saw the most docs (a retry that superseded a partial).
      acc.value.asScala.toSeq
        .groupBy(r => (r.path, r.partition_id))
        .values.map(_.maxBy(_.doc_count)).toSeq
        .sortBy(r => (r.path, r.partition_id))
    }
    if (lineage.nonEmpty) {
      spark.createDataset(lineage)
        .write.mode(SaveMode.Append)
        .parquet(s"${outPath}_lineage/run_id=${conf.runId}")
    }
    Summary(conf.runId,
      lineage.map(_.doc_count).sum,
      lineage.map(_.span_count).sum,
      lineage.map(_.byte_count).sum,
      lineage)
  }

  private def committedIds(spark: SparkSession, outPath: String): Option[Dataset[org.apache.spark.sql.Row]] = {
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      Some(spark.read.parquet(outPath).select("doc_id").distinct())
    else None
  }
}
