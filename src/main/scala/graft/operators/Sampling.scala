package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation — the standard
  * "rebalance the language/source mix" step of a training-data pipeline
  * (e.g. downsample an over-represented language to a fixed rate while
  * keeping rare strata whole).
  *
  * Scale shape: the sample decision is a pure per-row integer expression
  * over the row's own id — no shuffle, no sort, no sampling state, and the
  * SAME rows are selected no matter the partitioning, executor count, or
  * input order (unlike `DataFrame.sample`, which is seed + partition-layout
  * dependent). That reproducibility is what makes a 100 TB curation run
  * auditable and resumable: re-running any slice selects the same docs.
  *
  * Hash: Knuth multiplicative hashing — `(id * 2654435761) mod 2^32`,
  * then `mod buckets` (both engines evaluate it in exact BIGINT math, so
  * the DuckDB oracle reproduces the selection bit-for-bit; md5 would also
  * be portable but costs ~20× more per row for no statistical benefit
  * here). Safe from BIGINT overflow for ids < ~3.4e9; guard documented.
  */
object Sampling {

  /** 2654435761 = floor(2^32 / φ), Knuth's multiplicative constant. */
  private val KnuthMul = 2654435761L
  private val TwoPow32 = 4294967296L

  /** Deterministic bucket in [0, buckets) from a numeric id column. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(pmod(id.cast("long") * lit(KnuthMul), lit(TwoPow32)), lit(buckets.toLong))

  /** The same expression as DuckDB SQL (for oracle parity). */
  def hashBucketSql(idExpr: String, buckets: Int): String =
    s"(($idExpr * $KnuthMul) % $TwoPow32) % $buckets"

  /** Stratified sample: keep a row iff its hash bucket (out of 100) falls
    * below the stratum's percentage rate. Strata absent from `rates` fall
    * back to `defaultPct`. Rates are integer percents so the predicate is
    * pure integer math on both engines. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), 100) < rate)
  }

  /** The stratified predicate as DuckDB SQL. */
  def stratifiedSql(idExpr: String, strataExpr: String,
      rates: Map[String, Int], defaultPct: Int): String = {
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
    s"${hashBucketSql(idExpr, 100)} < (CASE $strataExpr $cases ELSE $defaultPct END)"
  }
}
