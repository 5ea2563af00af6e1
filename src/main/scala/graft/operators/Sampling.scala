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
  * here).
  *
  * Overflow-safe for ALL non-negative BIGINT ids (round-3 advice): the id
  * is first reduced mod 2^32, then the multiply runs in 16-bit halves so
  * every intermediate stays < 2^49 — Spark would silently wrap a direct
  * `id*K` product past 2^63 while DuckDB raises on BIGINT overflow, which
  * for ids ≥ ~3.4e9 made the engine select via a wrapped hash the oracle
  * could not even evaluate. The split form is mathematically identical to
  * `(id mod 2^32 · K) mod 2^32` for every id, so selections made by the
  * previous form (ids < 2^32) are unchanged. Negative ids remain out of
  * contract (Spark pmod vs SQL % disagree on sign).
  */
object Sampling {

  /** 2654435761 = floor(2^32 / φ), Knuth's multiplicative constant. */
  private val KnuthMul = 2654435761L
  private val TwoPow32 = 4294967296L

  /** Deterministic bucket in [0, buckets) from a numeric id column.
    * All intermediates bounded: hi,lo < 2^16 after the mod-2^32 reduction,
    * hi·K < 2^48, (hi·K mod 2^32)·2^16 < 2^48, sum < 2^49. */
  def hashBucket(id: Column, buckets: Int): Column = {
    val id32 = pmod(id.cast("long"), lit(TwoPow32))
    val hi = shiftright(id32, 16)
    val lo = id32.bitwiseAND(lit(65535L))
    val prod = pmod(
      pmod(hi * lit(KnuthMul), lit(TwoPow32)) * lit(65536L) + lo * lit(KnuthMul),
      lit(TwoPow32))
    pmod(prod, lit(buckets.toLong))
  }

  /** The same split-multiply expression as DuckDB SQL (oracle parity;
    * DuckDB `>>`/`&`/`%` on BIGINT match Spark's for non-negative values). */
  def hashBucketSql(idExpr: String, buckets: Int): String = {
    val id32 = s"(($idExpr) % $TwoPow32)"
    s"((((($id32 >> 16) * $KnuthMul) % $TwoPow32) * 65536 + ($id32 & 65535) * $KnuthMul) % $TwoPow32) % $buckets"
  }

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
