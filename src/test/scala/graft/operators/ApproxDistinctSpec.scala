package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound check for the approximate-distinct contract query (round-3
  * verdict item 6). `q_distinct_users_approx` is rows-only vs the DuckDB
  * oracle BY CONSTRUCTION (HLL sketches are engine-specific), so the value
  * check lives here instead: the HLL++ estimate must sit within a small
  * relative error of the exact twin `q_distinct_users` on every group.
  * rsd = 0.02 → ±3σ = 6%; the assert allows 10% for small-cardinality
  * groups (HLL++'s sparse mode is near-exact there anyway).
  */
class ApproxDistinctSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("approx_count_distinct within 10% of exact per event_type") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = graft.Queries.all("q_distinct_users")(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val approx = graft.Queries.all("q_distinct_users_approx")(spark, sf)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(approx.nonEmpty)
      for ((et, est, _) <- approx) {
        val ex = exact(et)
        val relErr = math.abs(est - ex).toDouble / math.max(ex, 1L)
        assert(relErr <= 0.10,
          s"$sf/$et: estimate $est vs exact $ex (relErr $relErr)")
      }
      // same group keys and event totals as the exact twin
      assert(approx.map(_._1).toSeq == exact.keys.toSeq.sorted)
    }
  }
}
