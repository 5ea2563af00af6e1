package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured-recall assertions for the approximate (LSH-family) operators:
  * ground truth is computed brute-force on the driver over the sf0.01
  * corpus (1,000 augmented docs / 500 vectors — small enough for exact
  * all-pairs), then compared against the candidate generation the 100 TB
  * path uses. Deterministic: fixed corpus + seedless hash constructions →
  * the measured recall is a constant of the code, not a flaky sample.
  * (Oracle parity proves the candidates are computed as SPECIFIED; these
  * tests prove the specification actually FINDS the duplicates.)
  */
class RecallSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.01"

  test("minhash-LSH: 100% recall on exact dups, >=90% on true Jaccard >= 0.9") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val aug = docs
      .unionAll(docs.select(col("doc_id") + lit(1000000L), col("text")))
      .toDF("doc_id", "text")
    val sets: Array[(Long, Array[String])] = aug
      .select(col("doc_id"), array_distinct(Dedup.shingles(col("text"))).as("sh"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, s) => (id, s.toArray.sorted) }
    def inter(a: Array[String], b: Array[String]): Int = {
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        val cmp = a(i).compareTo(b(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      c
    }
    // exact all-pairs ground truth, with the cheap size-ratio prune:
    // J <= min/max, so min*10 < max*9 can never reach J >= 0.9
    val truth = for {
      i <- sets.indices
      j <- (i + 1) until sets.length
      na = sets(i)._2.length; nb = sets(j)._2.length
      if math.min(na, nb) * 10 >= math.max(na, nb) * 9
      c = inter(sets(i)._2, sets(j)._2)
      u = na + nb - c
      if u > 0 && c * 10 >= u * 9
    } yield (math.min(sets(i)._1, sets(j)._1), math.max(sets(i)._1, sets(j)._1), c == u)
    val cand = Dedup.minhashCandidates(aug, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = truth.filter(_._3).map(t => (t._1, t._2))
    val near = truth.map(t => (t._1, t._2))
    assert(exact.nonEmpty, "augmented corpus must contain exact-dup ground truth")
    assert(exact.forall(cand.contains), "an exact dup has identical signatures — it can NEVER miss")
    val recall = near.count(cand.contains).toDouble / near.size
    info(f"minhash-LSH recall on J>=0.9: $recall%.3f over ${near.size} true pairs (${exact.size} exact)")
    assert(recall >= 0.9, f"recall $recall%.3f < 0.9 over ${near.size} pairs")
  }

  test("SRP near-dup: >=95% recall on planted cos~0.995 near-dups (theory ~1.0 at 8x6 bits)") {
    // The fixture's own max pair dot is 0.51 (unit-norm vectors) — no
    // high-cosine ground truth exists naturally, so PLANT it: 50 vectors
    // get a deterministic small perturbation (renormalized, cos ≈ 0.995
    // with their source). SRP banding at that angle misses a pair with
    // probability ~1e-6, so near-total recall is the code-correctness
    // signal, not a lucky sample.
    import spark.implicits._
    val embDF = spark.read.parquet(s"$sf/embeddings.parquet")
    val base: Array[(Long, Array[Float])] = embDF
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) => (id, e.toArray) }
      .sortBy(_._1)
    val planted = base.take(50).map { case (id, e) =>
      val p = e.zipWithIndex.map { case (x, k) =>
        x + 0.02f * ((((id * 31 + k) % 7).toInt - 3) / 3.0f) }
      val n = math.sqrt(p.map(x => x.toDouble * x).sum)
      (id + 500000L, p.map(x => (x / n).toFloat))
    }
    val all = (base ++ planted).toSeq
      .map { case (id, e) => (id, e.toSeq) }.toDF("vec_id", "embedding")
    val got = Similarity.srpNearDupPairs(all, "vec_id", "embedding", theta = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gt = base.take(50).map { case (id, _) => (id, id + 500000L) }
    val recall = gt.count(got.contains).toDouble / gt.length
    info(f"SRP recall on planted near-dups: $recall%.3f over ${gt.length} pairs; ${got.size} pairs found")
    assert(recall >= 0.95, f"recall $recall%.3f < 0.95")
    // precision side: theta=0.9 excludes every natural pair (max dot 0.51),
    // so nothing beyond the planted pairs may surface
    assert(got.forall(p => gt.contains(p)), s"unexpected non-planted pair: ${got -- gt.toSet}")
  }
}
