package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`), for the
  * training-data pipeline. Two tiers:
  *
  *  - `bruteForceTopK`: exact cosine top-k via a broadcast of the query
  *    vector — one pass over the table, no shuffle except the final top-k
  *    (which AQE executes as a partial + final TakeOrdered). The baseline.
  *  - `lshBucketedTopK`: sign-random-projection LSH — each vector lands in a
  *    2^p bucket keyed by the signs of p fixed pseudo-random hyperplanes
  *    (hash-derived, deterministic); search only scans the query's bucket
  *    (± optionally neighboring buckets). At 10^12 rows this turns a full
  *    scan into a 1/2^p partition-pruned scan when the table is written
  *    bucketed/partitioned by `bucket` — the scale path.
  *
  * Dot products run inside codegen via `aggregate`/`zip_with` on the array
  * column (doubles, sequential fold — deterministic).
  */
object Similarity {

  /** dot(embedding, q) as a codegen'd double fold. */
  def dotCol(emb: Column, q: Seq[Float]): Column = {
    val qArr = array(q.map(v => lit(v.toDouble)): _*)
    aggregate(
      zip_with(emb, qArr, (a, b) => a.cast("double") * b),
      lit(0.0),
      (acc, x) => acc + x)
  }

  /** Exact top-k by dot product (embeddings are ~unit-norm → cosine).
    * Deterministic tie-break by id. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, embCol: String,
      q: Seq[Float], k: Int): DataFrame = {
    embeddings
      .select(col(idCol), dotCol(col(embCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col(idCol))))
      .select(col("rank"), col(idCol))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * in {-1, +1} from the fixture hash (no RNG state). */
  def planeSign(plane: Int, dim: Int): Double =
    if ((graft.core.Hash64(s"srp|$plane|$dim") & 1L) == 0L) -1.0 else 1.0

  /** Sign-random-projection bucket id (p bits) for an embedding column. */
  def srpBucket(emb: Column, p: Int, dims: Int): Column = {
    val bits = (0 until p).map { plane =>
      val planeVec = array((0 until dims).map(d => lit(planeSign(plane, d))): _*)
      val dot = aggregate(
        zip_with(emb, planeVec, (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << plane)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** ANN: score only vectors in the query's SRP bucket. Recall < 1 by
    * design; the demo query reports (rank, id) within the bucket. */
  def lshBucketedTopK(embeddings: DataFrame, idCol: String, embCol: String,
      q: Seq[Float], k: Int, p: Int = 4): DataFrame = {
    val dims = q.length
    val qBucket = {
      var b = 0
      for (plane <- 0 until p) {
        var dot = 0.0
        for (d <- 0 until dims) dot += q(d).toDouble * planeSign(plane, d)
        if (dot >= 0) b |= (1 << plane)
      }
      b
    }
    embeddings
      .withColumn("bucket", srpBucket(col(embCol), p, dims))
      .filter(col("bucket") === qBucket) // partition-pruned when stored bucketed
      .select(col(idCol), dotCol(col(embCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col(idCol))))
      .select(col("rank"), col(idCol))
  }

  /** Deterministic distributed k-means (Lloyd's) for the IVF coarse
    * quantizer: centroids seeded from the first k vectors by id (no RNG),
    * each iteration = one aggregation job (assign via argmin expression,
    * update via per-cluster mean); centroids collected to the driver
    * between iterations (k × dims doubles — trivially small). */
  def kmeansCentroids(embeddings: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int = 3): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    var centroids: Array[Array[Double]] = embeddings
      .orderBy(col(idCol)).limit(k)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = centroids.head.length
    for (_ <- 1 to iters) {
      val assigned = embeddings.withColumn("c", assignCluster(col(embCol), centroids))
      // per-cluster elementwise mean via posexplode + groupBy (cluster, dim)
      val means = assigned
        .select(col("c"), posexplode(col(embCol)).as(Seq("d", "v")))
        .groupBy(col("c"), col("d"))
        .agg(avg(col("v").cast("double")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next
    }
    centroids
  }

  /** argmin over squared distance to each centroid, as a pure expression
    * (keeps assignment inside codegen; k small for the coarse level). */
  private def assignCluster(emb: Column, centroids: Array[Array[Double]]): Column = {
    val dists = centroids.map { c =>
      val cArr = array(c.map(lit): _*)
      aggregate(zip_with(emb, cArr, (x, y) => {
        val d = x.cast("double") - y
        d * d
      }), lit(0.0), (acc, x) => acc + x)
    }
    val minD = least(dists: _*)
    // first cluster achieving the min (deterministic tie-break by index)
    dists.zipWithIndex.reverse.foldLeft(lit(0)) { case (acc, (d, i)) =>
      when(d === minD, lit(i)).otherwise(acc)
    }
  }

  /** IVF search: probe the `nprobe` centroids nearest to the query, scan
    * only vectors assigned to them (≈ nprobe/k of the table; with the table
    * stored partitioned by cluster this is partition pruning), then exact
    * top-k within the probed subset. */
  def ivfTopK(embeddings: DataFrame, idCol: String, embCol: String,
      q: Seq[Float], k: Int, centroids: Array[Array[Double]],
      nprobe: Int = 2): DataFrame = {
    val qd = q.map(_.toDouble).toArray
    val probed = centroids.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < c.length) { val t = qd(j) - c(j); d += t * t; j += 1 }
        (i, d)
      }
      .sortBy { case (i, d) => (d, i) }
      .take(nprobe).map(_._1)
    embeddings
      .withColumn("c", assignCluster(col(embCol), centroids))
      .filter(col("c").isin(probed.map(Integer.valueOf): _*))
      .select(col(idCol), dotCol(col(embCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col(idCol))))
      .select(col("rank"), col(idCol))
  }

  /** All-pairs near-duplicate candidates above a dot-product threshold,
    * blocked by a grouping column to avoid the full cross product. */
  def nearDupPairs(embeddings: DataFrame, idCol: String, embCol: String,
      groupCol: String, theta: Double): DataFrame = {
    val a = embeddings.as("a")
    val b = embeddings.as("b")
    val dot = aggregate(
      zip_with(col(s"a.$embCol"), col(s"b.$embCol"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    a.join(b, col(s"a.$groupCol") === col(s"b.$groupCol") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        dot.as("score"))
      .filter(col("score") >= theta)
  }
}
