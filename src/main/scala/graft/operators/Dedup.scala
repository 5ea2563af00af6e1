package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the large-scale training-data pipeline.
  * Each has a Spark form (built-ins only → whole-stage codegen, shuffle
  * bounded by groupBy keys) and, where the math is engine-portable, a DuckDB
  * oracle SQL built from the SAME constants.
  *
  * Scale notes (the 100 TB story):
  *  - exact dedup: one hash-shuffle on a 16-byte digest — minimal key width;
  *    map-side partial aggregation halves shuffle volume.
  *  - minhash-LSH: signatures are per-doc aggregations over exploded
  *    shingles (shuffle keyed by doc_id = already-clustered), then the
  *    candidate join is keyed by tiny band digests — only colliding buckets
  *    shuffle together; no quadratic blowup. md5 is used here so the DuckDB
  *    oracle can reproduce signatures bit-for-bit; prod swaps xxhash64
  *    (same plan shape, ~10× cheaper hash).
  *  - n-gram Jaccard verifies candidate pairs only (LSH output), never the
  *    full cross product.
  */
object Dedup {

  /** 3-word shingles of the whitespace-normalized lowercase text.
    *
    * Implementation note (perf): built by zipping the word array with its
    * own 1- and 2-shifted slices — every subexpression is evaluated once
    * per row, O(words). The naive `transform(words, (_, i) =>
    * element_at(words, i+k))` form re-evaluates the `split` inside the
    * lambda per element (no CSE across a lambda boundary) → O(words²) per
    * row, which benchmarked 14× slower at sf0.1. `zip_with` pads the
    * shorter side with null and `concat(null) = null`, so the trailing
    * (incomplete) windows drop out via the null filter. */
  def shingles(text: Column, n: Int = 3): Column = {
    require(n == 3, "shingles currently built for n=3 (zip-with-shift form)")
    val w = split(regexp_replace(lower(trim(text)), " +", " "), " ")
    val s1 = slice(w, lit(2), greatest(size(w) - 1, lit(0)))
    val s2 = slice(w, lit(3), greatest(size(w) - 2, lit(0)))
    val pairs = zip_with(w, s1, (x, y) => concat(x, lit(" "), y))
    val tris = zip_with(pairs, s2, (xy, z) => concat(xy, lit(" "), z))
    filter(tris, s => s.isNotNull)
  }

  /** DuckDB: the words-list expression to bind in a CTE as e.g. `w`. */
  def wordsSql(e: String): String =
    s"string_split(regexp_replace(lower(trim($e)), ' +', ' ', 'g'), ' ')"

  /** DuckDB: shingle list over a bound words-list alias (1-based indexing;
    * `range(1, len-1)` is end-exclusive → starts 1..len-n+1). */
  def shingleListSql(wordsAlias: String, n: Int = 3): String = {
    val parts = (0 until n).map(k => s"$wordsAlias[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($wordsAlias) - ${n - 2}), i -> $parts)"
  }

  /** Exact dedup: group identical normalized texts by md5 fingerprint;
    * output (hash, keeper=min id, n_dups). One shuffle on the digest. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextOps.fingerprintCol(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Permutation hash: md5 hex (engine-portable → DuckDB oracle can
    * reproduce signatures bit-for-bit). */
  val md5Perm: (Column, Int) => Column =
    (s, i) => md5(concat(lit(s"$i|"), s).cast("binary"))

  /** Prod-speed permutation hash: xxhash64 (codegen'd, ~10× cheaper than
    * md5; not DuckDB-reproducible → rows-only check). Cast to string so the
    * min/least fold shape is shared with the md5 form. */
  val xxPerm: (Column, Int) => Column =
    (s, i) => lpad(hex(xxhash64(lit(i), s)), 16, "0")

  /** MinHash signature columns: perm i ↦ min over shingles of perm(s, i).
    * Computed per-ROW (no explode, no groupBy, NO SHUFFLE): at 10^12 docs
    * the signature stage is a pure map over the scan. Docs with < n words
    * get a null signature and drop out of candidate generation (null never
    * joins). */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
      numPerms: Int = 8, perm: (Column, Int) => Column = md5Perm): DataFrame = {
    val sh = array_distinct(shingles(col(textCol)))
    // Single pass over the shingles: per shingle a struct of all perms'
    // md5s, folded elementwise with least(). 4.8× faster than building
    // numPerms independent array_min(transform(...)) columns (each
    // re-materializes the hash array). "g" sorts after every hex digit, so
    // it is the fold's +infinity; an empty shingle list yields a null
    // signature (matching array_min-on-empty), keeping sub-n-word docs out
    // of candidate generation.
    val hashes = transform(sh, s => struct((0 until numPerms).map(i =>
      perm(s, i).as(s"m$i")): _*))
    val init = struct((0 until numPerms).map(i => lit("g").as(s"m$i")): _*)
    val folded = aggregate(hashes, init, (acc, x) =>
      struct((0 until numPerms).map(i => least(acc(s"m$i"), x(s"m$i")).as(s"m$i")): _*))
    val sig = when(size(sh) > 0, folded)
    // two-stage select: CollapseProject keeps the expensive fold
    // un-duplicated because its alias is referenced numPerms times
    docs.select(col(idCol), sig.as("sig"))
      .select(col(idCol) +: (0 until numPerms).map(i => col(s"sig.m$i").as(s"m$i")): _*)
  }

  /** LSH candidate pairs: band b = md5(m_{2b} || m_{2b+1}); docs sharing any
    * band digest are candidates. Output (id_a < id_b, band). */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      numPerms: Int = 8, rowsPerBand: Int = 2,
      perm: (Column, Int) => Column = md5Perm): DataFrame = {
    val sig = minhashSignature(docs, idCol, textCol, numPerms, perm)
    val nBands = numPerms / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(cols: _*).cast("binary")).as("digest"))
    }
    // Explicit shuffle on the band key BEFORE the self-join: both join
    // sides then hang off the identical exchange, which ReuseExchange
    // materializes once — without it Catalyst broadcasts one side and the
    // whole signature pipeline (8 md5s per shingle) computes twice. The
    // shuffled rows are tiny (id + band + 32-byte digest).
    val exploded = sig
      .select(col(idCol), explode(array(bands: _*)).as("bd"))
      .select(col(idCol), col("bd.band"), col("bd.digest"))
      .repartition(col("band"), col("digest"))
    val a = exploded.as("a")
    val b2 = exploded.as("b")
    a.join(b2,
        col("a.band") === col("b.band") && col("a.digest") === col("b.digest") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Prod-speed LSH candidates: signatures from the NATIVE one-pass
    * `minhash_sigs` expression (graft.functions.MinHashSigs — single scan,
    * seed-mixed permutations, no per-shingle string/md5 machinery), bands
    * joined on their two raw signature longs (no digest hash needed).
    * Rows-only vs the oracle by design: the 64-bit base hash is not
    * reproducible in DuckDB — `minhashCandidates` (md5) is the
    * parity-checked twin with the identical plan shape. */
  def minhashCandidatesNative(docs: DataFrame, idCol: String, textCol: String,
      numPerms: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(rowsPerBand == 2, "native band join built for rowsPerBand=2")
    val sig = docs.select(col(idCol),
      graft.functions.functions.minhashSigs(col(textCol), numPerms).as("sig"))
    val nBands = numPerms / rowsPerBand
    val bands = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        col("sig")(b * rowsPerBand).as("m0"),
        col("sig")(b * rowsPerBand + 1).as("m1"))
    }
    val exploded = sig
      .select(col(idCol), explode(array(bands: _*)).as("bd"))
      .select(col(idCol), col("bd.band"), col("bd.m0"), col("bd.m1"))
      .repartition(col("band"), col("m0"), col("m1"))
    val a = exploded.as("a")
    val b2 = exploded.as("b")
    a.join(b2,
        col("a.band") === col("b.band") && col("a.m0") === col("b.m0") &&
          col("a.m1") === col("b.m1") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Prod-speed two-stage fuzzy dedup, end-to-end native: candidates from
    * `minhashCandidatesNative`, verification = exact |A∩B| over sorted
    * shingle-HASH sets via a linear merge (`sorted_intersect_count`) — no
    * shingle strings, no `array_intersect` set building per pair. Hash
    * collisions (64-bit) are vanishingly rarer than the MinHash banding's
    * own false-negative rate. Rows-only vs the oracle (same reason as the
    * signature path); `ngramJaccardVerified` is the oracle-exact twin. */
  def jaccardVerifiedNative(docs: DataFrame, idCol: String, textCol: String,
      numPerms: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val cand = minhashCandidatesNative(docs, idCol, textCol, numPerms, rowsPerBand)
    val sets = docs.select(col(idCol),
      graft.functions.functions.shingleSet(col(textCol)).as("shl"))
    cand
      .join(sets.select(col(idCol).as("id_a"), col("shl").as("shl_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("shl").as("shl_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.functions.sortedIntersectCount(col("shl_a"), col("shl_b")).as("n_common"),
        size(col("shl_a")).cast("long").as("n_a"),
        size(col("shl_b")).cast("long").as("n_b"))
  }

  /** N-gram Jaccard verification over the LSH candidate pairs ONLY — the
    * scale-correct two-stage dedup (candidates from `minhashCandidates`,
    * exact |A∩B| via `array_intersect` on the per-doc shingle sets). Exact
    * integer counts (n_common, n_a, n_b) so the threshold can be applied by
    * integer cross-multiplication with no float parity risk. Never touches
    * the quadratic all-pairs space. */
  def ngramJaccardVerified(docs: DataFrame, idCol: String, textCol: String,
      numPerms: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val cand = minhashCandidates(docs, idCol, textCol, numPerms, rowsPerBand)
    val sets = docs.select(col(idCol),
      array_distinct(shingles(col(textCol))).as("shl"))
    cand
      .join(sets.select(col(idCol).as("id_a"), col("shl").as("shl_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("shl").as("shl_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("shl_a"), col("shl_b"))).cast("long").as("n_common"),
        size(col("shl_a")).cast("long").as("n_a"),
        size(col("shl_b")).cast("long").as("n_b"))
  }
}
