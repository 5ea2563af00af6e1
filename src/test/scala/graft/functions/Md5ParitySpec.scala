package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-6 fused native kernels must be VALUE-IDENTICAL to the builtin
  * higher-order-function constructions they replaced (the builtin forms are
  * reproduced here verbatim as the reference — they are also what the
  * frozen DuckDB oracle SQL mirrors). Checked over nasty constructed
  * strings, deterministic pseudo-random word salad, and the fixture corpus
  * texts. */
class Md5ParitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val rnd = new scala.util.Random(42)
  private def salad(n: Int): String =
    Seq.fill(n)("w" + rnd.nextInt(30)).mkString(" ")

  private val samples: Seq[String] = Seq(
    "",
    " ",
    "   ",
    "one",
    "one two",
    "one two three",
    "one  two   three    four",
    "  leading and trailing  ",
    "UPPER Case MiXeD words here now",
    "tab\tinside word and new\nline chars",
    "repeat repeat repeat repeat repeat",
    "a b a b a b a b a b a b",
    "unicode é café 中文 words mixed in here",
    salad(5), salad(7), salad(8), salad(9), salad(30), salad(100), salad(250)
  ) ++ graft.pipeline.Fixtures.testDocs.flatMap(_.spans.map(_.text)).filter(_.nonEmpty)

  private def check(name: String, native: Column, builtin: Column): Unit = {
    import spark.implicits._
    val df = samples.toDF("t")
    val rows = df.select(native.as("got"), builtin.as("exp")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.get(0) == r.get(1),
        s"$name mismatch on sample $i '${samples(i).take(60)}': ${r.get(0)} vs ${r.get(1)}")
    }
  }

  /** The pre-round-6 builtin md5-lane signature construction (reference). */
  private def builtinLanes(text: Column, numPerms: Int): Column = {
    val w = split(regexp_replace(lower(trim(text)), " +", " "), " ")
    val s1 = slice(w, lit(2), greatest(size(w) - 1, lit(0)))
    val s2 = slice(w, lit(3), greatest(size(w) - 2, lit(0)))
    val pairs = zip_with(w, s1, (x, y) => concat(x, lit(" "), y))
    val tris = zip_with(pairs, s2, (xy, z) => concat(xy, lit(" "), z))
    val sh = array_distinct(filter(tris, s => s.isNotNull))
    val nHash = (numPerms + 3) / 4
    val hstrs = transform(sh, s =>
      concat((0 until nHash).map(k => md5(concat(lit(s"$k|"), s).cast("binary"))): _*))
    val init = struct((0 until numPerms).map(i => lit("g").as(s"m$i")): _*)
    val folded = aggregate(hstrs, init, (acc, h) =>
      struct((0 until numPerms).map(i =>
        least(acc(s"m$i"), substring(h, 1 + 8 * i, 8)).as(s"m$i")): _*))
    when(size(sh) > 0,
      array((0 until numPerms).map(i => folded(s"m$i")): _*))
  }

  test("md5_minhash_lanes == builtin HOF construction, lane for lane") {
    check("lanes", functions.md5MinhashLanes(col("t"), 8), builtinLanes(col("t"), 8))
  }

  test("md5_window_hashes == builtin transform(sequence) construction") {
    val W = 8
    val w = split(regexp_replace(lower(trim(col("t"))), " +", " "), " ")
    val builtin = when(size(w) >= W,
      transform(sequence(lit(1), size(w) - W + 1),
        i => md5(array_join(slice(w, i, lit(W)), " ").cast("binary"))))
      .otherwise(array().cast("array<string>"))
    check("windows", functions.md5WindowHashes(col("t"), W), builtin)
  }

  test("md5_simhash_bits == builtin exploded-contribution construction") {
    import spark.implicits._
    // reference: the pre-round-6 explode + 64 contribution sums + concat
    val d = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val words = array_distinct(
      split(regexp_replace(lower(trim(col("text"))), " +", " "), " "))
    val toks = d.select(col("doc_id"), explode(words).as("tok"))
      .select(col("doc_id"), md5(col("tok").cast("binary")).as("h"))
    def contrib(b: Int): Column = {
      val hexval = conv(col("h").substr(lit(b / 4 + 1), lit(1)), 16, 10).cast("int")
      (hexval / lit(Seq(8, 4, 2, 1)(b % 4))).cast("int") % 2 * 2 - 1
    }
    val withC = toks.select(
      col("doc_id") +: (0 until 64).map(b => contrib(b).as(s"c$b")): _*)
    val agg = withC.groupBy(col("doc_id"))
      .agg(sum(col("c0")).as("s0"), (1 until 64).map(b => sum(col(s"c$b")).as(s"s$b")): _*)
    val bits = concat((0 until 64).map(b =>
      when(col(s"s$b") >= 0, lit("1")).otherwise(lit("0"))): _*)
    val exp = agg.select(col("doc_id"), bits.as("bits"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = d.select(col("doc_id"), functions.md5SimhashBits(col("text")).as("bits"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, g) =>
      assert(g == exp(id), s"simhash bits mismatch on doc $id: $g vs ${exp(id)}")
    }
  }

  test("shingle_strs == array_distinct(shingles) as a SET") {
    check("shingleSet",
      functions.shingleStrs(col("t")),
      array_sort(array_distinct(graft.operators.Dedup.shingles(col("t")))))
  }

  test("wrap_lines == builtin transform(sequence) line wrap") {
    val W = graft.operators.TextOps.LineWords
    val words = split(regexp_replace(trim(col("t")), " +", " "), " ")
    val builtin = transform(
      sequence(lit(0), floor((size(words) - lit(1)) / lit(W)).cast("int")),
      i => array_join(slice(words, i * lit(W) + lit(1), lit(W)), " "))
    check("wrapLines", functions.wrapLines(col("t"), W), builtin)
  }

  test("repetition_counts == builtin sorted-run fold construction") {
    val words = split(regexp_replace(lower(trim(col("t"))), " +", " "), " ")
    val bigrams = filter(
      zip_with(words,
        slice(words, lit(2), greatest(size(words) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y)),
      s => s.isNotNull)
    def topRun(arr: Column): Column = aggregate(
      array_sort(arr),
      struct(lit(" ").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, w) => {
        val run = when(w === st("prev"), st("run") + 1).otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"), greatest(st("best"), run).as("best"))
      },
      st => st("best"))
    val builtin = array(
      size(words).cast("long"),
      aggregate(words, lit(0L), (acc, w) => acc + length(w)),
      topRun(words),
      topRun(bigrams))
    check("repetition", TextStats.repetitionCounts(col("t")), builtin)
  }

  test("quality_counts == builtin split/regex/filter chain") {
    val builtin = array(
      size(split(trim(col("t")), " +")).cast("long"),
      length(regexp_replace(col("t"), "[^.,;:!?]", "")).cast("long"),
      size(filter(split(lower(col("t")), " "),
        w => w.isin(graft.operators.TextOps.Stopwords: _*))).cast("long"),
      length(col("t")).cast("long"))
    check("quality", TextStats.qualityCounts(col("t")), builtin)
  }

  test("token_count == size(regexp_extract_all(TokenPattern))") {
    val builtin = size(regexp_extract_all(col("t"),
      lit(graft.operators.TextOps.TokenPattern), lit(0))).cast("long")
    check("tokens", TextStats.tokenCount(col("t")), builtin)
  }

  test("null input: lanes/simhash/shingles are null; windows/lines coalesce paths") {
    import spark.implicits._
    val d = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
    val r = d.select(
      functions.md5MinhashLanes(col("t"), 8).as("lanes"),
      functions.md5SimhashBits(col("t")).as("bits"),
      functions.shingleStrs(col("t")).as("sh"),
      coalesce(functions.md5WindowHashes(col("t"), 8), array().cast("array<string>")).as("wh"),
      coalesce(functions.wrapLines(col("t"), 8), array().cast("array<string>")).as("wl"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getSeq[String](3).isEmpty && r.getSeq[String](4).isEmpty)
  }
}
