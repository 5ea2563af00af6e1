package graft.operators

import graft.core.LangDetect
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar (Catalyst-codegen'd) forms of the text kernels, for the
  * SQL-expressible operator surface + DuckDB oracle parity. All stay inside
  * whole-stage codegen (built-in `functions._` only — no UDFs).
  *
  * `cleanCol` is observably equivalent to `TextClean.clean` for BMP input
  * (asserted by `ColumnarParitySpec`): after the first step maps all control
  * chars (incl. \n\r\t) to spaces, preserving \n\r\t in later classes is
  * vacuous, so the chain is shortened — same output, fewer regex passes.
  */
object TextOps {

  /** Columnar sanitizer — semantics of `clean_text_for_json`
    * (main.py:53-85) for BMP input. */
  def cleanCol(c: Column): Column = {
    val ctl = regexp_replace(c, "[\\x00-\\x1F\\x7F-\\x9F]", " ")
    val quoted = translate(ctl, "\"\\", "'/")
    val zw = regexp_replace(quoted, "[\\u200B-\\u200D\\uFEFF]", "")
    val ascii = regexp_replace(zw, "[^\\x20-\\x7E]", " ")
    trim(regexp_replace(ascii, " +", " "))
  }

  /** DuckDB SQL string equivalent of `cleanCol` over expression `e`. */
  def cleanSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(regexp_replace(replace(replace(" +
      s"regexp_replace($e, '[\\x00-\\x1F\\x7F-\\x9F]', ' ', 'g')," +
      s""" '"', ''''), '\\', '/'),""" +
      s" '[\\x{200B}-\\x{200D}\\x{FEFF}]', '', 'g')," +
      s" '[^\\x20-\\x7E]', ' ', 'g')," +
      s" ' +', ' ', 'g'))"

  /** Language keyword score for one language (main.py:106-139 semantics:
    * substring containment, +1 per keyword). */
  def langScoreCol(sample: Column, lang: String): Column =
    LangDetect.keywords(lang)
      .map(kw => when(sample.contains(kw), 1).otherwise(0))
      .reduce(_ + _)

  /** Detected language over a text column — the reference argmax with
    * insertion-order tie-break (main.py:154-158). CJK/Arabic/Cyrillic
    * branches omitted: ASCII corpus (documented; scores 0 there anyway). */
  def detectLangCol(text: Column): Column = {
    val sample = lower(substring(text, 1, 1000))
    val scored = Vector("spanish", "french", "english", "german", "portuguese", "italian")
      .map(l => l -> langScoreCol(sample, l))
    val maxScore = greatest(scored.map(_._2): _*)
    val zero = scored.map(_._2).reduce(_ + _) === 0
    // Nested whens with the FIRST language outermost → first maximal wins,
    // replicating Python max() insertion-order tie-break (main.py:154).
    val firstMax = scored.reverse.foldLeft(lit("spanish")) { case (acc, (l, s)) =>
      when(s === maxScore, lit(l)).otherwise(acc)
    }
    when(zero, lit("spanish")).otherwise(firstMax)
  }

  /** DuckDB SQL for `detectLangCol` over expression `e`. Built from the same
    * keyword data so the two can't drift. */
  def detectLangSql(e: String): String = {
    val sample = s"lower(substr($e, 1, 1000))"
    def score(lang: String): String =
      LangDetect.keywords(lang)
        .map(kw => s"(CASE WHEN contains($sample, '${kw.replace("'", "''")}') THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
    val ls = Vector("spanish", "french", "english", "german", "portuguese", "italian")
    val scores = ls.map(score)
    val m = s"greatest(${scores.mkString(", ")})"
    val total = scores.mkString(" + ")
    val cases = ls.zip(scores)
      .map { case (l, s) => s"WHEN $s = $m THEN '$l'" }
      .mkString(" ")
    s"(CASE WHEN ($total) = 0 THEN 'spanish' $cases ELSE 'spanish' END)"
  }

  /** Quality signals as exact integer counts (no float parity risk):
    * words, punctuation chars, stopwords, chars. */
  def qualityCols(text: Column): Seq[(String, Column)] = Seq(
    "n_words" -> size(split(trim(text), " +")),
    "n_punct" -> length(regexp_replace(text, "[^.,;:!?]", "")),
    "n_stop" -> size(filter(split(lower(text), " "),
      w => w.isin(Stopwords: _*))),
    "n_chars" -> length(text))

  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in",
    "is", "on", "for", "with", "at", "by", "from")

  def qualitySql: Seq[(String, String)] = Seq(
    "n_words" -> "len(string_split_regex(trim(text), ' +'))",
    "n_punct" -> "length(regexp_replace(text, '[^.,;:!?]', '', 'g'))",
    "n_stop" -> s"len(list_filter(string_split(lower(text), ' '), w -> w IN (${Stopwords.map(s => s"'$s'").mkString(",")})))",
    "n_chars" -> "length(text)")

  /** BPE-ish token count: letter runs, digit runs, single other glyphs. */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def tokenCountCol(text: Column): Column =
    size(regexp_extract_all(text, lit(TokenPattern), lit(0)))
  def tokenCountSql(e: String): String =
    s"len(regexp_extract_all($e, '${TokenPattern.replace("\\", "\\\\")}'))"

  /** PII scrub (training-data hygiene): redact emails and simple phone
    * shapes with placeholder tokens, plus match counts for reporting.
    * The patterns use only RE2-safe constructs (character classes +
    * bounded repetition, no lookaround) so a DuckDB oracle evaluates the
    * SAME regexes; a real deployment extends the pattern set per policy.
    * Redaction order: emails first (the placeholder contains no digits,
    * so it can never create a new phone match). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[- ][0-9]{4}"
  def redactPiiCol(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
  def piiCountCols(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailPattern), lit(0))),
    "n_phones" -> size(regexp_extract_all(text, lit(PhonePattern), lit(0))))
  def redactPiiSql(e: String): String =
    s"regexp_replace(regexp_replace($e, '$EmailPattern', '<EMAIL>', 'g'), " +
      s"'$PhonePattern', '<PHONE>', 'g')"
  def piiCountSql(e: String): Seq[(String, String)] = Seq(
    "n_emails" -> s"len(regexp_extract_all($e, '$EmailPattern'))",
    "n_phones" -> s"len(regexp_extract_all($e, '$PhonePattern'))")

  /** Document fingerprint: md5 over the whitespace-normalized lowercase text
    * (deterministic, engine-portable; prod would use xxhash64). */
  def fingerprintCol(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "[ \\t\\n\\r]+", " ").cast("binary"))
  def fingerprintSql(e: String): String =
    s"md5(regexp_replace(lower(trim($e)), '[ \\t\\n\\r]+', ' ', 'g'))"
}
