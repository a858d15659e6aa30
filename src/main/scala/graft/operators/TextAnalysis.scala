package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline: token counting, quality
  * scoring, language identification, and document fingerprinting — all as
  * declarative Column expressions (whole-stage codegen; no UDFs on the hot
  * path except the winnow fingerprint expression).
  */
object TextAnalysis {

  /** whitespace token count (0 for blank). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: words are split every `chunk` chars (an upper
    * bound proxy for byte-pair tokens; deterministic and cheap).
    */
  def subwordCount(text: Column, chunk: Int = 4): Column =
    aggregate(
      transform(split(trim(text), "\\s+"), w => ceil(length(w).cast("double") / chunk).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Winnow SELECTION stage (Schleimer et al., SIGMOD 2003 §4) over a
    * precomputed rolling-hash array column: min per sliding window of
    * `window` hashes, distinct — fully declarative (transform/slice/
    * array_min stay in whole-stage codegen, no shuffle until the caller
    * aggregates). This is the q24-style from-sig split of the
    * winnow_fingerprint expression: the k-gram bit-mixing hash itself is
    * golden-tested (ExpressionsSpec), while the scale-relevant window-min
    * machinery here is DuckDB-oracle-checkable on synthetic hash arrays.
    * Semantics match TextHash.winnow: an array shorter than `window`
    * yields its single overall min.
    */
  def winnowFromHashes(df: DataFrame, idCol: String, hashCol: String,
                       window: Int, outCol: String = "fingerprint"): DataFrame = {
    val hs = col(hashCol)
    val mins = transform(
      sequence(lit(0), greatest(size(hs) - window, lit(0))),
      i => array_min(slice(hs, i + 1, lit(window))))
    df.select(col(idCol), explode(array_distinct(mins)).as(outCol))
  }

  /** Per-document quality metrics (length / punctuation / stopword /
    * digit / repetition ratios) — the usual pre-training filters.
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // materialise the token array ONCE — the per-metric expressions below
    // reference the column, not the split, so codegen runs the regex split
    // a single time per row instead of once per metric
    val toks = col("__toks")
    val stop = Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val isStop = (w: Column) => stop.foldLeft(lit(false))((acc, s) => acc || w === s)
    df.withColumn("__toks", split(trim(t), "\\s+"))
      .withColumn("n_chars", length(t))
      .withColumn("n_tokens", when(length(trim(t)) === 0, 0).otherwise(size(toks)))
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0, (length(trim(t)) - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
          .otherwise(0.0))
      .withColumn("punct_ratio",
        when(length(t) > 0, (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("double") / length(t))
          .otherwise(0.0))
      .withColumn("digit_ratio",
        when(length(t) > 0, (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double") / length(t))
          .otherwise(0.0))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0,
          size(filter(toks, isStop)).cast("double") / col("n_tokens")).otherwise(0.0))
      .withColumn("distinct_token_ratio",
        when(col("n_tokens") > 0,
          size(array_distinct(toks)).cast("double") / col("n_tokens")).otherwise(0.0))
      .drop("__toks")
  }

  /** Composite quality score in [0, 1]: length band + low punctuation +
    * vocabulary diversity (deterministic arithmetic only).
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityMetrics(df, textCol).withColumn("quality_score",
      (when(col("n_tokens").between(10, 10000), 0.4).otherwise(0.0) +
        when(col("punct_ratio") < 0.1, 0.3).otherwise(0.0) +
        col("distinct_token_ratio") * 0.3))

  /** language-marker token sets for the n-gram/stopword language-ID
    * heuristic (top function words per language).
    */
  /** Marker (function-word) profiles for space-delimited languages. CJK
    * languages are detected by Unicode script range instead — romanized
    * marker lists can never fire on real Han/Kana/Hangul text (it has no
    * whitespace tokens).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "im", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "dans", "que", "une", "pour"))

  /** Language-ID heuristic, declarative (one pass, no UDF):
    *  1. script-range detection for CJK — any Kana => "ja", any Hangul =>
    *     "ko", Han fraction of non-space chars > 0.05 => "zh";
    *  2. otherwise marker-token scoring: score = fraction of tokens that
    *     are markers of each language; argmax wins (ties resolve to the
    *     lexicographically largest language, the array_max struct order);
    *  3. "und" when nothing fires.
    */
  def langId(df: DataFrame, textCol: String, outCol: String = "lang_pred"): DataFrame = {
    val t = col(textCol)
    val nKana = length(t) - length(regexp_replace(t, "[\\u3040-\\u30FF]", ""))
    val nHangul = length(t) - length(regexp_replace(t, "[\\uAC00-\\uD7AF]", ""))
    val nHan = length(t) - length(regexp_replace(t, "[\\u4E00-\\u9FFF]", ""))
    val nNonSpace = length(regexp_replace(t, "\\s", ""))
    val toks = split(lower(trim(t)), "\\s+")
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val isMarker = (w: Column) => markers.foldLeft(lit(false))((acc, m) => acc || w === m)
      struct((size(filter(toks, isMarker)).cast("double") / greatest(size(toks), lit(1))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    df.withColumn(outCol,
      when(nKana > 0, "ja")
        .when(nHangul > 0, "ko")
        .when(nHan.cast("double") / greatest(nNonSpace, lit(1)) > 0.05, "zh")
        .when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit("und")))
  }
}
