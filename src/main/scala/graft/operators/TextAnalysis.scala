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

  /** Per-document repetition metrics (the Gopher / MassiveText repetition
    * filters, Rae et al. 2021 appendix A1.1, at word granularity):
    *
    *  - `top_token_frac`   — occurrences of the most frequent token / n
    *  - `dup_token_frac`   — tokens whose value occurs >= 2 times / n
    *  - `top_bigram_frac`  — occurrences of the most frequent word bigram
    *                         / (n - 1)
    *
    * Scale shape: everything is computed PER ROW with higher-order
    * functions — sort the token array once, then a single O(n) `aggregate`
    * pass carries (prev, run, maxRun, dupCount) through the sorted runs.
    * No explode, no shuffle, no UDF; a 100 TB corpus pays exactly one
    * projection. (The obvious explode → groupBy(doc, token) plan shuffles
    * the full token stream — ~7x the corpus bytes — to compute a per-row
    * number.)
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // run-length stats over a SORTED array: struct(maxRun, dupCount)
    def runStats(arr: Column): Column =
      aggregate(
        array_sort(arr),
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("maxRun"), lit(0L).as("dup")),
        (acc, x) => {
          val same = acc.getField("prev").isNotNull && acc.getField("prev") === x
          val run = when(same, acc.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("maxRun"), run).as("maxRun"),
            (acc.getField("dup") +
              when(run === 2L, 2L).when(run > 2L, 1L).otherwise(0L)).as("dup"))
        },
        acc => struct(acc.getField("maxRun").as("maxRun"), acc.getField("dup").as("dup")))

    val toks = col("__toks")
    val n = col("n_tokens")
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    // metrics are APPENDED to the input row (like qualityMetrics), so the
    // operator composes in a filter chain without losing the text column
    df.withColumn("__toks",
        when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), "\\s+")))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("__ts", runStats(toks))
      .withColumn("__bs", runStats(bigrams))
      .withColumn("top_token_frac",
        when(n > 0, col("__ts.maxRun").cast("double") / n).otherwise(0.0))
      .withColumn("dup_token_frac",
        when(n > 0, col("__ts.dup").cast("double") / n).otherwise(0.0))
      .withColumn("top_bigram_frac",
        when(n > 1, col("__bs.maxRun").cast("double") / (n - 1)).otherwise(0.0))
      .drop("__toks", "__ts", "__bs")
  }

  /** PII patterns shared by [[redactPii]] and the generated oracle SQL —
    * restricted to syntax with identical semantics in Java regex and RE2
    * (no backrefs, no lookaround).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\(\\d{3}\\) \\d{3}-\\d{4}", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** PII scan + redaction: per-type match counts (on the ORIGINAL text)
    * plus a redacted text column with every match replaced by its tag,
    * applied in [[piiPatterns]] order (emails first, so an address can
    * never be half-eaten by the ip rule). Pure regexp expressions —
    * codegen'd, zero shuffle; the 100 TB shape is one projection.
    */
  def redactPii(df: DataFrame, textCol: String,
                outCol: String = "text_redacted"): DataFrame = {
    val t = col(textCol)
    val counted = piiPatterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(t, lit(pat)))
    }
    val redacted = piiPatterns.foldLeft(t) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    counted.withColumn(outCol, redacted)
  }

  /** Per-group mixture weights for corpus re-balancing: for each value of
    * `byCol`, its document count, actual fraction, target fraction
    * (uniform over the observed groups unless an explicit map is given),
    * and the sampling weight `target_frac / actual_frac` that
    * [[sampleToMixture]] applies. One partial-aggregated groupBy; the
    * totals ride a single-row cross join (broadcast).
    */
  def mixtureWeights(df: DataFrame, byCol: String,
                     target: Map[String, Double] = Map.empty): DataFrame = {
    val counts = df.groupBy(byCol).agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(sum("n_docs").as("__total"), count(lit(1)).as("__k"))
    val targetFrac =
      if (target.isEmpty) lit(1.0) / col("__k")
      else {
        val m = map(target.toSeq.sortBy(_._1)
          .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        coalesce(element_at(m, col(byCol)), lit(0.0))
      }
    counts.crossJoin(broadcast(totals))
      .withColumn("actual_frac", col("n_docs").cast("double") / col("__total"))
      .withColumn("target_frac", targetFrac)
      .withColumn("weight", col("target_frac") / col("actual_frac"))
      .drop("__total", "__k")
  }

  /** Deterministic hash sampling: keep a row iff
    * `xxhash64(key, seed) mod 2^20 < frac * 2^20`. Unlike `df.sample`,
    * membership is a pure function of the key — stable across partitioning,
    * retries, and cluster size (the property a resumable 100 TB job needs),
    * and the SAME row set is selected when the job re-runs on an appended
    * table.
    */
  def deterministicSample(df: DataFrame, keyCol: String, frac: Double,
                          seed: Int = 42): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    val M = 1L << 20
    df.filter(pmod(xxhash64(col(keyCol), lit(seed)), lit(M)) < (lit(frac) * M).cast("long"))
  }

  /** Re-balance a corpus toward the [[mixtureWeights]] target mixture:
    * each group is down-sampled with probability `baseFrac * weight`
    * (capped at 1 — up-weighting beyond availability needs repetition,
    * which stays the trainer's call). Weights join in broadcast; the
    * per-row decision is the same deterministic hash as
    * [[deterministicSample]].
    */
  def sampleToMixture(df: DataFrame, byCol: String, keyCol: String,
                      weights: DataFrame, baseFrac: Double,
                      seed: Int = 42): DataFrame = {
    val M = 1L << 20
    df.join(broadcast(weights.select(col(byCol), col("weight"))), Seq(byCol))
      .filter(pmod(xxhash64(col(keyCol), lit(seed)), lit(M)) <
        (least(lit(baseFrac) * col("weight"), lit(1.0)) * M).cast("long"))
      .drop("weight")
  }

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

  /** Character-trigram language-model scoring (the CCNet/KenLM-style
    * perplexity quality filter, with a deterministic in-engine model
    * instead of an external binary): a trigram model with add-one
    * smoothing is trained on the sampled slice `sampleFilter`, then every
    * document is scored with its mean trigram log-probability
    *   avg over positions i of  ln((c3(t[i..i+2]) + 1) / (c2(t[i..i+1]) + V))
    * where c3/c2 are trigram / prefix-bigram counts in the sample and V is
    * the sample's distinct-trigram count (the smoothing denominator).
    * Low `avg_logprob` = high perplexity = out-of-distribution text — the
    * standard pre-training quality cut.
    *
    * Scale shape (optimization round: the previous form exploded every
    * document's trigrams into rows, broadcast-joined the model twice and
    * re-grouped by document — three alphabet- or corpus-wide exchanges
    * plus two broadcast builds for what is a per-row computation): the
    * model is one mapPartitions pass over the sample slice emitting
    * PRE-AGGREGATED (trigram, count) partials (rows per task bounded by
    * alphabet^3, checked against `maxModelEntries` so a pathological
    * alphabet fails loudly rather than building an unbroadcastable
    * model), summed in one tiny exchange and collected; prefix-bigram
    * counts and the vocabulary size derive from the trigram table on the
    * driver (c2(p) = sum of c3 over trigrams with prefix p — both count
    * the same sample positions). Scoring is a single NARROW mapPartitions
    * pass against the broadcast count maps — zero joins, zero wide
    * exchanges, one output row per document; per-document log-prob sums
    * accumulate left-to-right exactly like the exploded plan did, so
    * results are bit-identical. Documents shorter than 3 chars have no
    * trigrams and are dropped (score undefined), matching the SQL
    * oracle's inner-join semantics.
    */
  /** Visit every length-3 CODE-POINT window of `s` left to right (the
    * semantics of the SQL `substr` the exploded plan used); the common
    * surrogate-free case runs on plain char indexing.
    */
  private def foreachTrigram(s: String)(f: String => Unit): Unit = {
    val n = s.length
    var hasSurrogate = false
    var k = 0
    while (k < n && !hasSurrogate) { if (Character.isHighSurrogate(s.charAt(k))) hasSurrogate = true; k += 1 }
    if (!hasSurrogate) {
      var i = 0
      val last = n - 3
      while (i <= last) { f(s.substring(i, i + 3)); i += 1 }
    } else {
      val cps = s.codePointCount(0, n)
      if (cps >= 3) {
        val offs = new Array[Int](cps + 1)
        var ci = 0; var off = 0
        while (ci < cps) { offs(ci) = off; off = s.offsetByCodePoints(off, 1); ci += 1 }
        offs(cps) = n
        var i = 0
        while (i <= cps - 3) { f(s.substring(offs(i), offs(i + 3))); i += 1 }
      }
    }
  }

  /** First 2 code points of a 3-code-point gram (= SQL substr(g, 1, 2)). */
  private def prefix2(g: String): String =
    if (g.length == 3) g.substring(0, 2) // 3 chars = 3 code points
    else g.substring(0, g.offsetByCodePoints(0, 2))

  def trigramLmScore(df: DataFrame, idCol: String, textCol: String,
                     sampleFilter: Column, maxModelEntries: Long = 1L << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val t = col(textCol)
    // model: per-partition trigram counts (HashMap bounded by the alphabet),
    // one tiny exchange to merge, collected for broadcast (the model was
    // always driver-materialised — the old plan collected it into two
    // broadcast relations)
    val partials = df.filter(sampleFilter).filter(length(t) >= 3)
      .select(t.cast("string")).as[String]
      .mapPartitions { texts =>
        val m = new java.util.HashMap[String, Long]()
        texts.foreach(s => foreachTrigram(s)(g => m.merge(g, 1L, (a, b) => a + b)))
        val it = m.entrySet().iterator()
        new Iterator[(String, Long)] {
          def hasNext: Boolean = it.hasNext
          def next(): (String, Long) = { val e = it.next(); (e.getKey, e.getValue) }
        }
      }
    val c3Rows = partials.groupBy("_1").agg(sum("_2").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val vCount = c3Rows.length.toLong
    require(vCount > 0, "trigramLmScore: sampleFilter matched no scoreable text " +
      "(empty training sample would make every score NULL)")
    require(vCount <= maxModelEntries,
      s"trigram model has $vCount entries > maxModelEntries=$maxModelEntries — " +
        "not a bounded-alphabet corpus; raise the cap only if the model still broadcasts")
    val c3Map = new java.util.HashMap[String, Long](c3Rows.length * 2)
    val c2Map = new java.util.HashMap[String, Long](c3Rows.length)
    c3Rows.foreach { case (g, c) =>
      c3Map.put(g, c)
      val p = prefix2(g)
      c2Map.put(p, c2Map.getOrDefault(p, 0L) + c)
    }
    val c3B = spark.sparkContext.broadcast(c3Map)
    val c2B = spark.sparkContext.broadcast(c2Map)
    val v = vCount

    // scoring: one narrow pass, no explode / join / re-group; the log-prob
    // sum runs left-to-right over each document exactly as the exploded
    // rows did, so avg_logprob is bit-identical
    val in = df.filter(length(t) >= 3).select(col(idCol), t.cast("string").as("__t"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.head,
      org.apache.spark.sql.types.StructField("n_trigrams",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("avg_logprob",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      val c3m = c3B.value
      val c2m = c2B.value
      rows.map { r =>
        val s = r.getString(1)
        var sum = 0.0
        var n = 0L
        foreachTrigram(s) { g =>
          val cg = c3m.getOrDefault(g, 0L)
          val cp = c2m.getOrDefault(prefix2(g), 0L)
          sum += math.log((cg + 1).toDouble / (cp + v))
          n += 1
        }
        org.apache.spark.sql.Row(r.get(0), n, sum / n)
      }
    }(enc)
  }

  /** Greedy in-order sequence packing (training-batch construction):
    * within each `chunkCol` group, documents are visited in ascending
    * `idCol` order and appended to the current bin while it stays within
    * `budget` tokens; a document that does not fit starts the next bin
    * (so a document longer than the budget gets a bin of its own — the
    * packer never splits documents). Returns
    * `(idCol, chunkCol, n_tokens, bin, bin_fill)` where `bin` is 0-based
    * within the chunk and `bin_fill` is the bin's running token total
    * after this document.
    *
    * Scale shape: the CHUNK is the unit of parallelism — packing is
    * inherently sequential inside a chunk (each decision depends on the
    * previous fill), so the plan is the canonical secondary sort: one
    * hash exchange on the chunk key, an in-partition sort by (chunk, id),
    * and a single streaming `mapPartitions` pass that resets its (bin,
    * fill) state at chunk boundaries — no per-group materialisation, no
    * window over the token stream, memory O(1) per task. Choose chunks
    * sized to the shuffle-writer sweet spot (e.g. a crawl shard); skew is
    * bounded by the largest chunk, not the largest bin.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: Column,
                    chunkCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(col(idCol).cast("long").as("id"),
        chunkCol.cast("long").as("chunk"),
        tokenCountCol.cast("long").as("n_tokens"))
      .as[(Long, Long, Long)]
      .repartition(col("chunk"))
      .sortWithinPartitions(col("chunk"), col("id"))
    prepared.mapPartitions { rows =>
      var curChunk = Long.MinValue
      var bin = -1L
      var fill = 0L
      var first = true
      rows.map { case (id, chunk, n) =>
        if (first || chunk != curChunk) {
          curChunk = chunk; bin = 0L; fill = n; first = false
        } else if (fill + n <= budget) {
          fill += n
        } else {
          bin += 1L; fill = n
        }
        (id, chunk, n, bin, fill)
      }
    }.toDF(idCol, "chunk", "n_tokens", "bin", "bin_fill")
  }
}
