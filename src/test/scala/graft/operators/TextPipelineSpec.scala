package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextPipelineSpec extends AnyFunSuite with SparkTestBase
    with org.scalactic.Tolerance {
  import spark.implicits._

  // ----- repetition metrics (Gopher A1.1 at word granularity) -----

  test("repetitionMetrics: hand-computed fractions") {
    val docs = Seq(
      (1L, "a b a c a b"), // 6 toks: a=3 b=2 c=1; top=3/6, dup=(3+2)/6; bigrams: "a b"x2 of 5
      (2L, "x y z"),       // all distinct: top=1/3, dup=0, bigrams all distinct: 1/2
      (3L, "w"),           // single token: top=1, dup=0, no bigrams
      (4L, "")             // empty: all zero
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "top_token_frac", "dup_token_frac", "top_bigram_frac")
      .orderBy("doc_id").collect()

    assert(m(0).getLong(1) === 6L)
    assert(math.abs(m(0).getDouble(2) - 3.0 / 6) < 1e-12) // top_token_frac
    assert(math.abs(m(0).getDouble(3) - 5.0 / 6) < 1e-12) // dup_token_frac
    assert(math.abs(m(0).getDouble(4) - 2.0 / 5) < 1e-12) // top_bigram_frac

    assert(m(1).getLong(1) === 3L)
    assert(math.abs(m(1).getDouble(2) - 1.0 / 3) < 1e-12)
    assert(m(1).getDouble(3) === 0.0)
    assert(math.abs(m(1).getDouble(4) - 1.0 / 2) < 1e-12)

    assert(m(2).getLong(1) === 1L && m(2).getDouble(2) === 1.0 &&
      m(2).getDouble(3) === 0.0 && m(2).getDouble(4) === 0.0)

    assert(m(3).getLong(1) === 0L && m(3).getDouble(2) === 0.0 &&
      m(3).getDouble(3) === 0.0 && m(3).getDouble(4) === 0.0)
  }

  test("repetitionMetrics agrees with an explode/groupBy replay") {
    val docs = (0L until 200L).map { i =>
      val words = (0 until (5 + (i % 37)).toInt)
        .map(j => s"w${(j * (1 + i % 7)) % 11}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")

    val got = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")

    val tok = docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
    val tc = tok.groupBy("doc_id", "w").count()
    val ta = tc.groupBy("doc_id").agg(
      max("count").as("mx"), sum("count").as("n"),
      sum(when(col("count") >= 2, col("count")).otherwise(0L)).as("dup"))
    val bg = docs.select(col("doc_id"),
        explode(zip_with(
          slice(split(trim(col("text")), "\\s+"), lit(1), greatest(size(split(trim(col("text")), "\\s+")) - 1, lit(0))),
          slice(split(trim(col("text")), "\\s+"), lit(2), greatest(size(split(trim(col("text")), "\\s+")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("b"))
      .groupBy("doc_id", "b").count()
      .groupBy("doc_id").agg(max("count").as("bmx"))
    val want = ta.join(bg, Seq("doc_id"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        (col("mx").cast("double") / col("n")).as("top_token_frac"),
        (col("dup").cast("double") / col("n")).as("dup_token_frac"),
        (col("bmx").cast("double") / (col("n") - 1)).as("top_bigram_frac"))

    val diff = got.join(want.withColumnRenamed("n_tokens", "n2")
        .withColumnRenamed("top_token_frac", "t2")
        .withColumnRenamed("dup_token_frac", "d2")
        .withColumnRenamed("top_bigram_frac", "b2"), Seq("doc_id"))
      .filter(col("n_tokens") =!= col("n2") ||
        abs(col("top_token_frac") - col("t2")) > 1e-12 ||
        abs(col("dup_token_frac") - col("d2")) > 1e-12 ||
        abs(col("top_bigram_frac") - col("b2")) > 1e-12)
    assert(diff.count() === 0)
  }

  test("repetitionMetrics plan has no shuffle (per-row computation)") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val plan = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"),
      s"repetition metrics must not shuffle:\n$plan")
  }

  // ----- PII redaction -----

  test("redactPii counts and redacts emails, phones, ipv4 in order") {
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or (555) 123-4567 from 192.168.0.1 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.co and ips 10.0.0.1 10.0.0.2 10.0.0.3")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(docs, "text").orderBy("doc_id").collect()

    assert(r(0).getAs[Int]("n_email") === 1)
    assert(r(0).getAs[Int]("n_phone") === 1)
    assert(r(0).getAs[Int]("n_ipv4") === 1)
    assert(r(0).getAs[String]("text_redacted") ===
      "reach me at <EMAIL> or <PHONE> from <IP> ok")

    assert(r(1).getAs[Int]("n_email") === 0 && r(1).getAs[Int]("n_phone") === 0 &&
      r(1).getAs[Int]("n_ipv4") === 0)
    assert(r(1).getAs[String]("text_redacted") === "no pii here at all")

    assert(r(2).getAs[Int]("n_email") === 2 && r(2).getAs[Int]("n_ipv4") === 3)
    assert(r(2).getAs[String]("text_redacted") ===
      "two mails <EMAIL> <EMAIL> and ips <IP> <IP> <IP>")
  }

  test("redactPii plan has no shuffle and no UDF") {
    val docs = Seq((1L, "x@y.zz")).toDF("doc_id", "text")
    val plan = TextAnalysis.redactPii(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"))
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  // ----- mixture weights + deterministic sampling -----

  test("mixtureWeights: uniform target, fractions sum to 1, weight math") {
    val docs = (0L until 100L).map(i => (i, if (i < 60) "a" else if (i < 90) "b" else "c"))
      .toDF("doc_id", "source")
    val w = TextAnalysis.mixtureWeights(docs, "source").orderBy("source").collect()
    assert(w.map(_.getAs[Double]("actual_frac")).sum === 1.0 +- 1e-12)
    val a = w(0)
    assert(a.getAs[Long]("n_docs") === 60L)
    assert(a.getAs[Double]("target_frac") === 1.0 / 3 +- 1e-12)
    assert(a.getAs[Double]("weight") === (1.0 / 3) / 0.6 +- 1e-12)
  }

  test("mixtureWeights: explicit target map, missing source gets weight 0") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("doc_id", "source")
    val w = TextAnalysis.mixtureWeights(docs, "source",
        target = Map("a" -> 0.8, "b" -> 0.2))
      .orderBy("source").collect()
    assert(w(0).getAs[Double]("target_frac") === 0.8 +- 1e-12)
    assert(w(1).getAs[Double]("target_frac") === 0.2 +- 1e-12)
    assert(w(2).getAs[Double]("target_frac") === 0.0) // c not in target
    assert(w(2).getAs[Double]("weight") === 0.0)
  }

  test("deterministicSample: stable across partitioning, fraction within tolerance") {
    val docs = (0L until 20000L).map(i => Tuple1(i)).toDF("doc_id")
    val s1 = TextAnalysis.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val s2 = TextAnalysis.deterministicSample(docs.repartition(13), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "membership must be a pure function of the key")
    assert(math.abs(s1.size / 20000.0 - 0.25) < 0.02)
    // a superset table keeps exactly the same selected rows
    val s3 = TextAnalysis.deterministicSample(
      (0L until 40000L).map(i => Tuple1(i)).toDF("doc_id"), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("sampleToMixture: per-source rates track baseFrac * weight, deterministic") {
    val docs = (0L until 30000L).map(i => (i, if (i % 3 < 2) "big" else "small"))
      .toDF("doc_id", "source") // big: 20k, small: 10k
    val w = TextAnalysis.mixtureWeights(docs, "source") // uniform: weight big=0.75, small=1.5
    val out = TextAnalysis.sampleToMixture(docs, "source", "doc_id", w, baseFrac = 0.4)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("big") / 20000.0 - 0.4 * 0.75) < 0.02)   // rate 0.30
    assert(math.abs(counts("small") / 10000.0 - 0.4 * 1.5) < 0.03)  // rate 0.60
    val again = TextAnalysis.sampleToMixture(docs.repartition(7), "source", "doc_id", w, baseFrac = 0.4)
    assert(again.count() === out.count())
  }

  test("trigramLmScore: hand-computed add-one smoothed log-probs, short docs dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd"), // the sample: trigrams abc,bcd -> c3=1 each; c2(ab)=c2(bc)=1; V=2
      (2L, "abc"),  // ln((1+1)/(1+2))
      (3L, "xbcd"), // xbc: ln(1/(0+2)); bcd: ln(2/3)
      (4L, "ab")    // < 3 chars -> no score row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.trigramLmScore(docs, "doc_id", "text",
        sampleFilter = col("doc_id") === 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) === Seq((1L, 2L), (2L, 1L), (3L, 2L)))
    val eps = 1e-12
    assert(math.abs(got(0)._3 - math.log(2.0 / 3)) < eps)
    assert(math.abs(got(1)._3 - math.log(2.0 / 3)) < eps)
    assert(math.abs(got(2)._3 - (math.log(0.5) + math.log(2.0 / 3)) / 2) < eps)
  }

  test("packSequences: greedy fill, oversized doc gets its own bin, chunk resets state") {
    import spark.implicits._
    val docs = Seq(
      (0L, 0L, 4L), (1L, 0L, 5L),   // bin 0: 4 -> 9
      (2L, 0L, 2L),                 // 9+2 > 10 -> bin 1: 2
      (3L, 0L, 9L),                 // bin 2: 9
      (4L, 0L, 10L),                // bin 3: 10 (exactly budget)
      (5L, 0L, 11L),                // oversized -> bin 4 alone: 11
      (6L, 1L, 7L), (7L, 1L, 3L)    // new chunk -> bin 0: 7 -> 10
    ).toDF("doc_id", "chunk0", "ntok")
    val got = TextAnalysis.packSequences(docs, "doc_id", col("ntok"), col("chunk0"), budget = 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((0L, 0L, 4L), (1L, 0L, 9L), (2L, 1L, 2L), (3L, 2L, 9L),
      (4L, 3L, 10L), (5L, 4L, 11L), (6L, 0L, 7L), (7L, 0L, 10L)))
  }

  test("packSequences conserves tokens: per-chunk sum of n_tokens equals the input sum") {
    import spark.implicits._
    val docs = (0L until 3000L).map(i => (i, i / 300L, 1L + (i * 13) % 50)).toDF("doc_id", "c", "n")
    val out = TextAnalysis.packSequences(docs, "doc_id", col("n"), col("c"), budget = 97L)
    val got = out.groupBy("chunk").agg(sum("n_tokens").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.groupBy("c").agg(sum("n").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("packSequences: bins never exceed budget except single oversized docs; stable across partitioning") {
    import spark.implicits._
    val docs = (0L until 5000L).map(i => (i, i / 250L, 1L + (i * 37) % 90)).toDF("doc_id", "c", "n")
    val out = TextAnalysis.packSequences(docs, "doc_id", col("n"), col("c"), budget = 128L).cache()
    val binTotals = out.groupBy("chunk", "bin")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("k"))
    assert(binTotals.filter(col("tot") > 128 && col("k") > 1).count() === 0L)
    val again = TextAnalysis.packSequences(docs.repartition(17), "doc_id", col("n"), col("c"), budget = 128L)
    assert(again.orderBy("doc_id").collect().toSeq === out.orderBy("doc_id").collect().toSeq)
    out.unpersist()
  }

  test("trigramLmScore: in-distribution text outscores out-of-alphabet text") {
    import spark.implicits._
    val docs = ((0L until 50L).map(i => (i, s"spark query plan number ${i % 7} runs fast")) :+
      (99L, "zzqx jjvv qqww kkxx zzyy")).toDF("doc_id", "text")
    val scores = TextAnalysis.trigramLmScore(docs, "doc_id", "text",
        sampleFilter = col("doc_id") % 5 === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val inDist = (0L until 50L).map(scores).min
    assert(scores(99L) < inDist, s"gibberish ${scores(99L)} must score below $inDist")
  }
}
