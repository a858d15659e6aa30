package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (4L, "completely different content about spark catalyst optimizer internals and codegen"),
    (5L, "another unrelated document mentioning gaussian process interpolation on sea ice")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts duplicates") {
    val got = Dedup.exact(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(got.length === 4)
    assert(got.head.getLong(0) === 1L && got.head.getLong(2) === 2L) // id 1 survives with dup_count 2
  }

  test("exact dedup shuffles 8-byte hash keys, not multi-KB document text") {
    val big = Seq.tabulate(20) { i =>
      (i.toLong, ("lorem ipsum dolor sit amet " * 400) + (i % 5)) // ~10 KB each, 5 distinct
    }.toDF("doc_id", "text")
    val out = Dedup.exact(big, "doc_id", "text")
    assert(out.count() === 5)
    assert(out.agg(sum("dup_count")).head().getLong(0) === 20L)
    // the exchange must partition on the 64-bit text hash (Catalyst
    // aliases it _groupingexpression#NL, a LongType key), never on text
    val plan = out.queryExecution.executedPlan.toString
    val parts = "hashpartitioning\\(([^,]+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(parts.nonEmpty && parts.forall(p => !p.startsWith("text#")),
      s"shuffle key must be the text hash, got $parts:\n$plan")
    assert(parts.forall(_.endsWith("L")), s"shuffle key must be an 8-byte long, got $parts")
    assert(out.queryExecution.analyzed.toString.contains("xxhash64"),
      "group key must be xxhash64(text)")
  }

  test("transitive closure differs from greedy on a common-neighbour chain") {
    // pairs (1,3) and (2,3): greedy keeps {1,2} (only 3 ever appears as
    // idB); closure sees one component {1,2,3} and keeps only min id 1
    val ddocs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "unpaired")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("idA", "idB")
    val greedy = Dedup.dropDuplicatesByPairs(ddocs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    val closure = Dedup.dropDuplicatesByPairs(ddocs, "doc_id", pairs, transitive = true)
      .select("doc_id").as[Long].collect().toSet
    assert(greedy === Set(1L, 2L, 9L))
    assert(closure === Set(1L, 9L))
  }

  test("dedupAgainstArchive equals the plain anti-join, and the bloom prefilter screens") {
    // archive: 500 docs; batch: 400 docs of which 100 duplicate archive texts
    val archive = (0L until 500L).map(i => (i, s"archived document number $i with shared words"))
      .toDF("doc_id", "text")
    val batch = (1000L until 1400L).map { i =>
      val txt = if (i % 4 == 0) s"archived document number ${i % 500} with shared words"
                else s"fresh batch document $i never seen before"
      (i, txt)
    }.toDF("doc_id", "text")

    val got = Dedup.dedupAgainstArchive(batch, archive, "text",
      expectedArchiveItems = 1000L, fpp = 0.001)
      .select("doc_id").as[Long].collect().toSet
    val want = batch.join(archive.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
    assert(got.size === 300)

    // the prefilter really screens: at fpp 0.001 on 300 fresh texts the
    // bloom-positive set is the 100 true dupes plus at most a few false
    // positives — the confirm anti-join never sees most of the batch
    val archHash = archive.select(xxhash64(col("text")).as("_arch_hash"))
    val bloom = archHash.stat.bloomFilter("_arch_hash", 1000L, 0.001)
    val positives = batch.withColumn("_h", xxhash64(col("text")))
      .as[(Long, String, Long)].collect().count(r => bloom.mightContainLong(r._3))
    assert(positives >= 100 && positives <= 110,
      s"bloom positives should be ~the 100 true dupes, got $positives")
  }

  test("connected components: labels over a multi-hop chain, union-find AND distributed paths") {
    // chain 5-4, 4-2, 2-7 plus isolated pair 10-11: components {2,4,5,7}->2, {10,11}->10
    val pairs = Seq((4L, 5L), (2L, 4L), (2L, 7L), (10L, 11L)).toDF("idA", "idB")
    val want = Map(2L -> 2L, 4L -> 2L, 5L -> 2L, 7L -> 2L, 10L -> 10L, 11L -> 10L)
    val uf = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf === want)
    // driverMaxEdges=0 forces the distributed pointer-jumping hash-min loop
    val dist = Dedup.connectedComponents(pairs, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === want)
  }

  test("connected components: both paths agree on a larger random-ish graph") {
    val rnd = Seq.tabulate(400) { i =>
      val a = (i * 37L) % 211
      val b = (i * 53L + 11) % 211
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val pairs = rnd.toDF("idA", "idB")
    val uf = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf === dist)
    // labels are component minima: every label maps to itself
    uf.values.foreach(l => assert(uf(l) === l))
  }

  test("minhashParams picks the S-curve midpoint closest to the threshold") {
    // k=64: (1/8)^(1/8) = 0.771, (1/16)^(1/4) = 0.5, (1/4)^(1/16) = 0.917
    assert(Dedup.minhashParams(64, 0.7) === ((8, 8)))
    assert(Dedup.minhashParams(64, 0.5) === ((16, 4)))
    assert(Dedup.minhashParams(64, 0.9) === ((4, 16)))
    // midpoint property holds for the pick
    val (b, r) = Dedup.minhashParams(128, 0.8)
    assert(b * r === 128)
    assert(math.abs(math.pow(1.0 / b, 1.0 / r) - 0.8) < 0.12)
  }

  test("minhash pairs find the exact and near duplicate, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup must be found")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), "near dup should be found")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc must not pair")
  }

  test("greedy dedup drops the larger id of each pair") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.9)
    val kept = Dedup.dropDuplicatesByPairs(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L))
  }

  test("simhash pairs: hamming bound holds exactly (pigeonhole banding is complete)") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10).collect()
    // verify against brute force over all pairs
    val sigs = docs.select(col("doc_id"), graft.functions.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 10
    } yield (a, b, h)).toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet === brute)
  }

  test("ngram jaccard matches brute-force set jaccard") {
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def grams(s: String): Set[String] =
      s.split("\\s+").sliding(2).map(_.mkString(" ")).toSet
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val brute = (for {
      a <- texts.keys; b <- texts.keys if a < b
      ga = grams(texts(a)); gb = grams(texts(b))
      j = ga.intersect(gb).size.toDouble / ga.union(gb).size if j >= 0.3
    } yield (a, b) -> j).toMap
    assert(got.keySet === brute.keySet)
    for ((k, v) <- brute) assert(math.abs(got(k) - v) < 1e-12)
  }

  test("embedding cosine LSH finds a duplicated vector") {
    val vecs = Seq(
      (1L, Seq.tabulate(64)(i => math.sin(i * 0.3).toFloat)),
      (2L, Seq.tabulate(64)(i => math.sin(i * 0.3).toFloat)), // identical to 1
      (3L, Seq.tabulate(64)(i => math.cos(i * 1.7).toFloat))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.cosinePairsLsh(vecs, "vec_id", "embedding", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("duplicatedPassageStats: shared passage coverage, interval union, intra-doc repeats") {
    val docs = Seq(
      (1L, "a b c d e f g h"),       // shares "a b c d e" + "b c d e f" with doc 2
      (2L, "x a b c d e f y"),
      (3L, "p q r s t u"),           // all grams unique -> 0 covered
      (4L, "m n o p2 q2 m n o p2 q2"), // intra-doc repeat of "m n o p2 q2" -> fully covered
      (5L, "t u v")                  // shorter than n -> no grams
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedPassageStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1: dup starts {0,1} -> [0,6) = 6; doc2: starts {1,2} -> [1,7) = 6;
    // doc4: starts {0,5} -> [0,5)+[5,10) = 10
    assert(got === Seq((1L, 8L, 6L), (2L, 8L, 6L), (3L, 6L, 0L),
      (4L, 10L, 10L), (5L, 3L, 0L)))
    val fr = Dedup.duplicatedPassageStats(docs, "doc_id", "text")
      .filter(col("doc_id") === 1).head().getDouble(3)
    assert(math.abs(fr - 0.75) < 1e-12)
  }

  test("cutDuplicatedPassages: covered tokens removed, survivors re-joined in order") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x a b c d e f y"),
      (3L, "p q r s t u"),
      (4L, "m n o p2 q2 m n o p2 q2"),
      (5L, "t u v")
    ).toDF("doc_id", "text")
    val got = Dedup.cutDuplicatedPassages(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "g h"), (2L, "x y"), (3L, "p q r s t u"),
      (4L, ""), (5L, "t u v")))
  }

  test("duplicated-passage plans shuffle 8-byte gram keys and bare (id, pos) pairs, never text") {
    val big = Seq.tabulate(20) { i =>
      (i.toLong, ("lorem ipsum dolor sit amet " * 400) + (i % 5))
    }.toDF("doc_id", "text")
    for (out <- Seq(Dedup.duplicatedPassageStats(big, "doc_id", "text"),
                    Dedup.cutDuplicatedPassages(big, "doc_id", "text"))) {
      val plan = out.queryExecution.executedPlan.toString
      val parts = "hashpartitioning\\(([^,]+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(parts.nonEmpty && parts.forall(p =>
        !p.startsWith("text#") && !p.startsWith("__toks#")),
        s"shuffle keys must be gram hashes or ids, got $parts")
      // every wide exchange ships longs/ints (gh, id, pos) — the token
      // array re-enters only via the post-aggregation join on the id
      assert(parts.forall(p => p.endsWith("L") || p.startsWith("doc_id#")),
        s"shuffle keys must be 8-byte keys or the doc id, got $parts")
    }
  }

  test("stats-vs-cut consistency: kept token count always equals n_tokens - n_dup_tokens") {
    val docs = (0L until 300L).map(i =>
      (i, (0 until 15 + (i % 9).toInt).map(j => s"v${(i * 5 + j * 2) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val stats = Dedup.duplicatedPassageStats(docs, "doc_id", "text")
      .select(col("doc_id"), (col("n_tokens") - col("n_dup_tokens")).as("kept"))
    val cut = Dedup.cutDuplicatedPassages(docs, "doc_id", "text")
      .select(col("doc_id"),
        when(length(trim(col("text_deduped"))) === 0, 0L)
          .otherwise(size(split(trim(col("text_deduped")), "\\s+")).cast("long")).as("kept2"))
    val diff = stats.join(cut, Seq("doc_id"))
      .filter(col("kept") =!= col("kept2")).count()
    assert(diff === 0L)
  }

  test("duplicatedPassageStats: repartitioning does not change the stats") {
    val docs = (0L until 200L).map(i =>
      (i, (0 until 20).map(j => s"w${(i * 7 + j * 3) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Dedup.duplicatedPassageStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.duplicatedPassageStats(docs.repartition(11), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("leakageFreeSplit: every component lands whole on one side; fraction tracks valFrac") {
    val n = 20000L
    val docs = (0L until n).toDF("doc_id")
    // chains of 4: (4k, 4k+1), (4k+1, 4k+2), (4k+2, 4k+3)
    val pairs = (0L until n by 4).flatMap(k =>
      Seq((k, k + 1), (k + 1, k + 2), (k + 2, k + 3))).toDF("idA", "idB")
    val out = Dedup.leakageFreeSplit(docs, "doc_id", pairs, valFrac = 0.25)
    val sides = out.withColumn("comp", col("doc_id") - col("doc_id") % 4)
      .groupBy("comp").agg(countDistinct("split").as("k"))
      .agg(max("k")).head().getLong(0)
    assert(sides === 1L, "a component straddled the split")
    val valFrac = out.filter(col("split") === "val").count().toDouble / n
    assert(math.abs(valFrac - 0.25) < 0.02, s"val fraction $valFrac")
    // stable across partitioning (pure function of the representative)
    val again = Dedup.leakageFreeSplit(docs.repartition(13), "doc_id", pairs, valFrac = 0.25)
    assert(again.filter(col("split") === "val").count() ===
      out.filter(col("split") === "val").count())
  }
}

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val items = Seq.tabulate(50) { i =>
    (i.toLong, Seq.tabulate(16)(j => (math.sin(i * 0.7 + j) + 0.1 * i).toFloat))
  }.toDF("vec_id", "embedding")

  test("brute-force top-k is exact vs manual computation") {
    val q = items.filter(col("vec_id") === 7)
    val got = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .orderBy("rank").collect().map(_.getLong(1))
    // manual
    val all = items.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val qv = all.find(_._1 == 7L).get._2
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = all.map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got.toSeq === want.toSeq)
    assert(got.head === 7L) // self is most similar
  }

  test("assignClusters: every item gets its argmax centroid; item table never hash-shuffles") {
    val out = SimilaritySearch.assignClusters(items.repartition(8), "vec_id", "embedding", nlist = 4)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === items.count())
    // brute-force argmax replay (ties -> smaller centroid id)
    val vecs = items.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (u, v) => u * v }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cents = vecs.keys.toSeq.sorted.take(4).map(id => id -> vecs(id))
    for ((id, v) <- vecs) {
      val best = cents.map { case (cid, cv) => (-cos(v, cv), cid) }.min._2
      assert(got(id) === best, s"item $id")
    }
    // scale shape: assignment is a per-row expression over the broadcast
    // codebook — zero hash exchange of the item table
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 0, s"assignment must not shuffle items:\n$plan")
  }

  test("brute-force plan: one Exchange total — per-partition heaps bound the rank input") {
    val q = items.filter(col("vec_id") < 3)
    // many partitions + multiple queries: the old global per-query window
    // funnelled every item score through one reducer per query
    val out = SimilaritySearch.bruteForceTopK(items.repartition(8), q,
      "vec_id", "embedding", "vec_id", 5)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected the single final-rank exchange, got $exchanges:\n$plan")
    // exactness survives partitioning: identical to the 1-partition run
    val a = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = SimilaritySearch.bruteForceTopK(items.coalesce(1), q,
      "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a === b)
  }

  test("IVF top-k returns k results with self as rank 1 and high recall vs brute force") {
    val q = items.filter(col("vec_id") < 5)
    val ivf = SimilaritySearch.ivfTopK(items, q, "vec_id", "embedding", "vec_id", 5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall")
    assert((0 until 5).forall(i => ivf.contains((i.toLong, i.toLong))), "self must be found")
  }

  test("SQ8: byte codes in range, near-exact recall, one-exchange plan") {
    val q = items.filter(col("vec_id") < 5)
    val (mins, maxs) = SimilaritySearch.sqTrainBounds(items, "embedding")
    assert(mins.length === 16 && maxs.length === 16)
    assert(mins.lazyZip(maxs).forall(_ <= _))
    val encoded = SimilaritySearch.sqEncode(items, "vec_id", "embedding", mins, maxs)
    val codes = encoded.select(explode(col("codes"))).collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c <= 255))
    assert(codes.max === 255 && codes.min === 0) // bounds are tight
    // 255 quantization levels: the top-5 should match brute force exactly
    // on this well-separated fixture, self at rank 1
    val sq = SimilaritySearch.sqTopK(items.repartition(8), q,
      "vec_id", "embedding", "vec_id", 5)
    // capture the plan BEFORE the action (post-AQE strings repeat each
    // materialized exchange inside its ShuffleQueryStage wrapper)
    val plan = sq.queryExecution.executedPlan.toString
    val got = sq.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val brute = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val recall = got.map(t => (t._1, t._2))
      .intersect(brute.map(t => (t._1, t._2))).size.toDouble / brute.size
    assert(recall >= 0.9, s"SQ8 recall $recall")
    assert((0 until 5).forall(i => got.contains((i.toLong, i.toLong, 1))), "self at rank 1")
    // same plan shape as brute force: the single final-rank exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected one exchange, got $exchanges:\n$plan")
    // constant dimension: span 0 encodes to 0, no NaN scores
    val const = items.select(col("vec_id"),
      transform(col("embedding"), x => lit(1.0f)).as("embedding"))
    val (cm, cx) = SimilaritySearch.sqTrainBounds(const, "embedding")
    val cEnc = SimilaritySearch.sqEncode(const, "vec_id", "embedding", cm, cx)
    assert(cEnc.select(explode(col("codes"))).collect().map(_.getInt(0)).forall(_ == 0))
  }

  test("IVF-SQ8: coarse pruning + byte-code scoring keeps recall, self found") {
    val q = items.filter(col("vec_id") < 5)
    val got = SimilaritySearch.ivfSqTopK(items, q, "vec_id", "embedding",
      "vec_id", 5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF-SQ8 recall $recall")
    assert((0 until 5).forall(i => got.contains((i.toLong, i.toLong))), "self must be found")
    // pruning is real: IVF-SQ candidates per query <= the probed share
    val ivfOnly = SimilaritySearch.ivfTopK(items, q, "vec_id", "embedding",
      "vec_id", 5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.intersect(ivfOnly).size.toDouble / ivfOnly.size >= 0.6,
      "SQ scoring should mostly agree with exact scoring over the same candidates")
  }

  test("PQ: codes are m small ints, ADC top-k holds recall vs brute force") {
    val q = items.filter(col("vec_id") < 5)
    // encode: 16-dim vecs -> 4 codes of 8 values each
    val cb = SimilaritySearch.pqCodebookDeterministic(items, "vec_id", "embedding", m = 4, ksub = 8)
    assert(cb.length === 4 && cb.head.length === 8 && cb.head.head.length === 4)
    val enc = SimilaritySearch.pqEncode(items, "vec_id", "embedding", cb).collect()
    assert(enc.length === 50)
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length === 4 && codes.forall(c => c >= 0 && c < 8))
      assert(r.getDouble(2) > 0.0, "reconstructed norm")
    }
    // codebook items quantize to themselves (their own subvectors are
    // codebook entries at distance 0, tie-broken to their own code)
    val codebookItem = enc.find(_.getLong(0) == 3L).get
    assert(codebookItem.getSeq[Int](1).forall(_ == 3))

    val pq = SimilaritySearch.pqTopK(items, q, "vec_id", "embedding", "vec_id", 5,
      m = 4, ksub = 8)
    assert(pq.columns.toSeq === Seq("query_id", "item_id", "cosine", "rank"))
    val got = pq.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall $recall")
    // a codebook query reconstructs exactly -> its own item must rank 1
    val self = pq.filter(col("query_id") === 3 && col("rank") === 1).head()
    assert(self.getLong(1) === 3L)
  }

  test("PQ: trained per-subspace codebooks keep or raise ADC recall") {
    val q = items.filter(col("vec_id") < 5)
    val cb = SimilaritySearch.pqTrainCodebook(items, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 4)
    assert(cb.length === 4 && cb.forall(row => row.nonEmpty && row.forall(_.length === 4)))
    val pq = SimilaritySearch.pqTopK(items, q, "vec_id", "embedding", "vec_id", 5,
      m = 4, ksub = 8, codebook = Some(cb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"trained-PQ recall $recall")
  }

  test("IVF-PQ: coarse pruning + code-only scoring keeps recall; plan ships no raw vectors") {
    val q = items.filter(col("vec_id") < 5)
    val out = SimilaritySearch.ivfPqTopK(items, q, "vec_id", "embedding", "vec_id", 5,
      nlist = 8, nprobe = 4, m = 4, ksub = 8)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF-PQ recall $recall")
    // a codebook query reconstructs exactly and its own list is probed
    // first: it must find itself at rank 1
    val self = out.filter(col("query_id") === 3 && col("rank") === 1).head()
    assert(self.getLong(1) === 3L)
    // the probe join carries codes, not embeddings
    assert(!out.columns.contains("ivec"))
  }

  test("residual IVF-PQ: finer quantization keeps or raises recall vs the non-residual variant") {
    val q = items.filter(col("vec_id") < 5)
    def run(res: Boolean) = SimilaritySearch.ivfPqTopK(items, q, "vec_id", "embedding",
      "vec_id", 5, nlist = 8, nprobe = 4, m = 4, ksub = 8, residual = res)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallRes = run(true).intersect(brute).size.toDouble / brute.size
    assert(recallRes >= 0.4, s"residual IVF-PQ recall $recallRes")
    // a codebook item's residual quantizes exactly (its own residual IS a
    // codeword): reconstruction is exact, so the self query ranks itself 1
    val out = SimilaritySearch.ivfPqTopK(items, items.filter(col("vec_id") === 3), "vec_id",
      "embedding", "vec_id", 5, nlist = 8, nprobe = 4, m = 4, ksub = 8, residual = true)
    assert(out.filter(col("rank") === 1).head().getLong(1) === 3L)
  }

  test("PQ plans: scoring stays in the scan stage — one hash exchange total (the final rank)") {
    val q = items.filter(col("vec_id") < 3)
    for ((what, out) <- Seq(
      "pq" -> SimilaritySearch.pqTopK(items.repartition(8), q, "vec_id", "embedding",
        "vec_id", 5, m = 4, ksub = 8),
      "ivfpq" -> SimilaritySearch.ivfPqTopK(items.repartition(8), q, "vec_id", "embedding",
        "vec_id", 5, nlist = 8, nprobe = 4, m = 4, ksub = 8))) {
      val plan = out.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 1, s"$what: expected only the final-rank exchange, got $exchanges:\n$plan")
    }
  }

  test("trained k-means centroids plug into ivfTopK and keep/raise recall") {
    val q = items.filter(col("vec_id") < 5)
    val cents = SimilaritySearch.trainCentroids(items, "vec_id", "embedding", nlist = 8, iters = 4)
    assert(cents.count() >= 2 && cents.count() <= 8)
    val ivf = SimilaritySearch.ivfTopK(items, q, "vec_id", "embedding", "vec_id", 5,
      nlist = 8, nprobe = 4, centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(items, q, "vec_id", "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"trained-centroid IVF recall $recall")
    assert((0 until 5).forall(i => ivf.contains((i.toLong, i.toLong))), "self must be found")
  }

  test("heap tie-break: small-id item arriving last among k+1 identical-cosine items survives") {
    // k+1 items with IDENTICAL vectors (so identical cosine); the small id
    // arrives LAST in its partition. The final order is (cosine desc, id
    // asc), so the true top-3 is ids {1, 10, 11} — a heap whose head is not
    // the largest-id tie would evict the wrong element on admission of id 1.
    val v = Seq.tabulate(8)(j => math.sin(j * 0.9).toFloat)
    val dup = Seq(10L, 11L, 12L, 1L).map(id => (id, v)) // id 1 last
    val itemsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(dup.map(Row.fromTuple(_)), 1),
      items.schema)
    val q = Seq((99L, v)).toDF("vec_id", "embedding")
    val got = SimilaritySearch.bruteForceTopK(itemsDf, q, "vec_id", "embedding", "vec_id", 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1L, 10L, 11L), s"tie-break must follow (cosine desc, id asc): $got")
  }

  test("IVF plan: rank window input is heap-bounded — one hash exchange total") {
    val q = items.filter(col("vec_id") < 3)
    val out = SimilaritySearch.ivfTopK(items.repartition(8), q,
      "vec_id", "embedding", "vec_id", 5, nlist = 8, nprobe = 3)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the final-rank exchange, got $exchanges:\n$plan")
    // the reduced stream must be order-equivalent: same rows as 1 partition
    val a = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = SimilaritySearch.ivfTopK(items.coalesce(1), q,
      "vec_id", "embedding", "vec_id", 5, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a === b)
  }

  test("IVF plan shape: item->centroid assignment is a per-row argmax, not a window shuffle") {
    val q = items.filter(col("vec_id") < 5)
    val out = SimilaritySearch.ivfTopK(items, q, "vec_id", "embedding", "vec_id", 5,
      nlist = 8, nprobe = 4)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // exactly ONE window: the final per-query rank (queries are tiny);
    // the item-table assignment must NOT appear as a window
    assert(windows.size === 1, s"expected 1 Window, got ${windows.size}:\n" +
      out.queryExecution.optimizedPlan.treeString)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("hashpartitioning(item_id"),
      s"item table must not be shuffled by item_id:\n$physical")
  }
}

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("token count handles blanks, multiple spaces") {
    val df = Seq("a b c", "  one   two  ", "", "single").toDF("t")
    val got = df.select(TextAnalysis.tokenCount(col("t"))).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(3, 2, 0, 1))
  }

  test("quality metrics are consistent") {
    val df = Seq((1L, "the cat sat on the mat 42 times!")).toDF("id", "text")
    val r = TextAnalysis.qualityMetrics(df, "text").head()
    val m = r.getValuesMap[Any](Seq("n_tokens", "punct_ratio", "digit_ratio", "stopword_ratio"))
    assert(m("n_tokens") === 8)
    assert(m("punct_ratio").asInstanceOf[Double] > 0.0)
    assert(m("digit_ratio").asInstanceOf[Double] > 0.0)
    assert(m("stopword_ratio").asInstanceOf[Double] === 0.25) // "the" twice / 8
  }

  test("language id picks the marker-heavy language, und when none") {
    val df = Seq(
      "the cat and the dog sat in that spot for it was warm",
      "el perro y la casa de los vecinos en las montanas",
      "der hund und die katze ist von den bergen im wald",
      "qwerty zxcvb asdfgh").toDF("text")
    val got = TextAnalysis.langId(df, "text").select("lang_pred").collect().map(_.getString(0))
    assert(got.toSeq === Seq("en", "es", "de", "und"))
  }

  test("language id detects CJK scripts by Unicode range (no whitespace tokens needed)") {
    val df = Seq(
      "这是一个中文测试文本",  // zh: Han only
      "これはテストです",              // ja: kana
      "한국어 텍스트",                         // ko: hangul
      "mixed 漢字 inside an otherwise english text the the the the the the the the the the the the the the the the the the the the").toDF("text")
    val got = TextAnalysis.langId(df, "text").select("lang_pred").collect().map(_.getString(0))
    assert(got(0) === "zh" && got(1) === "ja" && got(2) === "ko")
    assert(got(3) === "en", "low Han fraction must fall through to marker scoring")
  }

  test("subword count upper-bounds token count") {
    val df = Seq("internationalization multi word text").toDF("t")
    val r = df.select(TextAnalysis.subwordCount(col("t"), 4).as("s"), TextAnalysis.tokenCount(col("t")).as("n")).head()
    assert(r.getLong(0) >= r.getInt(1))
  }

  test("winnow split consistency: winnowFromHashes(rollingHashes) == winnow_fingerprint") {
    import graft.functions.TextHash
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog repeatedly and again",
      "abcdefghijklmnopqrstuvwxyz",
      "aaaaaaaaaaaaaaaaaaaa", // degenerate: all k-grams identical
      "short")               // shorter than k -> single whole-string hash
    for (t <- texts) {
      val hs = TextHash.rollingHashes(t, 8)
      val df = Seq((1L, hs.toSeq)).toDF("id", "hs")
      val got = TextAnalysis.winnowFromHashes(df, "id", "hs", window = 4)
        .collect().map(_.getLong(1)).sorted.toSeq
      val want = TextHash.winnow(t, 8, 4).sorted.toSeq
      assert(got === want, s"text: $t")
    }
  }
}
