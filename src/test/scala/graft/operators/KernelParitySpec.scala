package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Optimization-round parity specs: the typed JVM kernels that replaced
  * Catalyst expression folds (ANN encodes, trigram scoring, cosine
  * verification) and the primitive union-find table must reproduce the
  * old expression semantics bit for bit — including Spark's
  * NaN-as-largest comparisons, `round`'s BigDecimal HALF_UP, and
  * code-point (not UTF-16) substring windows.
  */
class KernelParitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("LongLongMap matches a reference map through growth, negatives, overwrites") {
    val m = new LongLongMap(4)
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    val rnd = new scala.util.Random(7)
    (0 until 60000).foreach { i =>
      val k = rnd.nextLong() % 10000 // collisions + negatives
      val v = rnd.nextLong()
      m.put(k, v); ref(k) = v
      if (i % 997 == 0) {
        val probe = rnd.nextLong() % 10000
        assert(m.contains(probe) === ref.contains(probe))
        assert(m.getOrElse(probe, -1L) === ref.getOrElse(probe, -1L))
      }
    }
    var n = 0
    m.foreachKey { k => assert(m.getOrElse(k, Long.MinValue) === ref(k)); n += 1 }
    assert(n === ref.size)
  }

  test("sqEncode codes equal Spark round(x,0).cast(int) semantics (HALF_UP, not Math.round)") {
    // values engineered to sit on .5 boundaries after scaling: mins=0,
    // maxs=255 makes code = round(x) exactly
    val xs = Seq(0.5, 1.5, 2.5, 2.4999999999999996, 254.5, 0.49999999999999994, 37.5)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, Seq(x)) }.toDF("id", "vec")
    val mins = Seq(0.0); val maxs = Seq(255.0)
    val got = SimilaritySearch.sqEncode(df, "id", "vec", mins, maxs)
      .select($"item_id", element_at($"codes", 1).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the OLD expression form, evaluated by Spark itself
    val want = df.select($"id",
      when(lit(maxs.head) === lit(mins.head), lit(0)).otherwise(
        round((element_at($"vec", 1) - mins.head) / (maxs.head - mins.head) * 255)
          .cast("int")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === want)
  }

  test("trigramLmScore handles supplementary (surrogate-pair) code points like SQL substr") {
    // U+1F600 is a surrogate pair in UTF-16; trigram windows must step by
    // CODE POINT. Reference = the old exploded-expression plan built
    // inline with Spark's own substr.
    val docs = Seq(
      (1L, "ab😀cd"),  // 5 code points, 6 chars
      (2L, "😀😀😀x"), // 4 cps, 7 chars
      (3L, "abcab")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.trigramLmScore(docs, "doc_id", "text",
        sampleFilter = col("doc_id") === 3L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // reference replica of the pre-optimization plan
    val t = col("text")
    val tri = docs.filter(length(t) >= 3)
      .select(col("doc_id"), explode(transform(sequence(lit(1), length(t) - 2),
        i => t.substr(i, lit(3)))).as("g"))
      .withColumn("p2", col("g").substr(1, 2))
    val sTri = docs.filter(col("doc_id") === 3L).filter(length(t) >= 3)
      .select(explode(transform(sequence(lit(1), length(t) - 2),
        i => t.substr(i, lit(3)))).as("g"))
      .withColumn("p2", col("g").substr(1, 2))
    val c3 = sTri.groupBy("g").agg(count(lit(1)).as("c3"))
    val c2 = sTri.groupBy("p2").agg(count(lit(1)).as("c2"))
    val v = c3.count()
    val want = tri.join(c3, Seq("g"), "left").join(c2, Seq("p2"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c3"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c2"), lit(0L)) + v)).as("lp"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), avg("lp").as("a"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(x => (x._1, x._2)) === want.map(x => (x._1, x._2)))
    got.zip(want).foreach { case (g, w) => assert(g._3 === w._3) } // bit-identical
  }

  test("assignClusters argmax replicates the expression fold's NaN-as-largest semantics") {
    // centroid 0 is the zero vector: cosine(v, 0) = NaN, which the old
    // `when(s > acc.csim, ...)` fold SELECTED (Spark treats NaN as the
    // largest double) and no later finite score could displace
    val items = Seq(
      (0L, Seq(0.0, 0.0)),   // zero vector -> centroid list
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 1.0))
    ).toDF("id", "vec")
    val got = SimilaritySearch.assignClusters(items, "id", "vec", nlist = 2)
      .orderBy("item_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // every item scores NaN against centroid 0 (id 0, the zero vector),
    // so the fold keeps centroid 0 for all of them
    assert(got === Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L)))
  }
}
