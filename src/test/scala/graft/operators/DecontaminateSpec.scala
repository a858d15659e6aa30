package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely unrelated text about spark physical plans"),
    (3L, "answer the quick brown fox question now"), // shares "the quick brown" + "quick brown fox"
    (4L, "short doc"),                               // < n tokens: never flagged
    (5L, "THE Quick BROWN fox differs only by case") // normalization must catch it
  ).toDF("doc_id", "text")

  private def benchmark = Seq(
    (100L, "eval item: the quick brown fox appears here")
  ).toDF("doc_id", "text")

  test("flags documents sharing a normalized n-gram; counts distinct collisions") {
    val hits = Decontaminate.contaminatedIds(corpus, benchmark, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet === Set(1L, 3L, 5L))
    // doc 1 shares "the quick brown", "quick brown fox" -> 2 distinct grams
    assert(hits(1L) === 2L)
    assert(hits(3L) === 2L)
    assert(hits(5L) >= 1L, "case-normalized collision")
  }

  test("removeContaminated drops exactly the flagged docs") {
    val left = Decontaminate.removeContaminated(corpus, benchmark, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(left === Set(2L, 4L))
  }

  test("plan: benchmark grams broadcast — the corpus side joins without an exchange") {
    val plan = Decontaminate.contaminatedIds(corpus, benchmark, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
