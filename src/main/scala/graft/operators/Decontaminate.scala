package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene pass run before
  * any large-scale LM training: flag (and drop) training documents that
  * share an n-gram with an evaluation benchmark (the published GPT-3
  * appendix-C recipe: normalized 13-gram collision).
  *
  * 100 TB shape: the BENCHMARK side is small (eval sets are 1e3–1e6 rows)
  * — its distinct n-gram set is BROADCAST, so the corpus side is never
  * shuffled for the match: corpus n-grams stream through a
  * BroadcastHashJoin in the scan stage. The only wide operation is the
  * per-document hit count, which shuffles matched (id, gram) pairs only —
  * contamination is rare by construction. The final removal is a
  * broadcast LEFT ANTI join on the (small) contaminated-id set.
  */
object Decontaminate {

  /** Normalized word n-grams (lowercase, whitespace split), distinct per
    * document; documents shorter than n tokens contribute none.
    */
  private def gramsOf(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      // per-document dedup is per-ROW work (grams only repeat within a
      // document) — array_distinct in the scan stage, not a corpus-wide
      // distinct exchange
      .select(col("id"), explode(array_distinct(transform(
        sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))).as("gram"))

  /** Corpus documents sharing at least one normalized n-gram with the
    * benchmark: (id, contaminated_grams = distinct colliding n-grams).
    */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
                      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val bench = gramsOf(benchmark, idCol, textCol, n).select("gram").distinct()
    gramsOf(corpus, idCol, textCol, n)
      .join(broadcast(bench), Seq("gram"))
      .groupBy("id")
      .agg(count(lit(1)).as("contaminated_grams"))
  }

  /** The corpus minus contaminated documents (broadcast left-anti join on
    * the contaminated-id set).
    */
  def removeContaminated(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, n: Int = 13): DataFrame =
    corpus.join(
      broadcast(contaminatedIds(corpus, benchmark, idCol, textCol, n)
        .select(col("id").as(idCol))),
      Seq(idCol), "left_anti")
}
