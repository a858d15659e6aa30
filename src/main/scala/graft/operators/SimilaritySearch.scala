package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: exact baseline — broadcast the (small) query set,
  *    score every (query, item) pair with a codegen'd cosine expression,
  *    rank per query. One pass over the items, no shuffle of the item side.
  *  - `ivfTopK`: the scale path — IVF-style coarse quantisation: nlist
  *    deterministic centroids, items assigned to their nearest centroid
  *    (the "inverted lists", a partitioning of the items), queries probe
  *    the nprobe nearest lists only. Recall < 1 by design; exactness knob
  *    is nprobe. At 100 TB the item side stays partitioned by list id, so
  *    a probe touches nprobe/nlist of the data.
  */
object SimilaritySearch {

  /** exact top-k by cosine; queries are broadcast. Output:
    * (query_id, item id, cosine, rank <= k).
    */
  def bruteForceTopK(items: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                     queryIdCol: String, k: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qvec"))
    val it = items.select(col(idCol).as("item_id"),
      transform(col(vecCol), x => x.cast("double")).as("ivec"))
    val scored = it.crossJoin(broadcast(q))
      .select(col("query_id"), col("item_id"),
        Dedup.cosine(col("qvec"), col("ivec")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic IVF: centroids = the `nlist` items with the smallest
    * ids (a deterministic, data-independent coarse codebook — stands in
    * for k-means at fixture scale; swap centroid selection for trained
    * centroids without touching the plan).
    */
  def ivfTopK(items: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              queryIdCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val it = items.select(col(idCol).as("item_id"),
      transform(col(vecCol), x => x.cast("double")).as("ivec"))
    val centroids = it.orderBy("item_id").limit(nlist)
      .select(col("item_id").as("list_id"), col("ivec").as("cvec"))

    // assign each item to its nearest centroid (broadcast nlist rows)
    val wItem = Window.partitionBy("item_id").orderBy(col("csim").desc, col("list_id").asc)
    val assigned = it.crossJoin(broadcast(centroids))
      .select(col("item_id"), col("ivec"), col("list_id"),
        Dedup.cosine(col("ivec"), col("cvec")).as("csim"))
      .withColumn("r", row_number().over(wItem)).filter(col("r") === 1)
      .select("item_id", "ivec", "list_id")

    // each query probes its nprobe nearest lists
    val q = queries.select(col(queryIdCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qvec"))
    val wq = Window.partitionBy("query_id").orderBy(col("csim").desc, col("list_id").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"), col("list_id"),
        Dedup.cosine(col("qvec"), col("cvec")).as("csim"))
      .withColumn("r", row_number().over(wq)).filter(col("r") <= nprobe)
      .select("query_id", "qvec", "list_id")

    val wRank = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("item_id").asc)
    assigned.join(broadcast(probes), Seq("list_id"))
      .select(col("query_id"), col("item_id"),
        Dedup.cosine(col("qvec"), col("ivec")).as("cosine"))
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= k)
  }
}
