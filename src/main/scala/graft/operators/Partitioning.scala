package graft.operators

import graft.functions.{cell_encode, cell_parent}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit cell-prefix range partitioning for observation ingest — the
  * H3-parent analog over the engine's int64 grid cells: rows are range-
  * partitioned by a coarser prefix of their cell id (per-axis index >>
  * level), so spatially adjacent observations land in the same partitions
  * and files. Downstream effects at archive scale:
  *  - the cell-bucketed radius join reads clustered input (each task's
  *    window candidates come from few files);
  *  - a persisted `cell_prefix` column gives parquet min/max row-group
  *    pruning and partition pruning for spatial range scans;
  *  - dense polar prefixes spread across MULTIPLE partitions by range
  *    splitting (unlike hash partitioning, which would pin each hot prefix
  *    to one partition) — the ingest-side half of the skew story, with
  *    salted joins (SpatialJoin.saltBuckets) as the query-side half.
  */
object Partitioning {

  /** Add `cell_prefix` and range-partition by it. */
  def byCellPrefix(df: DataFrame, xCol: String, yCol: String,
                   res: Double, x0: Double, y0: Double, level: Int,
                   numPartitions: Int): DataFrame =
    df.withColumn("cell_prefix",
        cell_parent(cell_encode(col(xCol), col(yCol), res, x0, y0), level))
      .repartitionByRange(numPartitions, col("cell_prefix"))
}
