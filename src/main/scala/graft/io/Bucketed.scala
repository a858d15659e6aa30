package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) table helpers — the shuffle-elimination knob for
  * repeated big-big equi joins at 100 TB: both sides pre-hashed into the
  * same bucket layout on the join key mean Catalyst plans a SortMergeJoin
  * with ZERO Exchange (bucketed scans already satisfy the required
  * distribution). Bucketing metadata lives in the session catalog
  * (`saveAsTable`), the data in parquet at the warehouse/explicit path —
  * the Iceberg-bucket-transform analog for plain Spark tables.
  */
object Bucketed {

  /** Write `df` bucketed + sorted by `key` into `buckets` buckets as a
    * catalog table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Equi-join two identically-bucketed catalog tables on `key` — plans
    * with no exchange on either side when bucket layouts match. */
  def joinBucketed(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
