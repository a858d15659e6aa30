package graft.operators

import graft.functions.{cell_encode, cell_neighbors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The core spatial operator: cell-bucketed radius join (SURVEY.md §2.4).
  *
  * Replaces the reference's per-expert KDTree ball query
  * (local_data_select, GPSat/dataloader.py:2352-2447) with a join Catalyst
  * can plan: both sides are encoded to grid cells of size = radius; the
  * right (expert) side explodes its 3x3 neighbor cells; an equi join on the
  * cell id finds all candidate pairs (complete: any point within `radius`
  * of an expert lies in one of its 9 neighbor cells); an exact distance +
  * time-window refine follows. Each (left row, right row) pair appears at
  * most once — the left side has exactly one cell — so no dedupe is needed.
  *
  * Scale knobs:
  *  - `broadcastRight`: experts are few (10^2..10^5) — broadcast-hash join
  *    avoids shuffling the (huge) observation side entirely.
  *  - `saltBuckets` > 0 (only meaningful when not broadcasting): append a
  *    deterministic salt pmod(hash(left key cols), n) to the left key and
  *    explode 0..n-1 on the right, splitting hot (dense polar) cells across
  *    n reducers. AQE skew-join handles moderate skew; explicit salting is
  *    for the pathological single-cell hotspots the north rule calls out.
  *
  * Exact reference comparison semantics:
  *  - training window (KDTree.query_ball_point): dist^2 <= r^2 (inclusive)
  *  - prediction max_dist (_max_dist_bool, prediction_locations.py:18-43):
  *    dist^2 < r^2 (strict) -> `inclusive = false`
  *  - per-dim window: rt + below <= t <= rt + above, operators verbatim
  *    (local_select "t <= +4" / "t >= -4", inline_example.py:298-317)
  */
object SpatialJoin {

  final case class TemporalWindow(leftT: String, rightT: String, below: Double, above: Double)

  final case class RadiusJoinConfig(
      radius: Double,
      leftX: String = "x",
      leftY: String = "y",
      rightX: String = "x",
      rightY: String = "y",
      inclusive: Boolean = true,
      temporal: Option[TemporalWindow] = None,
      broadcastRight: Boolean = true,
      saltBuckets: Int = 0,
      rightPrefix: String = "expert_",
      matchCols: Seq[String] = Nil)

  /** Join `left` (observations / prediction locations; large) against
    * `right` (expert locations; small) within `radius`. Right columns are
    * returned prefixed with `cfg.rightPrefix`; all left columns (including
    * opaque payloads like `spans`) pass through untouched.
    *
    * `cfg.matchCols` are equality dimensions present on BOTH sides (e.g. a
    * time bin): they join unprefixed with USING semantics (one output copy)
    * and extend the shuffle key, so candidate pairs only form inside a
    * matching group.
    */
  def radiusJoin(left: DataFrame, right: DataFrame, cfg: RadiusJoinConfig): DataFrame = {
    val pre = cfg.rightPrefix
    val renamed = right.columns.foldLeft(right)((df, c) =>
      if (cfg.matchCols.contains(c)) df else df.withColumnRenamed(c, pre + c))

    val rx = col(pre + cfg.rightX)
    val ry = col(pre + cfg.rightY)
    var r = renamed.withColumn("__cell", explode(cell_neighbors(rx, ry, cfg.radius)))
    var l = left.withColumn("__cell", cell_encode(col(cfg.leftX), col(cfg.leftY), cfg.radius))

    val salting = !cfg.broadcastRight && cfg.saltBuckets > 1
    if (salting) {
      l = l.withColumn("__salt", pmod(hash(col(cfg.leftX), col(cfg.leftY)), lit(cfg.saltBuckets)))
      r = r.withColumn("__salt", explode(lit((0 until cfg.saltBuckets).toArray)))
    }

    val d2 = (col(cfg.leftX) - rx) * (col(cfg.leftX) - rx) +
      (col(cfg.leftY) - ry) * (col(cfg.leftY) - ry)
    val r2 = lit(cfg.radius * cfg.radius)
    val distCond: Column = if (cfg.inclusive) d2 <= r2 else d2 < r2
    val tCond: Column = cfg.temporal match {
      case Some(tw) =>
        col(tw.leftT) >= col(pre + tw.rightT) + tw.below && col(tw.leftT) <= col(pre + tw.rightT) + tw.above
      case None => lit(true)
    }

    val keys = (if (salting) Seq("__cell", "__salt") else Seq("__cell")) ++ cfg.matchCols
    val rside = if (cfg.broadcastRight) broadcast(r) else r
    l.join(rside, keys, "inner")
      .filter(distCond && tCond)
      .drop("__cell", "__salt")
  }

  /** k nearest right rows within `radius` of each left row: radius join +
    * per-left-row rank on exact distance. `leftKey` identifies a left row.
    */
  def knnJoin(left: DataFrame, right: DataFrame, leftKey: Seq[String], k: Int,
              cfg: RadiusJoinConfig): DataFrame = {
    val pre = cfg.rightPrefix
    val d2 = (col(cfg.leftX) - col(pre + cfg.rightX)) * (col(cfg.leftX) - col(pre + cfg.rightX)) +
      (col(cfg.leftY) - col(pre + cfg.rightY)) * (col(cfg.leftY) - col(pre + cfg.rightY))
    val w = Window.partitionBy(leftKey.map(col): _*)
      .orderBy(d2.asc, col(pre + cfg.rightX).asc, col(pre + cfg.rightY).asc)
    radiusJoin(left, right, cfg)
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }
}
