package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range join: intervals ⋈ points where the keys are equal and the
  * point's time falls in the interval's [start, end). The attribution /
  * windowed-correlation primitive (purchases within N days of a signup,
  * readings during an experiment window, …).
  *
  * Scale shape — why bin + equi-join, not an inequality join:
  * Spark plans a raw `l.key === r.key && r.t >= l.start && r.t < l.end`
  * join as a shuffled equi-join on key alone, so every point meets every
  * interval of its key before the range predicate runs — quadratic per key
  * for hot keys (and with no equi-key at all it degrades to a broadcast
  * nested loop). Here both sides get a coarse time-bin column (intervals
  * exploded over the bins they cover, points assigned their single bin);
  * the join is then a plain shuffled equi-join on (key, bin) followed by
  * the exact range filter. With binWidth ≈ the typical interval length the
  * interval side is amplified ~2× — bounded and tunable, never quadratic.
  * A point lives in exactly one bin, so no post-join dedup is needed.
  */
object RangeJoin {

  def binnedRangeJoin(intervals: DataFrame, points: DataFrame,
                      intervalKey: String, pointKey: String,
                      startCol: String, endCol: String, timeCol: String,
                      binWidthSeconds: Long): DataFrame = {
    require(binWidthSeconds > 0, "binWidthSeconds must be positive")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint; shared: ${overlap.mkString(", ")}")

    // Last covered bin uses floor(end/w) rather than end-exclusive
    // arithmetic: at worst one spurious candidate bin, removed by the exact
    // filter — never a missed match.
    val iv = intervals.withColumn("__rj_bin", explode(sequence(
      floor(unix_timestamp(col(startCol)) / binWidthSeconds),
      floor(unix_timestamp(col(endCol)) / binWidthSeconds))))
    val pt = points.withColumn("__rj_bin",
      floor(unix_timestamp(col(timeCol)) / binWidthSeconds))

    iv.join(pt,
        iv("__rj_bin") === pt("__rj_bin") &&
          col(intervalKey) === col(pointKey) &&
          col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop(iv("__rj_bin")).drop(pt("__rj_bin"))
  }
}
