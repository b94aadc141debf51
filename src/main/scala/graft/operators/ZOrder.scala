package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaved sort keys — the multi-dimensional data
  * layout used by lakehouse table formats to make range predicates on
  * SEVERAL columns prunable from one physical sort order. Sorting 100 TB by
  * `zkey(a, b)` and writing size-bounded files gives every file a tight
  * min/max envelope in BOTH dimensions, so a scan filtered on either column
  * (or both) skips most files on parquet footer statistics alone — a plain
  * lexicographic sort only ever prunes its leading column.
  *
  * The key is pure per-row bit arithmetic (shift/mask/or — whole-stage
  * codegen folds it into one projection, no UDF). Dimensions are first
  * normalized onto a fixed 2^gridBits grid (the rank/range normalization
  * real OPTIMIZE ZORDER implementations apply), so the key's shape is
  * scale-invariant; the actual clustered write is Spark's standard
  * repartitionByRange + sortWithinPartitions path. `layoutStats`
  * quantifies clustering quality the way a table-format OPTIMIZE report
  * would: per-"file" min/max envelopes in both source dimensions.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integral
    * columns: bit b of `x` lands at position 2b, bit b of `y` at 2b+1.
    * 2·bits ≤ 62 keeps the key in a positive BIGINT. */
  def zkey(x: Column, y: Column, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31)
    val xm = x.cast("bigint").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("bigint").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { b =>
      shiftleft(shiftright(xm, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(ym, b).bitwiseAND(lit(1L)),
          2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Clustering-quality report: normalize both dimensions onto a
    * 2^gridBits grid (integer arithmetic against the broadcast max — the
    * one-row aggregate is the only non-map stage besides the final
    * bucket rollup), bucket rows by the top bits of their z-key (a
    * stand-in for "file" in a size-bounded clustered write), and measure
    * each bucket's min/max envelope in both RAW dimensions. Tight spans
    * in both columns are exactly what parquet row-group statistics need
    * for two-sided pruning; ≤ 2^(2·gridBits − bucketShift) output rows at
    * any scale. */
  def layoutStats(df: DataFrame, xCol: String, yCol: String,
                  gridBits: Int = 8, bucketShift: Int = 8): DataFrame = {
    val side = 1L << gridBits
    val maxs = df.agg(max(col(xCol)).cast("bigint").as("xmax"),
      max(col(yCol)).cast("bigint").as("ymax"))
    df.select(col(xCol).cast("bigint").as("x"),
        col(yCol).cast("bigint").as("y"))
      .crossJoin(broadcast(maxs))
      .withColumn("xg", expr(s"x * ${side}L div (xmax + 1)"))
      .withColumn("yg", expr(s"y * ${side}L div (ymax + 1)"))
      .withColumn("z", zkey(col("xg"), col("yg"), gridBits))
      .groupBy(shiftright(col("z"), bucketShift).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        (max(col("x")) - min(col("x"))).as("x_span"),
        (max(col("y")) - min(col("y"))).as("y_span"))
      .orderBy("z_bucket")
  }
}
