package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` surface (SURVEY.md §2.10's optional extension point):
  * single-pass mean + sample variance via Welford/Chan parallel merge.
  *
  * Why an Aggregator and not `avg`/`stddev_samp`: the built-ins are the
  * right answer for these two moments (and the correctness oracle uses
  * them); this class exists to exercise the typed-UDAF machinery with a
  * real algorithm — a numerically-stable streaming moment estimate whose
  * merge is associative, so Spark can partial-aggregate map-side and merge
  * across partitions exactly like a built-in. The same skeleton carries
  * any custom sketch with an associative merge. */
case class WelfordState(n: Long, mean: Double, m2: Double)

object WelfordAgg
    extends Aggregator[Double, WelfordState,
      (java.lang.Double, java.lang.Double)] {

  override def zero: WelfordState = WelfordState(0L, 0.0, 0.0)

  override def reduce(s: WelfordState, x: Double): WelfordState = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    WelfordState(n, mean, s.m2 + d * (x - mean))
  }

  override def merge(a: WelfordState, b: WelfordState): WelfordState = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordState(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  /** (mean, sample variance) — NULL mean for n = 0 and NULL variance for
    * n < 2, exactly mirroring the built-in `avg`/`var_samp` (and therefore
    * the q_welford_stats DuckDB oracle) on empty/singleton groups. */
  override def finish(s: WelfordState): (java.lang.Double, java.lang.Double) =
    (if (s.n == 0) null else Double.box(s.mean),
      if (s.n < 2) null else Double.box(s.m2 / (s.n - 1)))

  override def bufferEncoder: Encoder[WelfordState] = Encoders.product
  override def outputEncoder: Encoder[(java.lang.Double, java.lang.Double)] =
    Encoders.tuple(Encoders.DOUBLE, Encoders.DOUBLE)

  /** Untyped-DataFrame entry: `df.agg(WelfordAgg.column(col))`. */
  def column(c: Column): Column = udaf(WelfordAgg).apply(c)
}
