package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter join prefiltering — the manual form of Spark's runtime
  * row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`),
  * exposed as an explicit operator so selective semi-joins can prefilter
  * the probe side BEFORE its shuffle even in plans the injector rule does
  * not cover (e.g. across a materialization boundary, or when the build
  * side is computed by a separate stage).
  *
  * Mechanics: the build side aggregates `xxhash64(key)` into one compact
  * bitset (map-side partials — each executor ships one buffer, the driver
  * gets ONE row), which then rides to the probe side as a literal; the
  * probe filter is a per-row codegen'd bit test, so at 100 TB the probe
  * table drops non-matching rows at scan speed and the exact join only
  * shuffles survivors. False positives are removed by the exact semi-join
  * that follows — the Bloom stage changes cost, never results.
  */
object BloomPrefilter {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs.head, exprs(1)), "built-in")
  }

  /** Aggregate the build side's key into a serialized Bloom filter. The
    * single-row collect here is the sketch, not the data — same driver
    * footprint as `df.stat.bloomFilter`, but built from a codegen'd
    * aggregate over `xxhash64`. */
  def buildBloom(build: DataFrame, key: String,
                 expectedItems: Long = 1000000L): Array[Byte] = {
    register(build.sparkSession)
    build
      .select(call_function("graft_bloom_agg",
        xxhash64(col(key)), lit(expectedItems)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Map-side probe prefilter: keep rows whose key might be in the bloom. */
  def mightContain(spark: SparkSession, key: Column,
                   bloom: Array[Byte]): Column = {
    register(spark)
    call_function("graft_bloom_might_contain", lit(bloom), xxhash64(key))
  }

  /** Measured-vs-budgeted false-positive audit: build the Bloom over
    * one DISJOINT key cohort (even part keys), probe with the other
    * (odd keys — none can truly match), and flag whether the measured
    * FP rate stays within 3× the filter's design budget. The exact
    * cardinalities hash-check cross-engine; the FP count itself is
    * engine-specific sketch internals (xxhash64 bit layout) and
    * collapses to the bound flag — the [[graft.analytics
    * .EventAnalytics.hllMergeDau]] audit pattern. Deterministic: the
    * Bloom OR-merge is order-independent, so the same fixture always
    * yields the same bits. */
  def fprAudit(parts: DataFrame, expectedItems: Long = 100000L,
               fppBound: Double = 0.10): DataFrame = {
    val even = parts.filter(col("p_partkey") % 2 === 0)
      .select(col("p_partkey"))
    val odd = parts.filter(col("p_partkey") % 2 === 1)
      .select(col("p_partkey"))
    val bloom = buildBloom(even, "p_partkey", expectedItems)
    val m = odd
      .select(mightContain(parts.sparkSession, col("p_partkey"), bloom)
        .cast("long").as("fp"))
      .agg(count(lit(1)).as("n_probe"), sum(col("fp")).as("n_fp"))
    val nb = even.agg(count(lit(1)).as("n_build"))
    m.crossJoin(broadcast(nb))
      .select(col("n_build"), col("n_probe"),
        (col("n_fp").cast("double") <=
          col("n_probe").cast("double") * fppBound)
          .as("fp_within_bound"))
  }

  /** Exact left-semi join with a Bloom prefilter on the probe side.
    * Result-identical to `probe SEMI JOIN build`; the prefilter only cuts
    * the probe rows entering the join's shuffle. */
  def semiJoin(probe: DataFrame, build: DataFrame,
               probeKey: String, buildKey: String,
               expectedItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(build, buildKey, expectedItems)
    probe
      .filter(mightContain(probe.sparkSession, col(probeKey), bloom))
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }
}
