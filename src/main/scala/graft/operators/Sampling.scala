package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `sample()`/`rand()` are nondeterministic across retries and partition
  * layouts — a task that fails and re-runs would emit a DIFFERENT sample,
  * which breaks exactly-once sinks and makes experiments unreproducible.
  * Hash-based sampling keys the keep/drop decision on the ROW (not the
  * execution), so any engine, any retry, any partitioning produces the
  * identical subset. This is the standard trick for auditable subsampling
  * at the 100 TB design point (and what `TABLESAMPLE ... REPEATABLE`
  * cannot give you across engines).
  *
  * The hash is the portable 60-bit md5 prefix (same family as
  * `graft.plans.PortableHash`) expressed with built-ins only —
  * `conv(substring(md5(key),1,15),16,10)` — so it whole-stage-codegens and
  * DuckDB reproduces it exactly as `('0x'||substr(md5(key),1,15))::BIGINT`.
  */
object Sampling {

  /** Portable uniform bucket in [0, m): first 60 bits of md5(key) mod m.
    * Non-negative by construction (60 bits < signed-64 range).
    * `key` should be an integer or string column: the hash is taken over
    * the key's STRING form, and floating-point/timestamp string renderings
    * differ between engines ("42.0" vs "42"), which would silently break
    * cross-engine reproducibility. */
  def hashBucket(key: Column, m: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("bigint") % m

  /** Deterministic train/val/test assignment: hash bucket of the key mod
    * 100 → [0,trainPct) train, [trainPct,trainPct+valPct) val, rest test.
    * A pure projection — the same row lands in the same split on every
    * run, engine, and cluster, which is what makes downstream eval
    * honest (no leakage when the corpus is re-partitioned or appended:
    * new rows join splits independently, old rows never move). */
  def splitAssign(df: DataFrame, key: Column,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(key, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Stratified sampler: keeps a row iff its key's hash bucket (per-mille)
    * falls below the stratum's rate. Rows in strata absent from `rates`
    * keep `defaultPerMille`. A pure filter — no shuffle, pushes down
    * around column pruning, and composes with any downstream plan. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      ratesPerMille: Map[String, Int],
      defaultPerMille: Int = 0): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille): Column) {
      case (acc, (k, v)) => when(stratum === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(key, 1000) < rate)
  }

  /** Weighted Bernoulli sampler: keeps a row with probability
    * `ratePpm / 1e6`, decided by the row key's hash — per-ROW rates (a
    * quality score, a length prior) instead of per-stratum. `ratePpm`
    * must be INTEGER arithmetic (e.g. `least(1250 * n_chars, 1000000)`),
    * never a float product: floor-of-double differs across engines at
    * representation boundaries, integer parts-per-million never does.
    * Same no-shuffle pure-filter shape as `stratifiedSample`. */
  def weightedSample(df: DataFrame, key: Column, ratePpm: Column): DataFrame =
    df.filter(hashBucket(key, 1000000) < ratePpm)

  /** Exactly min(k, |stratum|) rows per stratum, chosen by hash order —
    * the count-based complement of the rate-based samplers ("give me 100
    * examples of every event type, the same 100 on every run/engine").
    * Ordering by the key's hash makes the subset pseudo-random but
    * deterministic; the key itself tie-breaks hash collisions. One
    * shuffle on the stratum; the per-partition rank prunes with
    * WindowGroupLimit so only ~k rows per stratum survive each side of
    * the exchange. */
  def uniformKPerStratum(df: DataFrame, stratum: Column, key: Column,
                         k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hashBucket(key, 1000000000), key.asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Per-group top-p (nucleus) selection: order each group by `mass`
    * descending (key as tie-break) and keep rows while the EXCLUSIVE
    * running share of the group's total mass is below `p` — "the best
    * documents covering 80% of each source's token mass", the curation
    * counterpart of nucleus sampling. One hash-partition on the group
    * key; the running sum and the group total share that single
    * exchange. The exclusive frame guarantees progress: the top row of
    * every non-empty group is always kept, even when it alone exceeds
    * `p`. */
  def topPByMass(df: DataFrame, group: Column, key: Column, mass: Column,
                 p: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(mass.desc, key.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(group)
    df.withColumn("__before", coalesce(sum(mass).over(w), lit(0L)))
      .withColumn("__total", sum(mass).over(tot))
      .filter(col("__before").cast("double") /
        col("__total").cast("double") < p)
      .drop("__before", "__total")
  }

  /** Group-aware (entity-level) k-fold assignment audit — GroupKFold:
    * ALL rows of an entity land in one fold (fold = portable hash bucket
    * of the GROUP key, not the row key), the cross-validation discipline
    * that stops per-row splits from leaking a user's history across the
    * train/eval boundary. The report is the audit a pipeline gates on:
    * per-fold entity and row counts, positive share — and the leakage
    * invariant itself is structural (an entity's fold is a pure function
    * of its key), which the spec asserts as "each entity appears in
    * exactly one fold".
    *
    * Scale shape: the fold column is a pure projection (no shuffle to
    * assign); the audit is one map-side-combined two-level aggregate —
    * (fold, entity) partials, then k rows out. New rows join their
    * entity's fold independently; old rows never move (same append
    * stability argument as [[splitAssign]]). */
  def groupKFold(df: DataFrame, groupKey: Column, positive: Column,
                 k: Int = 5): DataFrame = {
    val folds = df
      .filter(groupKey.isNotNull)
      .select(hashBucket(groupKey, k).as("fold"),
        groupKey.cast("string").as("entity"),
        when(positive, 1L).otherwise(0L).as("pos"))
    folds.groupBy("fold", "entity")
      .agg(count(lit(1)).as("n_rows"), sum(col("pos")).as("n_pos"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_entities"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_pos")).as("n_pos"))
      .withColumn("pos_share",
        round(col("n_pos").cast("double") / col("n_rows"), 6))
      .orderBy("fold")
  }
}
