package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large⋈large equi-joins (SURVEY.md §4.3; the 100 TB
  * concern, not a reference behavior — the reference is single-node).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit salting
  * is for the pathological key (one user/date owning a double-digit share of
  * rows) where even a split partition's build side won't fit. The skewed
  * side gets a uniform random-ish salt derived from a ROW-UNIQUE expression
  * (never `rand()` — retries must be deterministic); the other side is
  * replicated `salts` times. Replication multiplies the small side's volume,
  * so salt only the keys that need it (`saltedJoinSkewedKeys`).
  */
object Salt {

  /** Full salted inner equi-join: every key of `right` is replicated
    * `salts` ways. Use when the whole key space is hot. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, uniq: Column): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(uniq), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt ONLY the keys whose row count exceeds `threshold`; all other keys
    * take the plain join path. Two joins + union — the skewed-key set is
    * computed once and broadcast (it is small by construction: few keys can
    * be individually huge). */
  def saltedJoinSkewedKeys(left: DataFrame, right: DataFrame, key: String,
                           salts: Int, uniq: Column,
                           threshold: Long): DataFrame = {
    val hot = left.groupBy(key).count()
      .filter(col("count") > threshold).select(key)
    val leftHot = left.join(broadcast(hot), Seq(key), "left_semi")
    val leftCold = left.join(broadcast(hot), Seq(key), "left_anti")
    val rightHot = right.join(broadcast(hot), Seq(key), "left_semi")
    val rightCold = right.join(broadcast(hot), Seq(key), "left_anti")
    saltedJoin(leftHot, rightHot, key, salts, uniq)
      .unionByName(leftCold.join(rightCold, Seq(key)))
  }
}
