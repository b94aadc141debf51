package graft

import org.apache.spark.sql.functions._
import graft.operators.Salt

/** Salted joins must be RESULT-equivalent to the plain join — salting only
  * changes the physical distribution. */
class SaltSpec extends SparkSpec {

  test("saltedJoin equals plain inner join on a skewed key") {
    import spark.implicits._
    // key 7 owns ~90% of the left side
    val left = ((1 to 900).map(i => (7L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 5, 1000L + i))).toDF("k", "payload")
    val right = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"))
      .toDF("k", "name")
    val plain = left.join(right, Seq("k"))
    val salted = Salt.saltedJoin(left, right, "k", 8, col("payload"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoinSkewedKeys splits hot keys only, result unchanged") {
    import spark.implicits._
    val left = ((1 to 500).map(i => (42L, i.toLong)) ++
      (1 to 200).map(i => (i.toLong % 20, 1000L + i))).toDF("k", "payload")
    val right = (0L to 45L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
    val mixed = Salt.saltedJoinSkewedKeys(left, right, "k", 8,
      col("payload"), threshold = 100L)
    assert(mixed.count() === plain.count())
    assert(mixed.exceptAll(plain).isEmpty && plain.exceptAll(mixed).isEmpty)
  }

  test("salt distribution actually spreads the hot key") {
    import spark.implicits._
    val left = (1 to 800).map(i => (7L, i.toLong)).toDF("k", "payload")
    val salts = left.withColumn("__salt", pmod(hash(col("payload")), lit(8)))
      .groupBy("__salt").count().collect()
    assert(salts.length === 8)                   // all 8 buckets hit
    assert(salts.map(_.getAs[Long]("count")).max < 800L * 0.3) // no bucket hogs
  }
}
