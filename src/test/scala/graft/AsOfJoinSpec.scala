package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin.asofJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    // (sym, qts, px)
    ("A", ts("2022-01-01 00:00:00"), 10.0),
    ("A", ts("2022-01-04 00:00:00"), 20.0),
    ("B", ts("2022-01-09 00:00:00"), 30.0)
  ).toDF("sym", "qts", "px")

  private lazy val trades = Seq(
    // (sym, tts, trade_id)
    ("A", ts("2022-01-05 10:00:00"), 1L), // after both A quotes → px 20
    ("A", ts("2022-01-01 00:00:00"), 2L), // equal ts → inclusive, px 10
    ("A", ts("2021-12-31 23:59:59"), 3L), // before any quote → dropped
    ("B", ts("2022-01-03 00:00:00"), 4L), // before B's quote → dropped
    ("C", ts("2022-01-03 00:00:00"), 5L)  // key absent on right → dropped
  ).toDF("sym", "tts", "trade_id")

  test("asof join picks the latest right row at-or-before each left time") {
    val out = asofJoin(trades, quotes, "sym", "sym", "tts", "qts")
      .select("trade_id", "px").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 20.0, 2L -> 10.0))
  }

  test("asof join keeps all left columns and the right payload columns") {
    val out = asofJoin(trades, quotes, "sym", "sym", "tts", "qts")
    assert(out.columns.toSeq == Seq("sym", "tts", "trade_id", "qts", "px"))
  }

  test("asof join matches the naive quadratic definition on random data") {
    val right = (1 to 40).map(i =>
      ((i % 5).toString, ts(f"2022-01-${i % 27 + 1}%02d 00:00:00"), i * 1.0))
      .distinct.toDF("k", "rt", "v")
      // determinism contract: unique (key, time) on the right
      .groupBy("k", "rt").agg(org.apache.spark.sql.functions.max("v").as("v"))
    val left = (1 to 60).map(i =>
      ((i % 7).toString, ts(f"2022-01-${i % 28 + 1}%02d 12:00:00"), i.toLong))
      .toDF("k", "lt", "id")
    val got = asofJoin(left, right, "k", "k", "lt", "rt")
      .select("id", "v").as[(Long, Double)].collect().toMap
    val r = right.as[(String, Timestamp, Double)].collect()
    val naive = left.as[(String, Timestamp, Long)].collect().flatMap {
      case (k, lt, id) =>
        val prior = r.filter(q => q._1 == k && !q._2.after(lt))
        if (prior.isEmpty) None
        else Some(id -> prior.maxBy(_._2.getTime)._3)
    }.toMap
    assert(got == naive)
  }
}
