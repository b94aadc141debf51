package graft

import java.sql.Timestamp
import graft.operators.RangeJoin.binnedRangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("range join is inclusive at start, exclusive at end") {
    val iv = Seq((1L, ts("2022-01-01 00:00:00"), ts("2022-01-08 00:00:00"), "w1"))
      .toDF("ik", "start", "end", "win")
    val pts = Seq(
      (1L, ts("2022-01-01 00:00:00"), "at-start"),   // == start → in
      (1L, ts("2022-01-07 23:59:59"), "pre-end"),    // < end → in
      (1L, ts("2022-01-08 00:00:00"), "at-end"),     // == end → out
      (1L, ts("2021-12-31 23:59:59"), "before"),     // out
      (2L, ts("2022-01-02 00:00:00"), "other-key")   // key mismatch → out
    ).toDF("pk", "t", "tag")
    val got = binnedRangeJoin(iv, pts, "ik", "pk", "start", "end", "t",
      7L * 86400).select("tag").as[String].collect().toSet
    assert(got == Set("at-start", "pre-end"))
  }

  test("intervals straddling bin boundaries still match points in later bins") {
    // binWidth 1 day, interval spans 3 days → exploded over 3-4 bins
    val iv = Seq((1L, ts("2022-01-01 12:00:00"), ts("2022-01-04 12:00:00"), "w"))
      .toDF("ik", "start", "end", "win")
    val pts = Seq(
      (1L, ts("2022-01-01 13:00:00"), "b0"),
      (1L, ts("2022-01-03 00:00:01"), "b2"),
      (1L, ts("2022-01-04 11:59:59"), "b3-in"),
      (1L, ts("2022-01-04 12:00:00"), "b3-out")
    ).toDF("pk", "t", "tag")
    val got = binnedRangeJoin(iv, pts, "ik", "pk", "start", "end", "t", 86400)
      .select("tag").as[String].collect().toSet
    assert(got == Set("b0", "b2", "b3-in"))
  }

  test("range join matches the naive inequality join on random data") {
    val iv = (1 to 30).map { i =>
      val s = ts(f"2022-01-${i % 20 + 1}%02d ${i % 23}%02d:00:00")
      (i % 4L, s, new Timestamp(s.getTime + (i % 5 + 1) * 86400000L), i)
    }.toDF("ik", "start", "end", "iid")
    val pts = (1 to 50).map { i =>
      (i % 5L, ts(f"2022-01-${i % 25 + 1}%02d ${(i * 7) % 23}%02d:30:00"), i)
    }.toDF("pk", "t", "pid")
    val got = binnedRangeJoin(iv, pts, "ik", "pk", "start", "end", "t",
      2L * 86400).select("iid", "pid").as[(Int, Int)].collect().toSet
    val ivL = iv.as[(Long, Timestamp, Timestamp, Int)].collect()
    val ptL = pts.as[(Long, Timestamp, Int)].collect()
    val naive = (for {
      (ik, s, e, iid) <- ivL
      (pk, t, pid) <- ptL
      if ik == pk && !t.before(s) && t.before(e)
    } yield (iid, pid)).toSet
    assert(got == naive && naive.nonEmpty)
  }
}
