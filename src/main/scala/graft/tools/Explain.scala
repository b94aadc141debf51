package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: prints the formatted physical plan of selected
  * SparkEntry queries (all when no names given). Dev tool, not part of the
  * driver contract. Usage: runMain graft.tools.Explain <sfDir> [q ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n========== $n ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    }
    spark.stop()
  }
}
