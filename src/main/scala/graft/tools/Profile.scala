package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profiler: times selected SparkEntry queries N times each (after a
  * shared warm-up) so regressions can be localized without the full Bench
  * run. Dev tool, not part of the driver contract.
  * Usage: runMain graft.tools.Profile <sfDir> <reps> [q ...] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable => println(s"$n FAILED: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$n%-28s min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f")
      }
    }
    spark.stop()
  }
}
