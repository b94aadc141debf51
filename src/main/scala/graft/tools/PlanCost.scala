package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-side cost attribution for one or more SparkEntry queries:
  * splits wall time into DataFrame construction, analysis, optimization,
  * physical planning, and execution, so "slow because Catalyst chews a
  * giant tree" is distinguishable from "slow because tasks are slow".
  * Dev tool, not part of the driver contract.
  * Usage: runMain graft.tools.PlanCost <sfDir> [q ...] */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def ms(t0: Long) = (System.nanoTime() - t0) / 1e6
    names.foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        try {
          fn(spark, sfDir).count() // warm rep
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val tCon = ms(t0)
          val t1 = System.nanoTime()
          val qe = df.queryExecution
          qe.assertAnalyzed()
          val tAna = ms(t1)
          val t2 = System.nanoTime()
          qe.optimizedPlan
          val tOpt = ms(t2)
          val t3 = System.nanoTime()
          qe.executedPlan
          val tPhy = ms(t3)
          val t4 = System.nanoTime()
          df.count()
          val tExe = ms(t4)
          println(f"$n%-26s con=$tCon%7.1f ana=$tAna%7.1f opt=$tOpt%7.1f " +
            f"phy=$tPhy%7.1f exe=$tExe%8.1f totalMs=${tCon+tAna+tOpt+tPhy+tExe}%8.1f")
        } catch { case e: Throwable => println(s"$n FAILED: $e") }
      }
    }
    spark.stop()
  }
}
