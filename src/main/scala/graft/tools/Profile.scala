package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Micro-profiler: times selected SparkEntry queries N times each (after a
  * shared warm-up) so regressions can be localized without the full Bench
  * run, and reports the scheduling anatomy (jobs / stages / tasks and the
  * summed task time) of the LAST rep so "is this query slow because of
  * engine work or because of job-count overhead" is read off a number.
  * `SPARK_GRAFT_CONF=k=v;k=v` applies extra session confs (runtime-settable
  * ones only) before the warm-up, for A/B experiments. Dev tool, not part
  * of the driver contract.
  * Usage: runMain graft.tools.Profile <sfDir> <reps> [q ...] */
object Profile {
  private class Counts extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      val i = s.stageInfo
      val dur = (for (a <- i.completionTime; b <- i.submissionTime)
        yield a - b).getOrElse(-1L)
      stageLog.add((i.name.linesIterator.next(), i.numTasks, dur))
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      if (t.taskInfo != null) taskMs += t.taskInfo.duration
    }
    def snap(): (Int, Int, Int, Long) = (jobs, stages, tasks, taskMs)
  }

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
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        try fn(spark, sfDir).count() // warm rep (codegen, listing)
        catch { case e: Throwable => println(s"$n WARMUP FAILED: $e") }
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable => println(s"$n FAILED: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        val before = counts.snap()
        val tLast = {
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable => println(s"$n FAILED: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        val after = counts.snap()
        println(f"$n%-28s min=${times.min}%.3f " +
          f"med=${times.sorted.apply(reps / 2)}%.3f last=$tLast%.3f " +
          f"jobs=${after._1 - before._1}%d stages=${after._2 - before._2}%d " +
          f"tasks=${after._3 - before._3}%d taskSec=${(after._4 - before._4) / 1e3}%.2f")
        if (sys.env.contains("SPARK_GRAFT_STAGES")) {
          import scala.jdk.CollectionConverters._
          counts.stageLog.asScala.toSeq.sortBy(-_._3).take(12).foreach {
            case (nm, nt, dur) =>
              println(f"    stage $dur%6dms tasks=$nt%-4d $nm")
          }
        }
        counts.stageLog.clear()
      }
    }
    spark.stop()
  }
}
