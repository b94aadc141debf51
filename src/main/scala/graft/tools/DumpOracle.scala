package graft.tools

/** Dev-only: dump SparkEntry.oracleSql as sorted TSV for split-refactor
  * equivalence checks (no SparkSession needed). */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val w = new java.io.PrintWriter(args(0))
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (k, v) =>
      w.println(k + "\t" + v.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t"))
    }
    w.close()
    println(s"[dump] ${graft.SparkEntry.oracleSql.size} entries -> ${args(0)}")
  }
}
