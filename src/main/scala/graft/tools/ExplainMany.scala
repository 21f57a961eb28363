package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for a comma-separated list of registered
  * queries into one file per query — the plan-evidence capture behind
  * plans/rNN/<query>_{before,after}.txt (one JVM instead of one sbt
  * launch per query).
  *
  * Usage: SPARK_GRAFT_ONLY=q212_hits,q222_link_prediction \
  *        SPARK_GRAFT_PLAN_DIR=plans/r10 SPARK_GRAFT_PLAN_SUFFIX=after \
  *        runMain graft.tools.ExplainMany [sfDir]
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r10")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[explainmany] wrote $outDir/${n}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explainmany] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
