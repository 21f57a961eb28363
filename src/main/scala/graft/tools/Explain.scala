package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the optimized plan of a registered query (local tooling). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan.toString
    println("[explain] md5 occurrences: " + "md5\\(".r.findAllIn(plan).length)
    println("[explain] conv occurrences: " + "conv\\(".r.findAllIn(plan).length)
    println(plan.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
