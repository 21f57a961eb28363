package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times a count() of every registered query at
  * SPARK_GRAFT_SF_DIR, printing one JSON line (driver contract). A
  * small untimed warm-up absorbs JVM/classloader/codegen start-up cost
  * so per-query numbers reflect steady state rather than which query
  * happened to run first. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (untimed): exercise scan, shuffle, and codegen paths once
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.region(spark, sfDir).groupBy("r_name").count().collect()
    // a crashing query reports -1 seconds (visible failure marker)
    // instead of a spuriously-fast timing
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
