package graft.tools
import org.apache.spark.sql.SparkSession
/** Time a comma-separated subset of registered queries at
  * SPARK_GRAFT_SF_DIR with the Bench methodology (warm-up + noop sink)
  * — the local iteration aid for chasing a single query's regression
  * without a full Bench pass. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def run(n: String): Unit = graft.SparkEntry.queries(n)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      try { run(n) } catch { case _: Throwable => () }
      graft.queries.AuditCache.clear() // timed run computes from parquet
      val t0 = System.nanoTime()
      try { run(n); println(f"SUBSET $n ${(System.nanoTime()-t0)/1e9}%.3f s") }
      catch { case e: Throwable => println(s"SUBSET $n FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
