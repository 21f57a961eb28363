package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage accounting — the measurement behind the
  * "shrink the per-query fixed floor" audit: at sf0.1 most queries are
  * dominated by job-turnaround and plan/codegen overhead, so every
  * avoidable driver action (a routing count, an eager checkpoint
  * feeding a single arm) is ~50-300 ms of pure floor. Prints one line
  * per query: name, wall seconds, jobs launched, stages completed,
  * tasks completed. Local tooling, not part of the driver contract. */
object JobCount {
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
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def run(n: String): Unit = graft.SparkEntry.queries(n)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    val list = if (names.nonEmpty) names.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    list.foreach { n =>
      try { run(n) } catch { case _: Throwable => () } // warm-up
      graft.queries.AuditCache.clear()
      // settle async listener events from the warm-up before zeroing
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      try {
        run(n)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"JOBCOUNT $n sec=$dt%.3f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      } catch { case e: Throwable => println(s"JOBCOUNT $n FAILED ${e.getMessage}") }
      graft.queries.AuditCache.clear()
      spark.sparkContext.getPersistentRDDs.values.foreach { rdd =>
        try rdd.unpersist(blocking = true) catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
