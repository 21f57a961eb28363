package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** D1/D2 — the engine's "catalog" surface (SURVEY.md §2.3). The
  * reference manages its dataflow endpoints by shelling out to
  * `kafka-topics.sh --create --partitions N --replication-factor 3` /
  * `--delete` (/root/reference/src/utils.py:221-244, swept per camera
  * at /root/reference/src/utils.py:235-244). The Spark-native analog is
  * the session catalog: a managed table BUCKETED by the routing key
  * plays the role of a partitioned topic — both fix the parallelism up
  * front and co-locate records by key, which is what makes downstream
  * joins/scans shuffle-free (see PlanSpec's bucketed-join test).
  *
  * Kafka deployments manage real topics with
  * `org.apache.kafka.clients.admin.AdminClient#createTopics/deleteTopics`
  * — intentionally not wired here: the sandbox ships no kafka-clients
  * jar or broker, and a compile-time dependency would be dead weight
  * (the same position KafkaIO takes on sources/sinks).
  */
object Catalog {

  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** D1: CREATE — persist `df` as a managed table bucketed into
    * `nBuckets` by `bucketCol` (the partition-count analog of the
    * reference's set_topic), sorted within buckets when `sortCol` is
    * given so merge joins skip their sort. Overwrites any previous
    * definition, like the reference's clear-then-create driver
    * (/root/reference/run_producers.py:11-23). */
  def createBucketedTable(df: DataFrame, name: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val bucketed = df.write.bucketBy(nBuckets, bucketCol)
    sortCol.fold(bucketed)(c => bucketed.sortBy(c))
      .mode("overwrite").saveAsTable(name)
  }

  /** D1, unbucketed form: plain managed table. */
  def createTable(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").saveAsTable(name)

  /** D2: DROP, idempotent like the reference's clear_topic (which
    * ignores missing topics). Returns whether the table existed. */
  def dropTable(spark: SparkSession, name: String): Boolean = {
    val existed = spark.catalog.tableExists(name)
    spark.sql(s"DROP TABLE IF EXISTS ${quoted(name)}")
    existed
  }

  /** D2 sweep analog: drop every table with the prefix, like the
    * reference's per-camera topic sweep. Returns the dropped names. */
  def dropTables(spark: SparkSession, prefix: String): Seq[String] = {
    val names = spark.catalog.listTables()
      .filter(_.name.startsWith(prefix)).collect().map(_.name).toSeq
    names.foreach(n => dropTable(spark, n))
    names
  }

  /** Curated-corpus write path: hive-style partitioned parquet, the
    * output layout a 100 TB training pipeline hands to the trainer.
    * Partitioning by a low-cardinality column (lang, source, split)
    * makes downstream `WHERE lang = 'en'` scans read ONLY the matching
    * directories (PartitionFilters, proven in SourcesSpec), and
    * `filesPerPartition` caps the small-files problem: rows are
    * shuffled on (partition value, salt) where salt = hash(id) mod
    * filesPerPartition, so each partition dir is written by at most
    * that many tasks — file count is bounded by cardinality ×
    * filesPerPartition regardless of upstream parallelism. Without the
    * pre-shuffle, every upstream task writes a sliver of every
    * partition dir (tasks × cardinality files). The salt comes from a
    * stable id column, not rand(), so task retries rewrite identical
    * files. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
      idCol: String, filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    require(filesPerPartition > 0, "filesPerPartition must be positive")
    df.repartition(col(partitionCol), pmod(hash(col(idCol)), lit(filesPerPartition)))
      .write.partitionBy(partitionCol).mode("overwrite").parquet(path)
  }
}
