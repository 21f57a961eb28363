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

  /** Targeted row deletion from a PARTITIONED managed table — the
    * right-to-be-forgotten / takedown sweep a standing corpus must
    * support without rewriting the world: find the partitions that
    * actually CONTAIN deletion hits (one column-pruned scan of the id
    * and partition columns, with the deletion set broadcast — parquet
    * min/max stats prune row groups where the ids cannot occur), then
    * rewrite ONLY those partitions minus the deleted rows via dynamic
    * partition overwrite. Every untouched partition's files are left
    * byte-identical on disk (the spec asserts on file paths+sizes) —
    * at 100 TB the rewrite cost is proportional to the partitions the
    * ids live in, not the corpus, which is why deletion-heavy
    * lakehouse layouts partition or Z-order ([[graft.operators.ZOrder]])
    * by the deletion key's prefix.
    *
    * Returns the number of partitions rewritten. Idempotent: a rerun
    * with the same ids finds no hits and rewrites nothing. */
  def deleteRows(spark: SparkSession, table: String, partitionCol: String,
      idCol: String, ids: DataFrame): Long = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val idSet = ids.select(col(ids.columns.head).as("_del_id")).distinct()
    val hitParts = spark.table(table)
      .join(broadcast(idSet), col(idCol) === col("_del_id"))
      .select(col(partitionCol)).distinct()
      .collect().map(_.get(0))
    if (hitParts.isEmpty) return 0L
    // read back only the affected partitions (partition-pruned scan),
    // drop the deleted ids, rewrite those partitions in place
    val survivors = spark.table(table)
      .filter(col(partitionCol).isin(hitParts: _*))
      .join(broadcast(idSet), col(idCol) === col("_del_id"), "left_anti")
    // localCheckpoint: the overwrite must not re-read the partitions it
    // is replacing mid-write — and the survivor partition list is
    // needed BEFORE the write to find fully-emptied partitions
    val mat = survivors.localCheckpoint()
    val surviving = mat.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSet
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try mat.write.mode("overwrite").insertInto(table)
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    // dynamic overwrite only replaces partitions PRESENT in the write:
    // a partition whose every row was deleted has no survivor rows and
    // must be dropped explicitly or its dead rows would remain
    def lit(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case other => String.valueOf(other)
    }
    hitParts.filterNot(surviving.contains).foreach { v =>
      spark.sql(s"ALTER TABLE ${quoted(table)} DROP IF EXISTS PARTITION " +
        s"(${quoted(partitionCol)} = ${lit(v)})")
    }
    hitParts.length.toLong
  }

  /** Snapshot reconciliation: keyed diff of two table versions into
    * added / removed / changed / unchanged rows — the audit every
    * ingest hand-off and migration runs ("what did this batch actually
    * do?"), and the verification half of [[deleteRows]].
    *
    * Each side collapses to (key, content-hash) FIRST — the full-outer
    * join shuffles 16-byte digests, never row payloads — so the diff
    * costs two projections plus one keyed join regardless of row
    * width. Compared columns are rendered through an explicit
    * formatter (cast to string by the CALLER's column expressions)
    * with \u0001 separators and \u0000 for NULL, so "null" the string
    * and NULL the value cannot collide and column boundaries cannot
    * shift.
    *
    * Output: (key, status, hash_a, hash_b); status in {added, removed,
    * changed, unchanged}. Filter `status != 'unchanged'` for the delta
    * report — unchanged rows are kept so counts reconcile. */
  def tableDiff(a: DataFrame, b: DataFrame, key: String,
      compare: Seq[org.apache.spark.sql.Column]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(compare.nonEmpty, "tableDiff: no compare columns")
    def hashed(df: DataFrame, h: String) = df.select(col(key),
      md5(concat_ws("\u0001",
        compare.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))
        .as(h))
    hashed(a, "hash_a").join(hashed(b, "hash_b"), Seq(key), "full_outer")
      .select(col(key),
        when(col("hash_a").isNull, lit("added"))
          .when(col("hash_b").isNull, lit("removed"))
          .when(col("hash_a") =!= col("hash_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("hash_a"), col("hash_b"))
  }

  /** MERGE-INTO semantics over a keyed snapshot: apply a CDC
    * changeset of inserts/updates/deletes in one pass —
    *   result = (base ⟕anti changeset.keys) ∪ changeset[op ≠ 'D']
    * Upsert and delete collapse into the same two operators: every
    * changed key's old row drops via the anti-join; every non-delete
    * change contributes its NEW image. The changeset must carry at
    * most one row per key (the compacted form every CDC log reader
    * emits — enforce upstream with a last-write-wins window); `op` is
    * 'I' | 'U' | 'D' and the payload columns must match the base
    * schema.
    *
    * Scale: one equi-shuffle on the key for the anti-join (broadcast
    * when the changeset is small — the common case, which AQE picks
    * from stats) plus a union: the base is never re-aggregated or
    * sorted, so applying a 0.1% daily changeset to a 100 TB snapshot
    * costs one pruned join, not a rebuild. The delete half is the
    * batch shape of [[deleteRows]]; the upsert half is [[tableDiff]]'s
    * inverse (diff derives a changeset, this applies one). */
  def applyChangeSet(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val payload = base.columns.toSeq
    val kept = base.join(changes.select(col(key)), Seq(key), "left_anti")
    val applied = changes.filter(col(opCol) =!= "D")
      .select(payload.map(col): _*)
    kept.unionByName(applied)
  }
}
