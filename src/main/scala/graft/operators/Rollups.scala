package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.plans.RollupRouting
import graft.plans.RollupRouting.{Registration, SumSpec}

/** Materialized rollups: build a pre-aggregated summary of a base scan
  * at a declared grain, persist it, and register it with
  * [[graft.plans.RollupRouting]] so subsumed aggregates transparently
  * re-aggregate the summary instead of re-scanning the base. The
  * measures are exactly the algebraic set whose partials merge
  * losslessly (SUM / COUNT(*) / MIN / MAX); SUMs may carry a declared
  * cast (e.g. DECIMAL(27,6) for the money grid) applied per base row
  * BEFORE the partial sum, so the summary accumulates on the same
  * exact grid the queries use and re-aggregation cannot drift.
  *
  * 100 TB stance: the summary is one shuffle over the base at build
  * time (or zero extra reads when maintained incrementally by
  * [[rollupIngest]]) and typically 3–6 orders of magnitude smaller;
  * every routed query thereafter reads the summary's megabytes instead
  * of the base's terabytes. Routing is value-exact, so it composes
  * with the oracle gate: a routed query hashes identically to the
  * direct aggregation.
  */
object Rollups {

  /** Declarative rollup definition. `sums` are (base column, optional
    * per-row cast); COUNT(*) is always materialized (`cnt`) because
    * COUNT and AVG routing both need it. */
  final case class RollupDef(
      groupCols: Seq[String],
      sums: Seq[(String, Option[DataType])] = Nil,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil)

  private def sumCol(c: String) = s"sum_$c"
  private def minCol(c: String) = s"min_$c"
  private def maxCol(c: String) = s"max_$c"

  /** The per-grain partial aggregate — the shared kernel of the batch
    * build and the streaming delta. */
  private def partial(base: DataFrame, d: RollupDef): DataFrame = {
    val aggs: Seq[Column] =
      d.sums.map { case (c, cast) =>
        sum(cast.fold(col(c))(dt => col(c).cast(dt))).as(sumCol(c))
      } ++ Seq(count(lit(1)).as("cnt")) ++
        d.mins.map(c => min(col(c)).as(minCol(c))) ++
        d.maxs.map(c => max(col(c)).as(maxCol(c)))
    base.groupBy(d.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge summaries at the same grain (a second-level partial): sums
    * and counts add, mins/maxs fold — the algebraic-merge property the
    * router itself relies on. */
  private def merge(parts: DataFrame, d: RollupDef): DataFrame = {
    val aggs: Seq[Column] =
      d.sums.map { case (c, _) => sum(col(sumCol(c))).as(sumCol(c)) } ++
        Seq(sum(col("cnt")).as("cnt")) ++
        d.mins.map(c => min(col(minCol(c))).as(minCol(c))) ++
        d.maxs.map(c => max(col(maxCol(c))).as(maxCol(c)))
    parts.groupBy(d.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def registration(base: DataFrame, summary: DataFrame,
      d: RollupDef): Registration = {
    val leaves = base.queryExecution.analyzed.collectLeaves()
    val paths = leaves match {
      case Seq(lr: LogicalRelation) => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString).toSet
        case other => throw new IllegalArgumentException(
          s"Rollups: base must be a file scan, got ${other.getClass}")
      }
      case other => throw new IllegalArgumentException(
        s"Rollups: base must be a single scan, got ${other.size} leaves")
    }
    Registration(
      basePaths = paths,
      summary = summary.queryExecution.analyzed,
      groupCols = d.groupCols.toSet,
      sums = d.sums.map { case (c, cast) => SumSpec(c, cast, sumCol(c)) },
      countCol = Some("cnt"),
      mins = d.mins.map(c => c -> minCol(c)).toMap,
      maxs = d.maxs.map(c => c -> maxCol(c)).toMap)
  }

  /** Build the summary with ONE aggregation over the base, persist it
    * at `path` (overwrite), and register routing under `key`. Returns
    * the summary scan. Re-invocation rebuilds and re-registers — the
    * stored plan pins the file listing of this build. */
  def materialize(base: DataFrame, key: String, path: String,
      d: RollupDef): DataFrame = {
    require(d.groupCols.nonEmpty, "Rollups.materialize: empty grain")
    partial(base, d).write.mode("overwrite").parquet(path)
    val spark = base.sparkSession
    val summary = spark.read.parquet(path)
    RollupRouting.register(spark, key, registration(base, summary, d))
    summary
  }

  /** Remove a registration (tests; a dropped summary MUST unregister
    * before its files vanish). */
  def unregister(key: String): Unit = RollupRouting.unregister(key)

  /** Incremental rollup maintenance — the streaming twin: a
    * `foreachBatch` function that partial-aggregates each micro-batch
    * to the grain (bounded: one row per grain value seen in the batch)
    * and lands it as an idempotent batch_id delta partition under the
    * standard crash-window contract ([[Sketches.writeDeltaTo]]): a
    * replay of the delta-landed/state-lost window REWRITES its own
    * partition instead of double-counting the additive sums. The
    * merged view ([[rollupMerged]]) equals the one-shot batch build
    * over everything ingested, because every measure is algebraic.
    * The base corpus is touched once per batch — the 100 TB fact
    * table is never re-scanned to keep the rollup fresh. */
  def rollupIngest(d: RollupDef, deltaTable: String, stateTable: String)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => if (!batch.isEmpty) {
      Sketches.writeDeltaTo(partial(batch, d), batchId, deltaTable,
        stateTable)
    }

  /** The rollup over everything [[rollupIngest]] has landed: one
    * bounded merge over the delta spine (n_batches × grain rows), the
    * same shape [[graft.operators.Sketches.compactDeltas]] maintains.
    * Drop-in equal to `materialize`'s one-shot summary. */
  def rollupMerged(spark: SparkSession, deltaTable: String,
      d: RollupDef): DataFrame =
    merge(spark.table(deltaTable).drop("batch_id"), d)

  /** Register routing onto an existing summary DataFrame (e.g. a
    * [[rollupMerged]] view persisted to parquet). */
  def registerSummary(base: DataFrame, summary: DataFrame, key: String,
      d: RollupDef): Unit =
    RollupRouting.register(base.sparkSession, key,
      registration(base, summary, d))
}
