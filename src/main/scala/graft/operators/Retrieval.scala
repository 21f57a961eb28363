package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions.tokens
import graft.functions.VectorFunctions.{cosineWithNorms, fastNorm}

/** Retrieval operators for a training-data pipeline: BM25 lexical
  * ranking, reciprocal-rank fusion of heterogeneous rankers, and
  * hard-negative mining for contrastive training sets. The reference's
  * only retrieval primitive is the broadcast face-match
  * (/root/reference/src/prediction_producer.py:305-325); these are its
  * corpus-scale generalizations on the inverted-index / embedding
  * side, composed from the same token and vector machinery the dedup
  * and ANN families already use.
  *
  * Scale stance (100 TB): queries are the SMALL side everywhere — BM25
  * joins the query-term set (broadcastable by planner stats) onto the
  * posting relation, so corpus-side work is one tf pass plus one
  * term-keyed aggregation, never a corpus×corpus product; fusion
  * operates on the top-k lists (query-bounded); hard-negative mining
  * broadcasts the anchor batch and streams the corpus through one
  * ranked scan, capped the way [[Similarity.topK]] caps its exact arm.
  */
object Retrieval {

  /** BM25 top-k retrieval over a tokenized corpus.
    *
    * One shuffle builds per-(doc, term) counts with map-side combine
    * (the q48 inverted-index shape); document frequency is a second,
    * term-keyed aggregation whose output is vocabulary-bounded; the
    * query-term join hits only matching postings, so the scored
    * relation is bounded by the postings of the query vocabulary, not
    * the corpus.
    *
    * Exactness: per-term partial scores are pure rational arithmetic
    * on exactly-representable integers (tf, dl, df, N) — with
    * `logIdf=false` the IDF is the odds form (N−df+0.5)/(df+0.5), no
    * ln() whose last ulp differs across libm implementations (the
    * q48 stance) — each rounded to 1e-6 and summed as DECIMAL(18,6),
    * so the total is independent of aggregation order and bit-identical
    * across engines. `logIdf=true` (the default) is the classic
    * Robertson–Spärck Jones ln(1 + odds) for production ranking.
    *
    * @param queries (qId, term) pairs — duplicate terms should be
    *                pre-deduplicated (query tf is not modeled)
    * @return (qId, id, score, rank), rank 1..k per query by score
    *         descending, ties broken by document id */
  def bm25TopK(
      docs: DataFrame, id: String, text: String,
      queries: DataFrame, qId: String, term: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = true): DataFrame = {
    val toks = docs.select(col(id).as("doc"), tokens(col(text)).as("w"))
      .select(col("doc"), col("w"), size(col("w")).cast("long").as("dl"))
    val tf = toks
      .select(col("doc"), col("dl"), explode(col("w")).as("t"))
      .groupBy(col("doc"), col("dl"), col("t"))
      .agg(count(lit(1)).as("cnt"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("tot"))
    scoreBm25(tf, df, stats, queries, qId, term, k, k1, b, logIdf)
      .withColumnRenamed("doc", id)
  }

  /** BUILD-ONCE postings index for [[bm25TopKIndexed]]: ONE corpus
    * tokenization pass materializes `<prefix>_postings` (doc, dl, t,
    * cnt) BUCKETED by term, then `<prefix>_df` and `<prefix>_stats`
    * derive from the SAVED postings — never from the corpus again.
    * The inline [[bm25TopK]] scans the corpus three times by lineage
    * (tf / df / stats arms); at 100 TB you build this index once and
    * every query-time term join reads the big side pre-partitioned
    * (zero postings-side Exchange — the ANN-index pattern, plan-pinned
    * in RetrievalSpec). */
  def bm25BuildIndex(docs: DataFrame, id: String, text: String,
      prefix: String, nBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    val tf = docs.select(col(id).as("doc"), tokens(col(text)).as("w"))
      .select(col("doc"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("t"))
      .groupBy(col("doc"), col("dl"), col("t"))
      .agg(count(lit(1)).as("cnt"))
    graft.Catalog.createBucketedTable(tf, s"${prefix}_postings", "t",
      nBuckets, sortCol = Some("t"))
    bm25RefreshStats(spark, prefix, nBuckets)
  }

  /** STREAMING twin of [[bm25BuildIndex]] — incremental postings
    * maintenance in the [[graft.operators.Dedup.dedupIngest]]
    * catalog-table style: a `foreachBatch` function that tokenizes each
    * micro-batch and APPENDS its (doc, dl, t, cnt) postings to the
    * bucketed `<prefix>_postings` table. Per-document postings are
    * independent of every other document, so the streamed postings
    * relation is IDENTICAL to the batch build over the same docs —
    * df/stats are corpus-level and therefore derive from the postings
    * on demand ([[bm25RefreshStats]]), the classic
    * near-real-time-search split (append postings continuously,
    * refresh collection stats at query/publish points).
    *
    * Per-batch work is one map-side-combined tokenize+count of the
    * batch plus a bucket-spec append — the growing index is never read,
    * let alone shuffled. `<prefix>_state` records the last applied
    * batch id; a replayed batch (foreachBatch redelivery after a crash
    * past the state write) is skipped whole, so postings never
    * double-count a document ([[graft.operators.Similarity.semDedupIngest]]'s
    * guard). Writes are postings → state: the remaining crash window
    * replays at-least-once, never losing a batch. */
  def bm25Ingest(id: String, text: String, prefix: String,
      nBuckets: Int = 32): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val stateTable = s"${prefix}_state"
      val lastBatch: Long =
        if (spark.catalog.tableExists(stateTable))
          spark.table(stateTable).head().getLong(0)
        else -1L
      if (batchId > lastBatch) {
        val tf = batch.select(col(id).as("doc"), tokens(col(text)).as("w"))
          .select(col("doc"), size(col("w")).cast("long").as("dl"),
            explode(col("w")).as("t"))
          .groupBy(col("doc"), col("dl"), col("t"))
          .agg(count(lit(1)).as("cnt"))
        tf.write.mode("append").bucketBy(nBuckets, "t").sortBy("t")
          .saveAsTable(s"${prefix}_postings")
        Seq(batchId).toDF("last_batch")
          .write.mode("overwrite").saveAsTable(stateTable)
      }
    }
  }

  /** Re-derive `<prefix>_df` and `<prefix>_stats` from the CURRENT
    * `<prefix>_postings` — the publish step after [[bm25Ingest]] has
    * appended batches (the batch [[bm25BuildIndex]] runs this
    * automatically). One postings pass each; the df aggregation needs
    * no postings-side shuffle thanks to the term bucketing. After this,
    * [[bm25TopKIndexed]] answers against everything ingested so far. */
  def bm25RefreshStats(spark: org.apache.spark.sql.SparkSession,
      prefix: String, nBuckets: Int = 32): Unit = {
    val saved = spark.table(s"${prefix}_postings")
    graft.Catalog.createBucketedTable(
      saved.groupBy(col("t")).agg(count(lit(1)).as("df")),
      s"${prefix}_df", "t", nBuckets, sortCol = Some("t"))
    graft.Catalog.createTable(
      saved.select(col("doc"), col("dl")).distinct()
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")),
      s"${prefix}_stats")
  }

  /** Query-time BM25 against a [[bm25BuildIndex]]-built index: the
    * query-term set joins the bucketed postings/df tables on `t` with
    * no index-side shuffle; scored work is bounded by the postings of
    * the query vocabulary. Identical results to [[bm25TopK]] over the
    * same corpus (pinned in RetrievalSpec). */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession,
      prefix: String, queries: DataFrame, qId: String, term: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = true): DataFrame =
    scoreBm25(spark.table(s"${prefix}_postings"), spark.table(s"${prefix}_df"),
      spark.table(s"${prefix}_stats"), queries, qId, term, k, k1, b, logIdf)

  /** The shared BM25 scoring tail: matched postings only — query terms
    * (the small side) equi-join the tf relation; per-term scores are
    * rational in (cnt, dl, df, n, avgdl), mirrored token-for-token by
    * the DuckDB oracle; decimal accumulation makes the total
    * order-independent. Output keyed (qId, doc). */
  /** Per-(posting, matched query term) BM25 partial score, rounded to
    * 1e-6 — over columns (cnt, dl, df, n, tot). Shared by the one-shot
    * rankers and both [[rm3TopK]] passes. */
  private def bm25TermScore(k1: Double, b: Double, logIdf: Boolean): Column = {
    val odds = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val idf = if (logIdf) log(odds + lit(1.0)) else odds
    round(
      idf * (col("cnt") * (lit(k1) + lit(1)) /
        (col("cnt") + lit(k1) * (lit(1) - lit(b) +
          lit(b) * col("dl") / (col("tot").cast("double") / col("n"))))),
      6)
  }

  private def scoreBm25(tf: DataFrame, df: DataFrame, stats: DataFrame,
      queries: DataFrame, qId: String, term: String,
      k: Int, k1: Double, b: Double, logIdf: Boolean): DataFrame = {
    val q = queries.select(col(qId).as("q"), col(term).as("t"))
    val scored = tf.join(q, "t").join(df, "t").crossJoin(stats)
      .select(col("q"), col("doc"),
        bm25TermScore(k1, b, logIdf).cast("decimal(18,6)").as("ts"))
      .groupBy(col("q"), col("doc"))
      .agg(sum(col("ts")).cast("double").as("score"))
    val w = Window.partitionBy(col("q")).orderBy(col("score").desc, col("doc"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q").as(qId), col("doc"), col("score"), col("rank"))
  }

  /** Reciprocal-rank fusion of two rankings (Cormack et al.: fused
    * score = Σ 1/(c + rank), missing entries contribute 0). Rank-based,
    * so heterogeneous scores (BM25 vs cosine) fuse without calibration;
    * every arithmetic step is rational on small integers — exact on
    * any engine. Operates on top-k lists, so cost is query-bounded
    * regardless of corpus size.
    *
    * @param a,b (qId, id, rank) rankings to fuse
    * @return (qId, id, fused, rank), rank 1..k by fused score
    *         descending, ties by document id */
  def rrfFuse(
      a: DataFrame, b: DataFrame, qId: String, id: String,
      k: Int, c: Int = 60): DataFrame = {
    val ra = a.select(col(qId).as("q"), col(id).as("d"), col("rank").as("ra"))
    val rb = b.select(col(qId).as("q"), col(id).as("d"), col("rank").as("rb"))
    val fused = ra.join(rb, Seq("q", "d"), "full_outer")
      .withColumn("fused",
        coalesce(lit(1.0) / (lit(c) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rb")), lit(0.0)))
    val w = Window.partitionBy(col("q")).orderBy(col("fused").desc, col("d"))
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q").as(qId), col("d").as(id), col("fused"), col("rank"))
  }

  /** RM3-style pseudo-relevance feedback: run BM25, mine expansion
    * terms from the top `fbDocs` documents of each query, then re-rank
    * with the expanded weighted query — the classic recall lever when
    * queries underspecify their vocabulary (Lavrenko–Croft relevance
    * models, the Anserini/Indri default).
    *
    * Expansion-term weight is the relevance-model estimate
    * Σ_d P(t|d)·score(d) over the feedback docs, normalized by the
    * per-query max and scaled by `beta`; original terms keep weight 1.
    * Original query terms are excluded from expansion (they are already
    * in the query — RM3's interpolation is expressed by the 1-vs-beta
    * weights).
    *
    * Scale: the corpus-side tf relation materializes ONCE
    * (localCheckpoint — signature rows, the q41 stance) and feeds both
    * passes; feedback mining touches only fbDocs×|queries| postings
    * rows, and the second pass joins a query vocabulary of at most
    * (original + fbTerms) terms per query — corpus work stays two tf
    * scans' worth regardless of query count. Hash parity: the weight
    * sums accumulate 12dp-rounded terms as DECIMAL, weighted partial
    * scores round to 1e-6 and sum as DECIMAL(18,6) — both passes are
    * summation-order-independent.
    *
    * @return (qId, id, score, rank), rank 1..k per query over the
    *         expanded query */
  def rm3TopK(
      docs: DataFrame, id: String, text: String,
      queries: DataFrame, qId: String, term: String,
      k: Int, fbDocs: Int = 3, fbTerms: Int = 5, beta: Double = 0.4,
      k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = docs.select(col(id).as("doc"), tokens(col(text)).as("w"))
      .select(col("doc"), col("w"), size(col("w")).cast("long").as("dl"))
    val tf = toks
      .select(col("doc"), col("dl"), explode(col("w")).as("t"))
      .groupBy(col("doc"), col("dl"), col("t"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds first pass, feedback mining, second pass
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    // toks-based like bm25TopK (a zero-token doc has no tf rows but
    // still counts in n/avgdl)
    val stats = toks.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
      .localCheckpoint()
    val q = queries.select(col(qId).as("q"), col(term).as("t"))

    // pass 1: plain BM25, keep the feedback docs with their scores
    val fb = scoreBm25(tf, df, stats, queries, qId, term,
        fbDocs, k1, b, logIdf)
      .select(col(qId).as("q"), col("doc"), col("score"))
    // relevance-model term weights over the feedback docs
    val wt = tf.join(fb, "doc")
      .select(col("q"), col("t"),
        round((col("cnt").cast("double") / col("dl")) * col("score"), 12)
          .cast(DecimalType(28, 12)).as("p"))
      .groupBy(col("q"), col("t"))
      .agg(sum(col("p")).cast("double").as("wt"))
      .join(q, Seq("q", "t"), "left_anti") // originals are already weighted 1
    val wWin = Window.partitionBy(col("q")).orderBy(col("wt").desc, col("t"))
    val expansion = wt
      .withColumn("wmax", max(col("wt")).over(Window.partitionBy(col("q"))))
      .withColumn("er", row_number().over(wWin)).filter(col("er") <= fbTerms)
      .select(col("q"), col("t"),
        round(lit(beta) * col("wt") / col("wmax"), 6).as("weight"))
    val weighted = q.withColumn("weight", lit(1.0)).unionAll(expansion)

    // pass 2: weighted BM25 over the expanded query
    val scored = tf.join(weighted, "t").join(df, "t").crossJoin(stats)
      .select(col("q"), col("doc"),
        round(col("weight") * bm25TermScore(k1, b, logIdf), 6)
          .cast("decimal(18,6)").as("ts"))
      .groupBy(col("q"), col("doc"))
      .agg(sum(col("ts")).cast("double").as("score"))
    val w = Window.partitionBy(col("q")).orderBy(col("score").desc, col("doc"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q").as(qId), col("doc").as(id), col("score"), col("rank"))
  }

  /** Maximal-marginal-relevance re-rank (Carbonell–Goldstein): greedily
    * pick `k` results per query maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s) — relevance traded
    * against redundancy, the standard diversity pass over a first-stage
    * ranking (and the dedup-at-query-time twin of SemDeDup's
    * dedup-at-corpus-time).
    *
    * MMR is inherently sequential in k, but each of the k steps is a
    * bounded DataFrame program over the CANDIDATE lists (query-bounded
    * by construction — candidates × selected ≤ |cands|·k per query),
    * so the driver loop never touches corpus-scale data; everything
    * per-query runs in parallel inside each step. Similarities and MMR
    * scores round to `roundTo` before every argmax (ties by id), so
    * selection is deterministic and engine-exact.
    *
    * @param cands (qId, id, rel) first-stage candidates, rel rounded
    * @param vecs (vId, vec) embeddings for the candidate ids
    * @return (qId, id, mmr, rank) — rank is selection order 1..k */
  /** Natural ordering for the primitive id types the [[mmrRerank]]
    * driver path supports (None = unsupported, take the distributed
    * loop). */
  private def idOrdFor(dt: org.apache.spark.sql.types.DataType)
      : Option[Ordering[Any]] = dt match {
    case org.apache.spark.sql.types.LongType =>
      Some(Ordering.by((x: Any) => x.asInstanceOf[Long]))
    case org.apache.spark.sql.types.IntegerType =>
      Some(Ordering.by((x: Any) => x.asInstanceOf[Int]))
    case org.apache.spark.sql.types.StringType =>
      Some(Ordering.by((x: Any) => x.asInstanceOf[String]))
    case _ => None
  }

  def mmrRerank(
      cands: DataFrame, qId: String, id: String, rel: String,
      vecs: DataFrame, vId: String, vec: String,
      k: Int, lambda: Double = 0.7, roundTo: Int = 6): DataFrame = {
    require(k >= 1, "mmrRerank: k must be >= 1")
    val c = cands
      .select(col(qId).as("q"), col(id).as("d"), col(rel).as("rel"))
      .join(vecs.select(col(vId).as("d"), col(vec).as("v")), "d")
      .withColumn("nrm", fastNorm(col("v")))
      .localCheckpoint() // k steps re-read the candidate relation
    // DRIVER fast path (the hits/kMeans discipline): the candidate
    // relation is query-bounded by construction (|queries| × first-
    // stage k), so below the row guard the greedy walk runs in driver
    // scala over ONE collect — each distributed step otherwise costs
    // an anti-join + join + aggregate + argmax window + an eager
    // checkpoint (~3 job turnarounds × k steps of pure fixed overhead
    // at any benched SF). Arithmetic replicates the step exactly:
    // left-assoc vec_dot folds, dot/(nrm·snrm) cosine, BigDecimal
    // HALF_UP rounds, (score desc, id asc) argmax — so the selection
    // walk and every hash downstream are unchanged (oracle-pinned).
    locally {
      val idType = c.schema("d").dataType
      val cmpOpt = idOrdFor(idType)
      val qOrdOpt = idOrdFor(cands.schema(qId).dataType)
      if (cmpOpt.isDefined && qOrdOpt.isDefined && c.count() <= (1L << 16)) {
        val rows = c.collect()
        // field positions by NAME: the USING join reordered columns
        // (d leads), so positional access would silently swap q and d
        val (iQ, iD, iRel, iV, iNrm) = (c.schema.fieldIndex("q"),
          c.schema.fieldIndex("d"), c.schema.fieldIndex("rel"),
          c.schema.fieldIndex("v"), c.schema.fieldIndex("nrm"))
        if (rows.forall(r => !r.isNullAt(iD) && !r.isNullAt(iRel) &&
            !r.isNullAt(iV) && !r.isNullAt(iNrm))) {
          implicit val idOrd: Ordering[Any] = cmpOpt.get
          def rnd(x: Double): Double =
            java.math.BigDecimal.valueOf(x)
              .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue
          def dot(a: Array[Double], b: Array[Double]): Double = {
            var s = 0.0; var i = 0
            while (i < a.length) { s += a(i) * b(i); i += 1 }
            s
          }
          final case class Cand(d: Any, rel: Double, v: Array[Double],
            nrm: Double)
          val byQ = rows.groupBy(_.get(iQ)).toSeq
          val out = byQ.flatMap { case (q, rs) =>
            var remaining = rs.map(r => Cand(r.get(iD), r.getDouble(iRel),
              r.getSeq[Double](iV).toArray, r.getDouble(iNrm))).toVector
            var selected = Vector.empty[(Cand, Double, Int)]
            var rank = 1
            while (rank <= k && remaining.nonEmpty) {
              val scoredStep = remaining.map { cd =>
                val score =
                  if (rank == 1) rnd(lambda * cd.rel)
                  else {
                    val maxSim = selected.iterator.map { case (s, _, _) =>
                      rnd(dot(cd.v, s.v) / (cd.nrm * s.nrm))
                    }.max
                    rnd(lambda * cd.rel - (1 - lambda) * maxSim)
                  }
                (cd, score)
              }
              val (win, ws) = scoredStep.minBy { case (cd, sc) =>
                (-sc, cd.d)
              }(Ordering.Tuple2(Ordering.Double.TotalOrdering, idOrd))
              selected :+= ((win, ws, rank))
              remaining = remaining.filterNot(_.d == win.d)
              rank += 1
            }
            selected.map { case (cd, sc, rk) => (q, cd.d, sc, rk) }
          }.sortBy { case (q, _, _, rk) => (q, rk) }(
            Ordering.Tuple2(qOrdOpt.get, Ordering.Int))
          val spark = cands.sparkSession
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(qId,
              cands.schema(qId).dataType),
            org.apache.spark.sql.types.StructField(id, idType),
            org.apache.spark.sql.types.StructField("mmr",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("rank",
              org.apache.spark.sql.types.IntegerType)))
          import scala.jdk.CollectionConverters._
          return spark.createDataFrame(
            out.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3, t._4))
              .asJava, schema)
        }
      }
    }
    def argmax(df: DataFrame, score: Column, rank: Int): DataFrame = {
      val w = Window.partitionBy(col("q")).orderBy(score.desc, col("d"))
      df.withColumn("mmr", score)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("q"), col("d"), col("v"), col("nrm"), col("mmr"),
          lit(rank).as("rank"))
    }
    // each step references `selected` THREE times (anti-join, max-sim
    // join, union) — left as lineage that's ~3^k plan copies by step k
    // (the sf0.001 bench measured 9 s of pure planning at k=5).
    // `selected` is ≤ |queries| rows per step: checkpoint it each
    // iteration so every step optimizes a constant-size plan.
    var selected = argmax(c, round(lit(lambda) * col("rel"), roundTo), 1)
      .localCheckpoint()
    for (i <- 2 to k) {
      val remaining = c.join(selected.select(col("q"), col("d")),
        Seq("q", "d"), "left_anti")
      val maxSim = remaining.join(
          selected.select(col("q"), col("v").as("sv"), col("nrm").as("snrm")),
          "q")
        .select(col("q"), col("d"), col("rel"), col("v"), col("nrm"),
          round(cosineWithNorms(col("v"), col("sv"), col("nrm"), col("snrm")),
            roundTo).as("sim"))
        .groupBy(col("q"), col("d"), col("rel"), col("v"), col("nrm"))
        .agg(max(col("sim")).as("max_sim"))
      selected = selected.unionByName(argmax(maxSim,
        round(lit(lambda) * col("rel") - lit(1 - lambda) * col("max_sim"),
          roundTo), i)).localCheckpoint()
    }
    selected.select(col("q").as(qId), col("d").as(id), col("mmr"), col("rank"))
      .orderBy(col(qId), col("rank"))
  }

  /** Hard-negative mining for contrastive training: for each anchor,
    * the top-k most-similar candidates whose `label` DIFFERS from the
    * anchor's — close in embedding space but provably wrong-class, the
    * negatives that carry gradient. Cosine is rounded to `roundTo`
    * BEFORE ranking (the [[Similarity.topK]] convention) so the rank
    * order is engine-exact under the (sim desc, candidate id) tie
    * break.
    *
    * The anchor batch is the small side: the join streams the corpus
    * past it once (planner broadcasts anchors when stats allow), and
    * `anchorLimit` refuses anchor sets that would turn the ranked scan
    * into a pair explosion — mirroring the exact-arm cap on
    * [[Similarity.topK]]. */
  def hardNegatives(
      anchors: DataFrame, aId: String, aVec: String, aLabel: String,
      candidates: DataFrame, cId: String, cVec: String, cLabel: String,
      k: Int, roundTo: Int = 6, anchorLimit: Long = 4096): DataFrame = {
    val nA = anchors.count()
    require(nA <= anchorLimit,
      s"hardNegatives: $nA anchors exceed the batch cap $anchorLimit — " +
        "mine in anchor batches (each batch is one corpus scan)")
    val a = anchors.select(col(aId).as("a_id"), col(aVec).as("a_vec"),
      col(aLabel).as("a_label")).withColumn("a_nrm", fastNorm(col("a_vec")))
    val c = candidates.select(col(cId).as("c_id"), col(cVec).as("c_vec"),
      col(cLabel).as("c_label")).withColumn("c_nrm", fastNorm(col("c_vec")))
    val sim = round(
      cosineWithNorms(col("a_vec"), col("c_vec"), col("a_nrm"), col("c_nrm")),
      roundTo).as("sim")
    val pairs = a.crossJoin(c)
      .filter(col("c_label") =!= col("a_label"))
      .select(col("a_id"), col("c_id"), col("c_label"), sim)
    val w = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("c_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("a_id"), col("c_id"), col("c_label"), col("sim"), col("rank"))
  }

  /** NDCG@k discount weights on a 1e-9 integer grid — 1/log2(r+1) for
    * ranks 1..k, snapped once on the driver. Exposed so oracle SQL can
    * embed the IDENTICAL integers: log2 is transcendental and engines
    * disagree in the last ulp (measured: DuckDB's log2 differs from
    * ln(x)/ln(2) on 48 of 128 small ints), so shipping the same grid
    * literals to both sides is what makes DCG hash-provable. */
  def ndcgDiscounts(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e9 / (math.log(r + 1.0) / math.log(2.0))))

  /** Prefix sums of [[ndcgDiscounts]] — IDCG@k for a query with n
    * relevant docs is cum(min(n, k)) for BINARY relevance (the ideal
    * list packs relevant docs into the top ranks). */
  def ndcgIdealCums(k: Int): Seq[Long] =
    ndcgDiscounts(k).scanLeft(0L)(_ + _).tail

  /** Per-query ranking-quality report over a retrieval run — the eval
    * step that closes the retrieval loop (BM25/hybrid/ANN runs exist;
    * this scores them against binary qrels the way trec_eval does):
    * NDCG@k, reciprocal rank, precision@k, recall@k.
    *
    * Exactness: DCG terms are [[ndcgDiscounts]] grid integers summed as
    * longs (order-free), IDCG is a driver-side prefix-sum lookup, and
    * every reported ratio is ONE IEEE division of identical integers —
    * no transcendentals at query time, no rounding, so the report
    * hash-proves cross-engine (a round(·,6) here would die on exact
    * .5e-6 ties like recall 1/128).
    *
    * Scale shape: qrels ⋈ run is an equi-join on (query, doc) followed
    * by a per-query aggregate — run is (queries × k) rows by contract,
    * so the report costs one qrels-sized join however large the corpus
    * that produced the run was. Queries present in qrels but missing
    * from the run (or with no relevant hits in the top k) report zeros,
    * not dropped rows.
    *
    * Output: (q, n_rel, n_hits, dcg, idcg, ndcg, rr, precision_k,
    * recall_k), one row per qrels query. */
  def rankingMetrics(run: DataFrame, qCol: String, docCol: String,
      rankCol: String, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "rankingMetrics: k >= 1")
    val discL = ndcgDiscounts(k)
    val cumL = ndcgIdealCums(k)
    val rel = qrels.select(col(qCol), col(docCol)).distinct()
    val nRel = rel.groupBy(col(qCol))
      .agg(count(lit(1)).as("n_rel"))
    val hits = run.filter(col(rankCol) <= k)
      .join(rel, Seq(qCol, docCol))
      .groupBy(col(qCol))
      .agg(count(lit(1)).as("h"),
        min(col(rankCol)).cast("long").as("first_hit"),
        sum(element_at(typedlit(discL), col(rankCol).cast("int")))
          .as("dcg_l"))
    val idcgL = element_at(typedlit(cumL),
      least(col("n_rel"), lit(k.toLong)).cast("int"))
    nRel.join(hits, Seq(qCol), "left")
      .select(col(qCol), col("n_rel"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        (coalesce(col("dcg_l"), lit(0L)).cast("double") / lit(1e9))
          .as("dcg"),
        (idcgL.cast("double") / lit(1e9)).as("idcg"),
        (coalesce(col("dcg_l"), lit(0L)).cast("double") /
          idcgL.cast("double")).as("ndcg"),
        coalesce(lit(1.0) / col("first_hit").cast("double"), lit(0.0))
          .as("rr"),
        (coalesce(col("h"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("precision_k"),
        (coalesce(col("h"), lit(0L)).cast("double") /
          col("n_rel").cast("double")).as("recall_k"))
  }

  /** Positional phrase search: documents containing the EXACT
    * consecutive token sequence `phrase`, with occurrence counts and
    * the first match position — what BM25's bag-of-words scoring
    * ([[bm25TopK]]) structurally cannot express ("new york" vs "york
    * new").
    *
    * One pass, no positional self-joins: tokenize with positions, then
    * a per-document window `lead` pins each phrase term at its exact
    * offset — the k-1 self-joins of the classic positional-index plan
    * collapse into one partition-local window over (doc, pos). At
    * index scale the same predicate runs as a scan over a persisted
    * positional postings table bucketed by doc — either way the match
    * work is linear in tokens, and only (doc_id, counts) leave the
    * scan.
    *
    * Output: (id, n_hits, first_pos) for documents with >= 1 match;
    * positions are 1-based token offsets. */
  /** Boolean retrieval: documents matching ALL `must` terms and NONE
    * of the `mustNot` terms, with per-must-term frequencies — the
    * filter algebra (AND / NOT) that precedes ranked retrieval in
    * every search stack ([[bm25TopK]] ranks what this admits).
    *
    * One tokenize pass collapses to per-doc conditional counts — the
    * set intersections/differences of the classic inverted-index plan
    * become a single partial-aggregatable HAVING, with no per-term
    * join. Output: (id, tf_<term>...) for matching docs. */
  def booleanSearch(docs: DataFrame, id: String, text: String,
      must: Seq[String], mustNot: Seq[String]): DataFrame = {
    require(must.nonEmpty, "booleanSearch: at least one must term")
    val toks = docs.select(col(id),
      explode(split(col(text), " ")).as("term"))
    val aggs = must.map(t =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t")) ++
      mustNot.map(t =>
        sum(when(col("term") === t, 1L).otherwise(0L)).as(s"_not_$t"))
    val counted = toks.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
    val keep = (must.map(t => col(s"tf_$t") > 0L) ++
      mustNot.map(t => col(s"_not_$t") === 0L)).reduce(_ && _)
    counted.filter(keep)
      .select(col(id) +: must.map(t => col(s"tf_$t")): _*)
  }

  def phraseSearch(docs: DataFrame, id: String, text: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.size <= 16,
      "phraseSearch: 1..16 phrase terms")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("pos"))
    val toks = docs
      .select(col(id), posexplode(split(col(text), " ")).as(Seq("pos0", "term")))
      .select(col(id), (col("pos0") + 1).as("pos"), col("term"))
    val matched = phrase.zipWithIndex.map { case (t, i) =>
        (if (i == 0) col("term") else lead(col("term"), i).over(w)) === lit(t)
      }.reduce(_ && _)
    toks.withColumn("m", matched)
      .filter(col("m"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hits"),
        min(col("pos")).cast("long").as("first_pos"))
  }
}
