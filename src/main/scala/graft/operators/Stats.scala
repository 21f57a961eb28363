package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-level statistical tests and robust conditioning — the
  * experiment-readout layer a data pipeline runs AFTER the drift
  * monitors flag a change ([[Quality.psiReport]] says "the input
  * moved"; these say "is the move significant, and how do we condition
  * the column"). Same portability discipline as the rest of the tier:
  * contingency/rank statistics accumulate as EXACT integers (longs
  * into DECIMAL(38,0) where products can wrap), cross-row float sums
  * snap to a 1e-9 grid, and the final statistics are plain IEEE
  * divisions / sqrt (both bit-portable) of those exact components, so
  * every report hash-proves against the DuckDB oracle with no
  * tolerance.
  *
  * Scale shape: every test is one or two hash aggregations whose state
  * is bounded by the LEVEL/SPINE cardinality (contingency cells,
  * distinct values), never by the corpus; the only sort is over that
  * bounded spine. Reference behavior: the reference engine publishes
  * latency/quality metrics but ships no significance layer
  * (/root/reference/src/utils.py:61-77 stops at raw rates) — this is
  * the [absent]-tier completion of its metrics story.
  */
object Stats {

  private def dec(c: Column) = c.cast(DecimalType(38, 0))
  /** round(x·1e9) → long: the shared cross-row float-sum grid. */
  private def grid(c: Column) = round(c * lit(1e9)).cast("long")

  /** Pearson chi-square test of independence between two categorical
    * columns — the "did the source mix shift across quality buckets?"
    * readout. One hash aggregation builds the contingency cells
    * (bounded by levels_a × levels_b); marginals come from windows
    * OVER THE CELLS (never a second corpus scan); expected counts are
    * IEEE divisions of exact DECIMAL marginal products (longs would
    * wrap past ~3e9 rows); per-cell contributions (o−e)²/e snap to the
    * 1e-9 grid and sum exactly. Output: one row (n, levels_a,
    * levels_b, dof, chi2). The decision against a chi-square quantile
    * is left to the caller — the quantile depends on the
    * data-dependent dof and is a table lookup, not a portable
    * expression. */
  def chiSquareReport(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.filter(a.isNotNull && b.isNotNull)
      .groupBy(a.as("ca"), b.as("cb")).agg(count(lit(1)).as("o"))
    val wr = Window.partitionBy(col("ca"))
    val wc = Window.partitionBy(col("cb"))
    val wAll = Window.partitionBy()
    val withM = cells
      .withColumn("rm", sum(col("o")).over(wr))
      .withColumn("cm", sum(col("o")).over(wc))
      .withColumn("n", sum(col("o")).over(wAll))
    val e = (dec(col("rm")) * dec(col("cm"))).cast("double") /
      col("n").cast("double")
    val contrib = (col("o").cast("double") - e) *
      (col("o").cast("double") - e) / e
    withM
      .select(col("ca"), col("cb"), col("o"), col("n"),
        grid(contrib).as("g"))
      .agg(
        max(col("n")).as("n"),
        count_distinct(col("ca")).as("levels_a"),
        count_distinct(col("cb")).as("levels_b"),
        ((count_distinct(col("ca")) - 1) *
          (count_distinct(col("cb")) - 1)).as("dof"),
        (sum(dec(col("g"))).cast("double") / lit(1e9)).as("chi2"))
  }

  /** Mann-Whitney U rank-sum test (two-sided, tie-corrected normal
    * approximation) — "are the two slices' value distributions the
    * same?" without assuming normality, the robust sibling of
    * [[welchTReport]]. Rows split on the boolean `inA`; U never ranks
    * individual rows: one hash aggregation collapses the corpus onto
    * the distinct-value spine (nA, nB per value), a window over the
    * spine accumulates below-counts, and 2·U = Σ 2·nA_v·cumB_v +
    * nA_v·nB_v stays an exact DECIMAL integer, as does the tie term
    * Σ t³−t. z = (2U − nA·nB) / (2·√var) is IEEE arithmetic over
    * those exact components (√ is correctly rounded by IEEE-754, so it
    * ports). No continuity correction — matches the large-sample
    * two-sided form. Output: one row (n_a, n_b, u2, z, reject_05);
    * z is null when either side is empty or all values tie. */
  def mannWhitneyReport(df: DataFrame, value: Column, inA: Column): DataFrame = {
    val spine = df.filter(value.isNotNull && inA.isNotNull)
      .groupBy(value.as("v"))
      .agg(
        sum(when(inA, 1L).otherwise(0L)).as("na_v"),
        sum(when(inA, 0L).otherwise(1L)).as("nb_v"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = spine.withColumn("cumb", coalesce(sum(col("nb_v")).over(w), lit(0L)))
    val g = c.agg(
      sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"),
      // every product multiplies as DECIMAL — na_v·cumb of two ~n
      // counts would wrap a long past ~3e9 rows
      sum(lit(2L) * dec(col("na_v")) * dec(col("cumb")) +
        dec(col("na_v")) * dec(col("nb_v"))).as("u2"),
      sum(dec(col("na_v") + col("nb_v")) * dec(col("na_v") + col("nb_v")) *
        dec(col("na_v") + col("nb_v")) -
        dec(col("na_v") + col("nb_v"))).as("ties"))
    val dA = col("n_a").cast("double"); val dB = col("n_b").cast("double")
    val n = col("n_a") + col("n_b")
    val dN = n.cast("double")
    // var(U) = nA·nB/12 · [(n+1) − Σ(t³−t)/(n(n−1))]
    val varU = dA * dB / lit(12.0) *
      ((dN + lit(1.0)) - col("ties").cast("double") / (dN * (dN - lit(1.0))))
    val z = (col("u2").cast("double") - dA * dB) /
      (lit(2.0) * sqrt(nullif(varU, lit(0.0))))
    // u2 reports as DOUBLE (exact until ~2^53 pairs; the correctly-
    // rounded conversion is identical in both engines past that) — a
    // raw DECIMAL(38,0) would hash-compare against whatever precision
    // the oracle engine gives ITS integer sum
    g.select(col("n_a"), col("n_b"), col("u2").cast("double").as("u2"),
      z.as("z"), (abs(z) > lit(1.959963984540054)).as("reject_05"))
  }

  /** Welch's unequal-variance t-test of two slice means — the A/B
    * readout for a continuous metric when the slices differ in size
    * and spread (pooled-variance Student's t silently assumes equal
    * variance; Welch is the default modern recommendation). One
    * conditional-aggregate pass: per side, count, Σv and Σv² on the
    * exact 1e-9 grid (squares multiply as DECIMAL — a long would wrap
    * at |v| ≳ 3); means/variances/t/dof are IEEE expressions over the
    * exactly-represented components, mirrored verbatim in the oracle.
    * dof is Welch–Satterthwaite. reject_05 uses the normal 1.96
    * threshold — the documented large-sample approximation (exact
    * t-quantiles at data-dependent dof are table lookups, not portable
    * expressions). Output: one row (n_a, n_b, mean_a, mean_b, var_a,
    * var_b, t, dof, reject_05); t is null when either side has < 2
    * rows or zero variance. */
  def welchTReport(df: DataFrame, value: Column, inA: Column): DataFrame = {
    val v = grid(value)
    val g = df.filter(value.isNotNull && inA.isNotNull)
      .agg(
        sum(when(inA, 1L).otherwise(0L)).as("n_a"),
        sum(when(inA, 0L).otherwise(1L)).as("n_b"),
        sum(when(inA, dec(v)).otherwise(lit(0).cast(DecimalType(38, 0))))
          .as("sa"),
        sum(when(!inA, dec(v)).otherwise(lit(0).cast(DecimalType(38, 0))))
          .as("sb"),
        sum(when(inA, dec(v) * dec(v)).otherwise(lit(0).cast(DecimalType(38, 0))))
          .as("qa"),
        sum(when(!inA, dec(v) * dec(v)).otherwise(lit(0).cast(DecimalType(38, 0))))
          .as("qb"))
    def meanOf(s: Column, cnt: Column) =
      s.cast("double") / cnt.cast("double") / lit(1e9)
    def varOf(q: Column, s: Column, cnt: Column) = {
      val dn = cnt.cast("double")
      (q.cast("double") - s.cast("double") * s.cast("double") / dn) /
        (dn - lit(1.0)) / lit(1e18)
    }
    val ma = meanOf(col("sa"), col("n_a"))
    val mb = meanOf(col("sb"), col("n_b"))
    val va = varOf(col("qa"), col("sa"), col("n_a"))
    val vb = varOf(col("qb"), col("sb"), col("n_b"))
    val sea = va / col("n_a").cast("double")
    val seb = vb / col("n_b").cast("double")
    val t = (ma - mb) / sqrt(nullif(sea + seb, lit(0.0)))
    val dof = (sea + seb) * (sea + seb) /
      nullif(sea * sea / (col("n_a").cast("double") - lit(1.0)) +
        seb * seb / (col("n_b").cast("double") - lit(1.0)), lit(0.0))
    g.select(col("n_a"), col("n_b"),
      ma.as("mean_a"), mb.as("mean_b"), va.as("var_a"), vb.as("var_b"),
      t.as("t"), dof.as("dof"),
      (abs(t) > lit(1.959963984540054)).as("reject_05"))
  }

  /** Discrete quantiles by explicit order-statistic selection: the
    * value at sorted position max(1, ceil(p·n)) for each p — a
    * SELECTION from actually-present values (never an interpolation
    * for two engines to disagree on). Computed over the
    * DISTINCT-VALUE spine, not per row (the [[Quality.aucReport]]
    * stance): one hash aggregation collapses the corpus onto
    * (value, count), a window over that bounded spine accumulates
    * cumulative counts, and position idx selects min v with cum ≥ idx
    * — the corpus itself never sorts and never moves through a
    * single-partition window. Returns one row with one value-typed
    * column per requested (p, name). */
  def quantilesDisc(df: DataFrame, value: Column,
      ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (p, _) => p > 0 && p <= 1 },
      "quantilesDisc: ps in (0,1]")
    val spine = df.filter(value.isNotNull)
      .groupBy(value.as("_v")).agg(count(lit(1)).as("_c"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = spine
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy()))
    val aggs = ps.map { case (p, name) =>
      min(when(col("_cum") >=
        greatest(lit(1L), ceil(lit(p) * col("_n")).cast("long")), col("_v")))
        .as(name)
    }
    c.agg(aggs.head, aggs.tail: _*)
  }

  /** Winsorize a value column at discrete [pLo, pHi] quantile bounds —
    * the standard heavy-tail conditioning before a mean-based metric
    * or a feature feed (clipping beats dropping: row count and joins
    * survive). Bounds come from [[quantilesDisc]] (exact selection,
    * hash-portable) and broadcast back over the corpus as a scalar
    * cross join; the projection is then shuffle-free. Output: every
    * input row as (id, v, v_clipped, was_clipped) ordered by id. */
  def winsorize(df: DataFrame, id: Column, value: Column,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi, "winsorize: 0 < pLo < pHi < 1")
    val bounds = quantilesDisc(df, value, Seq(pLo -> "_lo", pHi -> "_hi"))
    df.filter(value.isNotNull)
      .select(id.as("id"), value.as("v"))
      .crossJoin(broadcast(bounds))
      .select(col("id"), col("v"),
        greatest(col("_lo"), least(col("_hi"), col("v"))).as("v_clipped"),
        (col("v") < col("_lo") || col("v") > col("_hi")).as("was_clipped"))
      .orderBy(col("id"))
  }

  /** Theil–Sen robust trend over a POINT relation (x, y) — the
    * median-of-pairwise-slopes estimator (breakdown point 29%, vs 0%
    * for least squares: one bad day cannot bend the line), the right
    * trend readout for the daily corpus/quality series the monitor
    * tier emits. The input must already be AGGREGATED to bounded
    * points (daily rollups — the operator's documented contract, like
    * every pairwise-quadratic baseline in this repo: n points cost
    * C(n,2) pair rows, so feed it time buckets, not raw events).
    * Slopes are pure IEEE ratios of input values; the median slope
    * and median intercept (median of y − m·x at the fitted m) are
    * [[quantilesDisc]] selections of actually-computed values.
    * Output: one row (n_points, n_pairs, slope, intercept). */
  def theilSen(points: DataFrame, x: Column, y: Column): DataFrame = {
    val p = points.filter(x.isNotNull && y.isNotNull)
      .select(x.cast("double").as("x"), y.cast("double").as("y"))
    val a = p.select(col("x").as("x1"), col("y").as("y1"))
    val b = p.select(col("x").as("x2"), col("y").as("y2"))
    // the when-guard is semantically a no-op (the join admits only
    // x1 < x2) but REQUIRED under ANSI: fused codegen may evaluate the
    // projected division before the join condition filters the pair,
    // and an unguarded x2−x1 = 0 then throws DIVIDE_BY_ZERO even
    // though the pair never reaches the output
    val slopes = a.join(b, col("x1") < col("x2"))
      .select(when(col("x2") =!= col("x1"),
        (col("y2") - col("y1")) / (col("x2") - col("x1"))).as("slope"))
    val m = quantilesDisc(slopes, col("slope"), Seq(0.5 -> "slope"))
    val resid = p.crossJoin(broadcast(m))
      .select(col("slope"), (col("y") - col("slope") * col("x")).as("r"))
    val b0 = quantilesDisc(resid, col("r"), Seq(0.5 -> "intercept"))
    val counts = p.agg(count(lit(1)).as("n_points"))
      // n(n−1) is even, so the double division is exact; the cast
      // matches the oracle's CAST(... AS BIGINT)
      .withColumn("n_pairs",
        (col("n_points") * (col("n_points") - 1) / lit(2)).cast("long"))
    counts.crossJoin(m).crossJoin(b0)
      .select(col("n_points"), col("n_pairs"), col("slope"),
        col("intercept"))
  }

  /** Split-conformal calibration of a scored binary filter — the
    * distribution-free guarantee layer on top of
    * [[Quality.calibrationReport]]: from a CALIBRATION slice, take the
    * conformal quantile q̂ of the nonconformity |label − score| at
    * level ceil((1−α)(n+1))/n (the finite-sample-correct rank, clamped
    * to n), then report the EVALUATION slice's empirical coverage of
    * {|label − score| ≤ q̂} — by the conformal theorem it lands at
    * ≥ 1−α on exchangeable data regardless of how bad the scores are,
    * so a drop below 1−α is a distribution-shift alarm with a
    * finite-sample footing. q̂ is a discrete selection off the
    * bounded nonconformity spine; coverage is a pure integer ratio.
    * Output: one row (n_calib, n_eval, qhat, coverage). */
  def conformalReport(scored: DataFrame, score: Column, label: Column,
      isCalib: Column, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, "conformalReport: alpha in (0,1)")
    val noncon = abs(label.cast("double") - score)
    val base = scored.filter(score.isNotNull && label.isNotNull)
      .select(noncon.as("nc"), isCalib.as("cal"))
    val spine = base.filter(col("cal"))
      .groupBy(col("nc")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("nc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = spine
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    // the finite-sample conformal rank: ceil((1-α)(n+1)), clamped to n
    val idx = least(col("n"),
      ceil(lit(1.0 - alpha) * (col("n") + 1).cast("double")).cast("long"))
    val q = cum.agg(
      max(col("n")).as("n_calib"),
      min(when(col("cum") >= idx, col("nc"))).as("qhat"))
    base.filter(!col("cal"))
      .crossJoin(broadcast(q))
      .agg(
        max(col("n_calib")).as("n_calib"),
        count(lit(1)).as("n_eval"),
        max(col("qhat")).as("qhat"),
        (sum(when(col("nc") <= col("qhat"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("coverage"))
  }

  /** Difference-in-differences over a (treat × post) 2×2 design — the
    * workhorse causal readout when treatment was NOT randomized but a
    * pre-period exists (feature rollouts, source onboarding): the
    * treated group's pre→post change, net of the control group's
    * change, cancels any time-invariant group difference and any
    * common shock. One conditional-aggregate pass: per-cell counts and
    * outcome sums on the 1e-9 grid as exact decimals; the four means
    * and the DiD are IEEE expressions over those exact components
    * (same recipe as [[welchTReport]]). Null treat/post/outcome rows
    * are excluded. Output: one row (n_<cell>×4, mean_<cell>×4, did);
    * did is null when any cell is empty. */
  def diffInDiff(df: DataFrame, treat: Column, post: Column,
      outcome: Column): DataFrame = {
    val v = grid(outcome)
    def cell(t: Boolean, p: Boolean): Column = {
      val c = (if (t) treat else !treat) && (if (p) post else !post)
      c
    }
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    def s(c: Column) =
      sum(when(c, dec(v)).otherwise(lit(0).cast(DecimalType(38, 0))))
    val g = df.filter(treat.isNotNull && post.isNotNull && outcome.isNotNull)
      .agg(
        cnt(cell(true, false)).as("n_t_pre"),
        cnt(cell(true, true)).as("n_t_post"),
        cnt(cell(false, false)).as("n_c_pre"),
        cnt(cell(false, true)).as("n_c_post"),
        s(cell(true, false)).as("s_t_pre"),
        s(cell(true, true)).as("s_t_post"),
        s(cell(false, false)).as("s_c_pre"),
        s(cell(false, true)).as("s_c_post"))
    def mean(sc: String, n: String) =
      col(sc).cast("double") / nullif(col(n).cast("double"), lit(0.0)) /
        lit(1e9)
    val did = (mean("s_t_post", "n_t_post") - mean("s_t_pre", "n_t_pre")) -
      (mean("s_c_post", "n_c_post") - mean("s_c_pre", "n_c_pre"))
    g.select(
      col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      mean("s_t_pre", "n_t_pre").as("mean_t_pre"),
      mean("s_t_post", "n_t_post").as("mean_t_post"),
      mean("s_c_pre", "n_c_pre").as("mean_c_pre"),
      mean("s_c_post", "n_c_post").as("mean_c_post"),
      did.as("did"))
  }

  /** Inverse-propensity-weighted average treatment effect — the
    * observational-data estimator when a pre-period does NOT exist
    * ([[diffInDiff]]'s sibling): every treated row reweights by 1/e,
    * every control by 1/(1−e), where e is a fitted propensity score
    * (here: any score column in (0,1), e.g.
    * [[TextAnalysis.qualityClassifier]] trained on the treatment
    * label). Scores clamp to [clip, 1−clip] — the standard
    * overlap-violation guard; without it one near-0/1 score dominates
    * the whole estimate. Per-row IPW terms snap to the 1e-9 grid and
    * sum exactly (they are RATIOS, so unlike raw outcomes they do not
    * stay integers); the two weighted means and the ATE are IEEE over
    * exact decimal sums. Output: one row (n, n_treated, mean_ipw_t,
    * mean_ipw_c, ate). */
  def ipwAte(scored: DataFrame, treat: Column, outcome: Column,
      score: Column, clip: Double = 0.01): DataFrame = {
    require(clip > 0 && clip < 0.5, "ipwAte: clip in (0, 0.5)")
    val e = greatest(lit(clip), least(lit(1.0 - clip), score))
    val y = outcome.cast("double")
    val tTerm = grid(y / e)
    val cTerm = grid(y / (lit(1.0) - e))
    val g = scored
      .filter(treat.isNotNull && outcome.isNotNull && score.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(when(treat, 1L).otherwise(0L)).as("n_treated"),
        sum(when(treat, dec(tTerm)).otherwise(lit(0).cast(DecimalType(38, 0))))
          .as("st"),
        sum(when(!treat, dec(cTerm)).otherwise(lit(0).cast(DecimalType(38, 0))))
          .as("sc"))
    // Horvitz-Thompson normalization by the FULL n on both arms
    def m(s: String) =
      col(s).cast("double") / col("n").cast("double") / lit(1e9)
    g.select(col("n"), col("n_treated"),
      m("st").as("mean_ipw_t"), m("sc").as("mean_ipw_c"),
      (m("st") - m("sc")).as("ate"))
  }

  /** Streaming twin of [[conformalReport]] — the conformal coverage
    * monitor as a standing ingest: q̂ freezes ONCE from the
    * calibration slice (a single bounded-spine job at build time,
    * shipped as a driver literal — the frozen-reference stance of
    * [[Quality.psiIngest]]), and each micro-batch appends one
    * (n_eval, qhat, coverage) row, bit-equal to evaluating the batch
    * report against that calibration. Coverage sinking below 1−α is
    * the finite-sample distribution-shift alarm. Exactly-once through
    * the [[Sketches.writeDeltaTo]] delta-partition contract. */
  def conformalIngest(calibration: DataFrame, score: Column, label: Column,
      alpha: Double, reportTable: String, stateTable: String)
      : (DataFrame, Long) => Unit = {
    require(alpha > 0 && alpha < 1, "conformalIngest: alpha in (0,1)")
    val noncon = abs(label.cast("double") - score)
    val spine = calibration.filter(score.isNotNull && label.isNotNull)
      .groupBy(noncon.as("nc")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("nc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = spine
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    val idx = least(col("n"),
      ceil(lit(1.0 - alpha) * (col("n") + 1).cast("double")).cast("long"))
    val qhat: Double = cum
      .agg(min(when(col("cum") >= idx, col("nc"))).as("qhat"))
      .head().getDouble(0)
    (batch: DataFrame, batchId: Long) => if (!batch.isEmpty) {
      Sketches.writeDeltaTo(
        batch.filter(score.isNotNull && label.isNotNull)
          .agg(
            count(lit(1)).as("n_eval"),
            lit(qhat).as("qhat"),
            (sum(when(noncon <= lit(qhat), 1L).otherwise(0L))
              .cast("double") / count(lit(1)).cast("double"))
              .as("coverage")),
        batchId, reportTable, stateTable)
    }
  }

  /** Spearman rank correlation between two BOUNDED-cardinality columns
    * — the monotone-association readout that survives outliers and
    * nonlinearity (Pearson on raw values does neither). Never ranks
    * individual rows: one hash aggregation collapses the corpus onto
    * the |X|×|Y| contingency cells, each marginal's average tied rank
    * comes from a window over its OWN bounded spine, and — the key
    * exactness move — ranks are kept DOUBLED (2·r is an integer even
    * for .5 tied ranks), so every moment Σc·2rx·2ry accumulates as an
    * exact DECIMAL integer; the constant factor cancels in the
    * correlation. rho is IEEE divide/sqrt of those exact components.
    * Contract: feed bounded-cardinality columns (grades, buckets,
    * small integer measures) — the cell table is the state. Output:
    * one row (n, levels_x, levels_y, rho); rho is null when either
    * marginal is constant. */
  def spearmanReport(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(x.as("vx"), y.as("vy")).agg(count(lit(1)).as("c"))
    def marginal(k: String): DataFrame = {
      val m = cells.groupBy(col(k)).agg(sum(col("c")).as("mc"))
      val w = Window.orderBy(col(k))
        .rowsBetween(Window.unboundedPreceding, -1)
      m.withColumn("cumb", coalesce(sum(col("mc")).over(w), lit(0L)))
        // doubled average tied rank: 2·(cumb + (mc+1)/2) stays integer
        .select(col(k), (lit(2L) * col("cumb") + col("mc") + lit(1L))
          .as(s"r2$k"))
    }
    val j = cells
      .join(broadcast(marginal("vx")), "vx")
      .join(broadcast(marginal("vy")), "vy")
    val g = j.agg(
      sum(col("c")).as("n"),
      count_distinct(col("vx")).as("levels_x"),
      count_distinct(col("vy")).as("levels_y"),
      sum(dec(col("c")) * dec(col("r2vx"))).as("sx"),
      sum(dec(col("c")) * dec(col("r2vy"))).as("sy"),
      sum(dec(col("c")) * dec(col("r2vx")) * dec(col("r2vx"))).as("sxx"),
      sum(dec(col("c")) * dec(col("r2vy")) * dec(col("r2vy"))).as("syy"),
      sum(dec(col("c")) * dec(col("r2vx")) * dec(col("r2vy"))).as("sxy"))
    def d(c: Column) = c.cast("double")
    val covN = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val varX = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varY = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    g.select(col("n"), col("levels_x"), col("levels_y"),
      (covN / sqrt(nullif(varX * varY, lit(0.0)))).as("rho"))
  }

  /** Kruskal-Wallis H rank test across k NAMED groups — "do any of
    * these slices draw values from a different distribution?", the
    * k-sample extension of [[mannWhitneyReport]] (running k² pairwise
    * MW tests instead inflates false positives). Same spine stance:
    * per-value per-group counts, doubled average ranks off the bounded
    * value spine, per-group doubled rank sums as exact DECIMAL. The
    * groups are CALLER-SUPPLIED LITERALS so the k per-group H terms
    * (whose magnitudes overflow any integer grid) can sum in a FIXED
    * syntactic order — a float sum over a data-dependent group set
    * would be order-dependent and break cross-engine parity. Includes
    * the tie correction. Output: one row (n, k, dof, h, h_corrected);
    * h_corrected is null when all values tie. */
  def kruskalWallisReport(df: DataFrame, value: Column, group: Column,
      groups: Seq[String]): DataFrame = {
    require(groups.size >= 2 && groups.distinct.size == groups.size,
      "kruskalWallisReport: >= 2 distinct group literals")
    val spineAggs = count(lit(1)).as("cnt") +:
      groups.zipWithIndex.map { case (gn, i) =>
        sum(when(group === gn, 1L).otherwise(0L)).as(s"n$i")
      }
    val spine = df
      .filter(value.isNotNull && group.isin(groups.map(lit): _*))
      .groupBy(value.as("v"))
      .agg(spineAggs.head, spineAggs.tail: _*)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = spine
      .withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cumb") + col("cnt") + lit(1L))
    val gAggs = sum(col("cnt")).as("n") +:
      sum(dec(col("cnt")) * dec(col("cnt")) * dec(col("cnt")) -
        dec(col("cnt"))).as("ties") +:
      groups.indices.flatMap { i => Seq(
        sum(col(s"n$i")).as(s"ng$i"),
        sum(dec(col(s"n$i")) * dec(col("r2"))).as(s"r2g$i"))
      }
    val g = r.agg(gAggs.head, gAggs.tail: _*)
    def d(c: Column) = c.cast("double")
    val dn = d(col("n"))
    // Σ R2_j²/n_j in the FIXED literal order (parity-critical)
    val terms = groups.indices.map { i =>
      d(col(s"r2g$i")) * d(col(s"r2g$i")) / d(col(s"ng$i"))
    }
    val sumTerms = terms.reduceLeft(_ + _)
    // H on doubled ranks: 12/(n(n+1))·Σ(R2/2)²/n_j − 3(n+1)
    val h = lit(3.0) / (dn * (dn + lit(1.0))) * sumTerms -
      lit(3.0) * (dn + lit(1.0))
    val corr = lit(1.0) -
      d(col("ties")) / (dn * dn * dn - dn)
    g.select(col("n"), lit(groups.size).as("k"),
      lit(groups.size - 1L).as("dof"), h.as("h"),
      (h / nullif(corr, lit(0.0))).as("h_corrected"))
  }

  /** One-way ANOVA F across k NAMED groups — the parametric sibling of
    * [[kruskalWallisReport]] for "do the slice MEANS differ?" under a
    * shared-variance assumption ([[welchTReport]] is the k=2 form
    * without it). One conditional-aggregate pass: per-group n, Σv, Σv²
    * on the exact 1e-9 grid as DECIMAL; SSB/SSW are IEEE sums over the
    * FIXED caller-literal group order (the parity stance of
    * kruskalWallisReport). Output: one row (n, k, dof_between,
    * dof_within, ssb, ssw, f); f is null when SSW is 0 or any dof
    * is 0. */
  def anovaFReport(df: DataFrame, value: Column, group: Column,
      groups: Seq[String]): DataFrame = {
    require(groups.size >= 2 && groups.distinct.size == groups.size,
      "anovaFReport: >= 2 distinct group literals")
    val v = grid(value)
    val zero = lit(0).cast(DecimalType(38, 0))
    val aggs = count(lit(1)).as("n") +:
      sum(dec(v)).as("s") +:
      groups.zipWithIndex.flatMap { case (gn, i) => Seq(
        sum(when(group === gn, 1L).otherwise(0L)).as(s"n$i"),
        sum(when(group === gn, dec(v)).otherwise(zero)).as(s"s$i"),
        sum(when(group === gn, dec(v) * dec(v)).otherwise(zero))
          .as(s"q$i"))
      }
    val g = df
      .filter(value.isNotNull && group.isin(groups.map(lit): _*))
      .agg(aggs.head, aggs.tail: _*)
    def d(c: Column) = c.cast("double")
    val grandMean = d(col("s")) / d(col("n")) / lit(1e9)
    val ssbTerms = groups.indices.map { i =>
      val mi = d(col(s"s$i")) / d(col(s"n$i")) / lit(1e9)
      d(col(s"n$i")) * (mi - grandMean) * (mi - grandMean)
    }
    val sswTerms = groups.indices.map { i =>
      (d(col(s"q$i")) -
        d(col(s"s$i")) * d(col(s"s$i")) / d(col(s"n$i"))) / lit(1e18)
    }
    val ssb = ssbTerms.reduceLeft(_ + _)
    val ssw = sswTerms.reduceLeft(_ + _)
    val dofB = lit(groups.size - 1).cast("double")
    val dofW = d(col("n")) - lit(groups.size).cast("double")
    val f = (ssb / dofB) / nullif(ssw / nullif(dofW, lit(0.0)), lit(0.0))
    g.select(col("n"), lit(groups.size).as("k"),
      lit(groups.size - 1L).as("dof_between"),
      (col("n") - lit(groups.size.toLong)).as("dof_within"),
      ssb.as("ssb"), ssw.as("ssw"), f.as("f"))
  }

  /** Deterministic two-sample randomization test of a mean difference
    * — the assumption-free significance readout when neither the
    * normal approximation ([[welchTReport]]) nor rank exchange
    * ([[mannWhitneyReport]]) is wanted: under H0 the A/B labels are
    * exchangeable, so re-drawing them and recomputing the mean gap
    * calibrates the observed gap against its own null. Labels re-draw
    * per (row, rep) from the 52-bit md5 uniform (the
    * [[Quality.bootstrapRatioCi]] urn — engine/partitioning/rerun-
    * identical); a row joins pseudo-A iff u·n < 2^52·nA, an EXACT
    * integer comparison (both sides DECIMAL), so the assignment rate
    * matches the observed nA/n to within 2⁻⁵² with no float bias. The
    * p-value (1 + #{|diff_r| ≥ |diff_obs|})/(reps+1) is a pure integer
    * ratio — bit-portable, finite-sample valid, no distribution table.
    * Per-rep sums accumulate on the exact 1e-9 grid; the corpus is
    * re-spread before the ×reps explosion (AQE coalesces a
    * megabyte-scale stage to one partition, serializing the md5 work).
    * Output: one row (n, n_a, diff_obs, reps, n_extreme, p_value). */
  def permutationTest(df: DataFrame, id: Column, value: Column,
      inA: Column, reps: Int = 99, seed: Long = 0L): DataFrame = {
    require(reps >= 19, "permutationTest: reps >= 19")
    val spark = df.sparkSession
    val v = grid(value)
    val base = df.filter(value.isNotNull && inA.isNotNull)
      .select(id.cast("string").as("_id"), v.as("_v"), inA.as("_a"))
    val zero = lit(0).cast(DecimalType(38, 0))
    val obs = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_a"), dec(col("_v"))).otherwise(zero)).as("sa"),
      sum(dec(col("_v"))).as("s"))
    def meanDiff(sa: Column, na: Column, s: Column, n: Column) = {
      def d(c: Column) = c.cast("double")
      d(sa) / nullif(d(na), lit(0.0)) / lit(1e9) -
        (d(s) - d(sa)) / nullif(d(n) - d(na), lit(0.0)) / lit(1e9)
    }
    val expanded = base
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .crossJoin(broadcast(spark.range(reps.toLong)
        .select(col("id").cast("int").as("rep"))))
      .crossJoin(broadcast(obs))
    val u = conv(substring(md5(concat(col("_id"), lit(":"),
      col("rep").cast("string"), lit(":"), lit(seed.toString))), 1, 13),
      16, 10).cast("long")
    val assign = dec(u) * dec(col("n")) <
      dec(lit(4503599627370496L)) * dec(col("n_a"))
    val perRep = expanded
      .groupBy(col("rep"))
      .agg(
        max(col("n")).as("n"), max(col("n_a")).as("n_a"),
        max(col("s")).as("s"),
        sum(when(assign, dec(col("_v"))).otherwise(zero)).as("sar"),
        sum(when(assign, 1L).otherwise(0L)).as("nar"),
        max(meanDiff(col("sa"), col("n_a"), col("s"), col("n")))
          .as("diff_obs"))
    val diffR = meanDiff(col("sar"), col("nar"), col("s"), col("n"))
    perRep.agg(
      max(col("n")).as("n"), max(col("n_a")).as("n_a"),
      max(col("diff_obs")).as("diff_obs"),
      count(lit(1)).as("reps"),
      sum(when(abs(diffR) >= abs(col("diff_obs")), 1L).otherwise(0L))
        .as("n_extreme"))
      .withColumn("p_value",
        (col("n_extreme") + lit(1L)).cast("double") /
          (col("reps") + lit(1L)).cast("double"))
  }

  /** Per-group randomization p-values — one [[permutationTest]] per
    * key in a SINGLE corpus pass: the battery builder for
    * [[bhFdr]] ("which nations' urgent orders really differ?" asked
    * 25 times needs a multiplicity correction, and that needs all 25
    * p-values). Group statistics (n_g, nA_g, S_g) broadcast back onto
    * the ×reps explosion; each row re-draws its label against ITS
    * group's rate by the same exact-integer comparison; one
    * (group, rep) aggregation and one bounded per-group reduction
    * yield every p-value. Output: one row per group (g, n, n_a,
    * diff_obs, n_extreme, p_value), ordered by g. */
  def groupedPermutationPvalues(df: DataFrame, id: Column, value: Column,
      inA: Column, group: Column, reps: Int = 99, seed: Long = 0L)
      : DataFrame = {
    require(reps >= 19, "groupedPermutationPvalues: reps >= 19")
    val spark = df.sparkSession
    val v = grid(value)
    val base = df
      .filter(value.isNotNull && inA.isNotNull && group.isNotNull)
      .select(group.cast("string").as("g"), id.cast("string").as("_id"),
        v.as("_v"), inA.as("_a"))
    val zero = lit(0).cast(DecimalType(38, 0))
    val obs = base.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_a"), dec(col("_v"))).otherwise(zero)).as("sa"),
      sum(dec(col("_v"))).as("s"))
    def meanDiff(sa: Column, na: Column, s: Column, n: Column) = {
      def d(c: Column) = c.cast("double")
      d(sa) / nullif(d(na), lit(0.0)) / lit(1e9) -
        (d(s) - d(sa)) / nullif(d(n) - d(na), lit(0.0)) / lit(1e9)
    }
    val expanded = base
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .crossJoin(broadcast(spark.range(reps.toLong)
        .select(col("id").cast("int").as("rep"))))
      .join(broadcast(obs), "g")
    val u = conv(substring(md5(concat(col("_id"), lit(":"),
      col("rep").cast("string"), lit(":"), lit(seed.toString))), 1, 13),
      16, 10).cast("long")
    val assign = dec(u) * dec(col("n")) <
      dec(lit(4503599627370496L)) * dec(col("n_a"))
    val perRep = expanded
      .groupBy(col("g"), col("rep"))
      .agg(
        max(col("n")).as("n"), max(col("n_a")).as("n_a"),
        max(col("s")).as("s"),
        sum(when(assign, dec(col("_v"))).otherwise(zero)).as("sar"),
        sum(when(assign, 1L).otherwise(0L)).as("nar"),
        max(meanDiff(col("sa"), col("n_a"), col("s"), col("n")))
          .as("diff_obs"))
    val diffR = meanDiff(col("sar"), col("nar"), col("s"), col("n"))
    perRep.groupBy(col("g")).agg(
      max(col("n")).as("n"), max(col("n_a")).as("n_a"),
      max(col("diff_obs")).as("diff_obs"),
      sum(when(abs(diffR) >= abs(col("diff_obs")), 1L).otherwise(0L))
        .as("n_extreme"))
      .withColumn("p_value",
        (col("n_extreme") + lit(1L)).cast("double") /
          lit((reps + 1).toDouble))
      .orderBy(col("g"))
  }

  /** Benjamini-Hochberg FDR step-up over a BOUNDED battery of
    * p-values — the multiplicity correction that makes a 25-test
    * battery honest (at α=0.05, 25 independent nulls yield ~1.2 fake
    * "discoveries"; BH caps the EXPECTED false-discovery fraction at α
    * while keeping far more power than Bonferroni). Ranks ascend by
    * (p, test_id) — the deterministic tie order; the step-up cutoff
    * k* = max{r : p_(r) ≤ r·α/m} comes from a window over the battery;
    * every test at rank ≤ k* is a discovery (including any whose own p
    * exceeds its threshold — the step-up shape, not a per-row test).
    * All thresholds are IEEE ratios of small exact integers. Input:
    * (test_id, p) one row per test. Output: (test_id, p, rank,
    * bh_threshold, discovery) ordered by rank. */
  def bhFdr(pvals: DataFrame, testId: Column, p: Column,
      alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, "bhFdr: alpha in (0,1)")
    val base = pvals.filter(p.isNotNull)
      .select(testId.cast("string").as("test_id"), p.as("p"))
    val w = Window.orderBy(col("p"), col("test_id"))
    val wAll = Window.partitionBy()
    val ranked = base
      .withColumn("rank", row_number().over(w))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("bh_threshold",
        col("rank").cast("double") * lit(alpha) / col("m").cast("double"))
    val kStar = ranked
      .withColumn("kstar",
        max(when(col("p") <= col("bh_threshold"), col("rank"))
          .otherwise(lit(0))).over(wAll))
    kStar
      .select(col("test_id"), col("p"), col("rank"), col("bh_threshold"),
        (col("rank") <= col("kstar")).as("discovery"))
      .orderBy(col("rank"))
  }

  /** Robust scale: (v − median) / MAD, the outlier-insensitive
    * standardization (z-scores move with the outliers they are meant
    * to flag; median/MAD do not). Median and MAD are both discrete
    * order-statistic selections ([[quantilesDisc]] at 0.5 — MAD over
    * the |v − median| projection), so the whole transform is two
    * bounded sorts plus one shuffle-free projection; the scaled value
    * is pure IEEE (subtract, divide) over selected actual values.
    * Output: (id, v, scaled) ordered by id; scaled is null when MAD
    * is 0 (over half the values tie). */
  def robustScale(df: DataFrame, id: Column, value: Column): DataFrame = {
    val med = quantilesDisc(df, value, Seq(0.5 -> "_med"))
    val withMed = df.filter(value.isNotNull)
      .select(id.as("id"), value.as("v"))
      .crossJoin(broadcast(med))
    val mad = quantilesDisc(withMed, abs(col("v") - col("_med")),
      Seq(0.5 -> "_mad"))
    withMed.crossJoin(broadcast(mad))
      .select(col("id"), col("v"),
        ((col("v") - col("_med")) / nullif(col("_mad"), lit(0.0)))
          .as("scaled"))
      .orderBy(col("id"))
  }

  /** Sequential probability ratio test (Wald SPRT) read at bounded
    * LOOKS — the always-valid monitor for a Bernoulli rate that the
    * fixed-horizon tests (q161/q216) cannot give: peeking at a
    * z-test inflates false positives, while the SPRT's log-likelihood
    * ratio may be checked after EVERY look with the error rates still
    * α/β. Each look aggregates the trials of one period (the caller's
    * `look` column — a day, an ingest batch); cumulative successes/
    * failures come from a prefix window over the BOUNDED look spine,
    * so the corpus contributes one conditional-aggregation pass and
    * nothing per-row ever sorts globally.
    *
    * llr after look t = s_t·ln(p1/p0) + f_t·ln((1−p1)/(1−p0)); accept
    * H1 at llr ≥ ln((1−β)/α), accept H0 at llr ≤ ln(β/(1−α)). The
    * caller passes the two per-trial log terms and the boundary as
    * 1e-9-snapped LITERALS (the cross-engine transcendental stance:
    * constants are computed once and embedded, never re-derived), so
    * the llr is an exact-integer-weighted sum of two literals — the
    * hash proves the decision sequence itself. `decision` reports the
    * FIRST boundary crossing and then latches (the SPRT stops at the
    * crossing; later looks report the stopped state).
    *
    * Output: one row per look (look, n_trials, n_success, cum_trials,
    * cum_success, llr, decision) ordered by look. */
  def sprtLooks(df: DataFrame, look: Column, success: Column,
      lnRatioPos: Double, lnRatioNeg: Double, boundary: Double)
      : DataFrame =
    sprtFromLooks(
      df.filter(look.isNotNull && success.isNotNull)
        .groupBy(look.as("look"))
        .agg(count(lit(1)).as("n_trials"),
          sum(when(success, 1L).otherwise(0L)).as("n_success")),
      lnRatioPos, lnRatioNeg, boundary)

  /** The decision core of [[sprtLooks]] over an ALREADY-AGGREGATED
    * look relation (look, n_trials, n_success) — shared by the batch
    * query and the streaming twin, so streamed == batch is an
    * identity of inputs, not a re-derivation. */
  def sprtFromLooks(perLook: DataFrame,
      lnRatioPos: Double, lnRatioNeg: Double, boundary: Double)
      : DataFrame = {
    require(boundary > 0, "sprtFromLooks: boundary > 0")
    val w = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perLook
      .withColumn("cum_trials", sum(col("n_trials")).over(w))
      .withColumn("cum_success", sum(col("n_success")).over(w))
    def d(c: Column) = c.cast("double")
    val llr = d(col("cum_success")) * lit(lnRatioPos) +
      (d(col("cum_trials")) - d(col("cum_success"))) * lit(lnRatioNeg)
    val state = when(llr >= lit(boundary), lit("accept_h1"))
      .when(llr <= lit(-boundary), lit("accept_h0"))
      .otherwise(lit("continue"))
    val wAll = Window.partitionBy()
    cum
      .withColumn("llr", round(llr, 6))
      .withColumn("_state", state)
      // latch: the SPRT stops at the FIRST boundary crossing — find
      // that look over the bounded spine, then every look at or after
      // it reports the crossing's decision (not its own raw state)
      .withColumn("_fc",
        min(when(col("_state") =!= "continue", col("look"))).over(wAll))
      .withColumn("_fcState",
        min(when(col("look") === col("_fc"), col("_state"))).over(wAll))
      .withColumn("decision",
        when(col("_fc").isNull || col("look") < col("_fc"),
          lit("continue")).otherwise(col("_fcState")))
      .select(col("look"), col("n_trials"), col("n_success"),
        col("cum_trials"), col("cum_success"), col("llr"),
        col("decision"))
      .orderBy(col("look"))
  }

  /** Streaming maintenance for the SPRT monitor: per-batch (look,
    * trials, successes) partial counts land as idempotent delta
    * partitions ([[Sketches.writeDelta]] — replay overwrites, stale
    * batches skip), so a crash between append and checkpoint cannot
    * double-count a batch. Counts are additive and order-free, which
    * is exactly why the SPRT streams: [[sprtMerged]] reads the SAME
    * look relation the one-shot batch run aggregates, and therefore
    * the SAME decision sequence — the always-valid A/B monitor as a
    * standing query instead of a nightly recomputation. */
  def sprtIngest(look: Column, success: Column, prefix: String)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => if (!batch.isEmpty) {
      Sketches.writeDelta(
        batch.filter(look.isNotNull && success.isNotNull)
          .groupBy(look.as("look"))
          .agg(count(lit(1)).as("n_trials"),
            sum(when(success, 1L).otherwise(0L)).as("n_success")),
        batchId, prefix)
    }

  /** [[sprtFromLooks]] over everything [[sprtIngest]] landed. */
  def sprtMerged(spark: org.apache.spark.sql.SparkSession, prefix: String,
      lnRatioPos: Double, lnRatioNeg: Double, boundary: Double)
      : DataFrame =
    sprtFromLooks(
      spark.table(s"${prefix}_deltas")
        .groupBy(col("look"))
        .agg(sum(col("n_trials")).as("n_trials"),
          sum(col("n_success")).as("n_success")),
      lnRatioPos, lnRatioNeg, boundary)

  /** Autocorrelation function of a regularly-indexed count series at
    * lags 0..maxLag — the seasonality detector that tells the
    * forecasters (q241/q242) WHICH period to fit: a spike at lag 7 is
    * the weekly cycle. The series is the per-`period` aggregate of
    * the corpus (one conditional-aggregation pass, bounded spine);
    * consecutive spine rows are indexed by position so every lag is
    * an equi-join of the spine against itself — 15 bounded joins,
    * never a corpus shuffle.
    *
    * Exactness: acf_l = Σ(x_t−x̄)(x_{t+l}−x̄) / Σ(x_t−x̄)² expands to
    * integer sums — Σ x_t·x_{t+l}, the head/tail window sums, Σx,
    * Σx² — accumulated as exact DECIMALs; x̄ and the final ratio are
    * one mirrored IEEE chain, so no float ever sums across rows.
    * Output: (lag, n_pairs, acf) ordered by lag; lag 0 reports 1. */
  def acfReport(df: DataFrame, period: Column, maxLag: Int = 14)
      : DataFrame = {
    require(maxLag >= 1, "acfReport: maxLag >= 1")
    val spine = df.filter(period.isNotNull)
      .groupBy(period.as("p"))
      .agg(count(lit(1)).as("x"))
      .withColumn("t", row_number().over(Window.orderBy(col("p"))))
    val tot = spine.agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"))
    val a = spine.select(col("t").as("ta"), col("x").as("xa"))
    val b = spine.select(col("t").as("tb"), col("x").as("xb"))
    val lags = a.sparkSession.range(0L, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val pairs = a.crossJoin(broadcast(lags))
      .join(b, col("tb") === col("ta") + col("lag"))
    def d(c: Column) = c.cast("double")
    val perLag = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("xa")) * dec(col("xb"))).as("sab"),
        sum(dec(col("xa"))).as("sa"),
        sum(dec(col("xb"))).as("sb"))
      .crossJoin(broadcast(tot))
    val xbar = d(col("sx")) / d(col("n"))
    val denom = d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n"))
    val num = d(col("sab")) - xbar * d(col("sa")) - xbar * d(col("sb")) +
      d(col("n_pairs")) * xbar * xbar
    perLag
      .select(col("lag"), col("n_pairs"),
        round(num / denom, 6).as("acf"))
      .orderBy(col("lag"))
  }
}
