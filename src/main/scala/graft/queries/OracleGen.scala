package graft.queries

/** DuckDB oracle-SQL generators for the iterative trainers.
  *
  * [[graft.operators.Similarity.kMeans]] is deliberately
  * engine-portable (lowest-id init, lower-cell ties, 1e-9-grid integer
  * means — see its scaladoc), so a fixed iteration count unrolls into a
  * plain CTE chain any SQL engine can run: assignment is a
  * ROW_NUMBER-over-distance argmin, the mean is an exact integer sum
  * divided once in double, and an emptied cell keeps its previous
  * centroid via LEFT JOIN + COALESCE. These generators build that chain
  * so the driver's DuckDB gate can hash-check the trainers (q61) and
  * everything layered on them (q72 product quantization, q73 ADC
  * search) instead of falling back to rows-only counts.
  */
object OracleGen {

  /** Strict left-to-right squared-L2 fold over 1-based list columns —
    * DuckDB's list_aggregate('sum') folds in element order, matching the
    * native [[graft.plans.SquaredL2]] loop bit-for-bit. */
  def sqDist(a: String, b: String, dim: Int): String =
    s"list_aggregate(list_transform(range(1, ${dim + 1}), j -> ($a[j]-$b[j])*($a[j]-$b[j])), 'sum')"

  /** The grid mean: round(x·1e9) summed exactly (DuckDB promotes
    * SUM(BIGINT) to HUGEINT — exact), one double division. Mirrors the
    * Spark side's DECIMAL(38,0) accumulation. */
  private val GridMean =
    "CAST(SUM(CAST(round(x * 1000000000.0) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000000.0"

  /** CTE chain for one kMeans(k, iters) training over `input` (must
    * expose columns vec_id, emb). Emits CTEs `${p}c0 .. ${p}c$iters`;
    * the final model lives in `${p}c$iters` as (cell, c_vec). Every CTE
    * fragment ends with a trailing comma so chains concatenate. */
  def kmeansCtes(p: String, input: String, k: Int, iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""${p}c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, emb AS c_vec
      FROM (SELECT vec_id, emb FROM $input ORDER BY vec_id LIMIT $k)),
    """
    for (t <- 1 to iters) {
      sb ++= s"""${p}a$t AS (
      SELECT vec_id, emb, cell FROM (
        SELECT e.vec_id, e.emb, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ${sqDist("e.emb", "c.c_vec", dim)}, c.cell) AS rn
        FROM $input e CROSS JOIN ${p}c${t - 1} c) WHERE rn = 1),
    ${p}m$t AS (
      SELECT cell, pos, $GridMean AS m
      FROM (SELECT cell, unnest(emb) AS x, generate_subscripts(emb, 1) AS pos FROM ${p}a$t)
      GROUP BY cell, pos),
    ${p}n$t AS (SELECT cell, list(m ORDER BY pos) AS c_vec FROM ${p}m$t GROUP BY cell),
    ${p}c$t AS (SELECT c.cell, COALESCE(n.c_vec, c.c_vec) AS c_vec
                FROM ${p}c${t - 1} c LEFT JOIN ${p}n$t n USING (cell)),
    """
    }
    sb.toString
  }

  /** Final assignment of `input` rows against model CTE `model` —
    * (vec_id, emb, cell), ties to the lower cell. */
  def assignCte(name: String, input: String, model: String, dim: Int): String =
    s"""$name AS (
      SELECT vec_id, emb, cell FROM (
        SELECT e.vec_id, e.emb, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ${sqDist("e.emb", "c.c_vec", dim)}, c.cell) AS rn
        FROM $input e CROSS JOIN $model c) WHERE rn = 1),
    """

  /** Full q61 oracle: train kMeans(k, iters) on the embeddings table,
    * output (cell, n_members, dim, centroid) dimension-exploded. */
  def q61Sql(k: Int, iters: Int, dim: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    ${kmeansCtes("", "e", k, iters, dim)}
    ${assignCte("fin", "e", s"c$iters", dim)}
    cnt AS (SELECT cell, COUNT(*) AS n_members FROM fin GROUP BY cell)
    SELECT c.cell, COALESCE(t.n_members, 0) AS n_members,
           CAST(generate_subscripts(c.c_vec, 1) AS INT) AS dim,
           round(unnest(c.c_vec), 9) AS centroid
    FROM c$iters c LEFT JOIN cnt t USING (cell)
    ORDER BY cell, dim"""

  /** CTE chain training all `m` PQ subspace codebooks on `sample` (must
    * expose vec_id, emb of width m·subDim). Emits per-subspace inputs
    * `${p}in0..` and models `${p}s0..${p}s${m-1}`, then a combined
    * `${p}books` CTE (sub, cell, c_vec). */
  def pqBooksCtes(p: String, sample: String, m: Int, subDim: Int, k: Int, iters: Int): String = {
    val sb = new StringBuilder
    for (s <- 0 until m) {
      val lo = s * subDim + 1
      val hi = s * subDim + subDim
      sb ++= s"""${p}in$s AS (SELECT vec_id, emb[$lo:$hi] AS emb FROM $sample),
    """
      sb ++= kmeansCtes(s"${p}s${s}_", s"${p}in$s", k, iters, subDim)
    }
    val union = (0 until m)
      .map(s => s"SELECT $s AS sub, cell, c_vec FROM ${p}s${s}_c$iters")
      .mkString(" UNION ALL ")
    sb ++= s"""${p}books AS ($union),
    """
    sb.toString
  }

  /** PQ encoding of `input` (vec_id, emb) against `${p}books`: per
    * subspace the nearest codebook cell (ties lower), codes in subspace
    * order, recon_err = total squared reconstruction error. Emits
    * `$name` = (vec_id, codes, recon_err). */
  def pqEncodeCte(name: String, p: String, input: String, m: Int, subDim: Int): String =
    s"""${name}_best AS (
      SELECT vec_id, sub, cell, err FROM (
        SELECT v.vec_id, b.sub, b.cell,
               ${sqDist(s"v.emb[(b.sub*$subDim+1):(b.sub*$subDim+$subDim)]", "b.c_vec", subDim)} AS err,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id, b.sub
                 ORDER BY ${sqDist(s"v.emb[(b.sub*$subDim+1):(b.sub*$subDim+$subDim)]", "b.c_vec", subDim)}, b.cell) AS rn
        FROM $input v CROSS JOIN ${p}books b) WHERE rn = 1),
    $name AS (
      SELECT vec_id, list(cell ORDER BY sub) AS codes,
             list_aggregate(list(err ORDER BY sub), 'sum') AS recon_err
      FROM ${name}_best GROUP BY vec_id),
    """
}
