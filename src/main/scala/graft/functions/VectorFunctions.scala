package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns as pure Catalyst
  * higher-order-function expressions — codegen'd, no UDF serde, and
  * therefore usable inside joins/filters that Catalyst can still
  * optimize around (SURVEY.md §2.6 J1, §2.12).
  *
  * The reference's match predicate is `norm(a-b) <= tolerance` over
  * 128-d face encodings (/root/reference/src/prediction_producer.py:317);
  * here the dimension comes from the data (testdata embeddings are 64-d).
  *
  * All folds are strict left-to-right (`aggregate` semantics), matching
  * DuckDB's list_distance / list_inner_product loops, so both engines
  * produce bit-identical doubles given identical (double-cast) inputs.
  */
object VectorFunctions {

  /** Cast a float vector to double exactly (float→double is lossless). */
  def asDoubleVec(c: Column): Column = c.cast("array<double>")

  /** Sum of elementwise products, left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 distance (no sqrt — cheaper for threshold predicates). */
  def squaredL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Euclidean distance. */
  def l2(a: Column, b: Column): Column = sqrt(squaredL2(a, b))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // ---- codegen'd fast path (graft.plans.VectorExpressions) -----------
  // Same fold order and arithmetic as the HOF versions above, but as
  // native expressions inside whole-stage codegen — use these in join
  // hot paths. Requires VectorExpressions.register(spark) once per
  // session (queries in this repo call ensureRegistered).

  def fastDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def fastSquaredL2(a: Column, b: Column): Column = call_function("vec_sq_l2", a, b)

  def fastL2(a: Column, b: Column): Column = sqrt(fastSquaredL2(a, b))

  def fastNorm(a: Column): Column = sqrt(fastDot(a, a))

  /** Cosine from a precomputed-norm pair: dot/(na*nb) — identical
    * arithmetic to [[cosine]] when na/nb are [[fastNorm]] columns. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    fastDot(a, b) / (na * nb)

  // ---- int8 quantization ---------------------------------------------
  // Max-abs symmetric quantization: q_i = round(x_i / (||v||_inf / 127)).
  // Every step is a single IEEE-754 op per element and both Spark and
  // DuckDB round doubles half-away-from-zero, so the DuckDB oracle is
  // bit-exact. At 100 TB this is the storage/IO lever for the similarity
  // family: 8x smaller vectors through every shuffle and broadcast.

  /** Per-vector quantization scale: max |x_i| / 127. */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / 127.0

  /** Quantize to int8 range (surfaced as int for engine portability);
    * an all-zero vector (scale 0) quantizes to zeros. */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0.0)).otherwise(round(x / scale)).cast("int"))

  /** Largest elementwise reconstruction error |x_i - q_i*scale| — by
    * construction <= scale/2. */
  def dequantMaxErr(v: Column, q: Column, scale: Column): Column =
    array_max(zip_with(v, q, (x, qi) => abs(x - qi * scale)))
}
