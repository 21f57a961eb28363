package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle hashing for the dedup operators.
  *
  * The declarative form — transform(sequence(...), i ->
  * concat_ws(element_at(split(text), i) ...)) — is quadratic: Catalyst
  * collapses projections and re-inlines split() into every element_at of
  * the lambda, so an m-word document splits m times (O(m²) work), and
  * the whole subtree is further duplicated into filter conditions and
  * both sides of self-joins. This expression does the obvious linear
  * thing once per row: split on spaces, roll an n-word window, xxhash64
  * each shingle (seed 42 — identical to the built-in xxhash64 on the
  * equivalent concat_ws string), and dedupe.
  *
  * Returns array<long> of DISTINCT shingle hashes in first-occurrence
  * order. Row-level interpreted eval (CodegenFallback) — one call per
  * row doing linear work, so codegen doesn't matter here the way it
  * does for per-pair vector math.
  */
case class ShingleHashes(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val m = words.length
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (m >= n) {
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        System.arraycopy(words, i, parts, 0, n)
        val shingle = UTF8String.concatWs(space, parts: _*)
        out.add(XxHash64Function.hash(shingle, StringType, seed))
        i += 1
      }
    }
    // docs shorter than n words yield NO shingles — matching the SQL
    // oracle's range(1, m-1) (empty for m <= 2), not the declarative
    // shinglesFromWords convenience form, which emits one degenerate
    // all-words shingle for such docs
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashes(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }
}
