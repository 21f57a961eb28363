package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {

  test("featurize produces stable schema, deterministic features and chunks") {
    val docs = Tables.documents(spark, sf("0.001"))
    val out = Multimodal.featurize(docs, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "meta", "features", "chunk_hashes"))
    val row = out.orderBy("doc_id").head
    assert(row.getSeq[Double](row.fieldIndex("features")).length == 8)
    assert(row.getSeq[String](row.fieldIndex("chunk_hashes")).nonEmpty)
    // determinism: same input -> identical output
    val again = Multimodal.featurize(docs, "doc_id", "text").orderBy("doc_id").head
    assert(again.getSeq[Double](again.fieldIndex("features")) ==
      row.getSeq[Double](row.fieldIndex("features")))
    // payload bytes survive ingestion untouched
    val ing = Multimodal.ingestText(docs, "doc_id", "text")
    val back = ing.select(col("doc_id"), decode(col("payload"), "UTF-8").as("t"))
      .join(docs, "doc_id")
      .filter(col("t") =!= col("text"))
    assert(back.count() == 0)
  }

  test("native functions are callable from plain SQL") {
    graft.plans.VectorExpressions.register(spark)
    graft.plans.TextExpressions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "vec_sq_l2(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l, " +
      "size(shingle_hashes('a b c d', 3)) AS n").head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getInt(2) == 2)
    // extensions class wires the same expressions (applied at session
    // construction in a fresh JVM; here we just exercise the injection)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
