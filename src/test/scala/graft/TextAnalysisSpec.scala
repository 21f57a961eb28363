package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSuite {

  import spark.implicits._

  private def docs = Tables.documents(spark, sf("0.001"))

  test("PII patterns find and redact planted emails/phones/SSNs") {
    val planted = Seq(
      (1L, "contact me at jane.doe+x@example.org or 555-123-4567 today"),
      (2L, "ssn 123-45-6789 appears once"),
      (3L, "nothing sensitive here at all"))
      .toDF("id", "text")
    val scanned = planted.select(col("id"),
      TextAnalysis.piiHits(col("text")).as("hits"),
      TextAnalysis.piiRedact(col("text")).as("clean"))
    val byId = scanned.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("hits") == 2)
    assert(byId(2L).getAs[Int]("hits") == 1)
    assert(byId(3L).getAs[Int]("hits") == 0)
    assert(byId(1L).getAs[String]("clean") ==
      "contact me at [REDACTED] or [REDACTED] today")
    assert(byId(2L).getAs[String]("clean") == "ssn [REDACTED] appears once")
    assert(byId(3L).getAs[String]("clean") == "nothing sensitive here at all")
    // redacted corpus has zero remaining hits (idempotence of the scrub)
    assert(scanned.filter(TextAnalysis.piiHits(col("clean")) =!= 0).count() == 0)
  }

  test("blocklist pattern respects word boundaries and regex-quotes words") {
    val rows = Seq((1L, "the customers customer custom customer.x"))
      .toDF("id", "text")
    val pat = TextAnalysis.blocklistPattern(Seq("customer", "a.b"))
    val n = rows.select(TextAnalysis.patternCount(col("text"), pat)).head.getInt(0)
    assert(n == 2, "must match 'customer' twice, not 'customers'/'custom'")
    // the quoted dot is literal: "a.b" must not match "axb"
    val n2 = Seq((1L, "axb a.b")).toDF("id", "text")
      .select(TextAnalysis.patternCount(col("text"), pat)).head.getInt(0)
    assert(n2 == 1)
  }

  test("TF-IDF ranks a document's rare term above corpus-common terms") {
    val corpus = (0 until 20).map(i => (i.toLong, "common words everywhere")) :+
      (99L, "common words everywhere plus zyzzyva")
    val out = TextAnalysis.tfIdfTopTerms(corpus.toDF("doc_id", "text"), "doc_id", "text", k = 2)
    val top99 = out.filter(col("doc_id") === 99L).collect()
    assert(top99.map(_.getAs[String]("term")).toSet == Set("plus", "zyzzyva"),
      "the doc-unique terms must out-score terms present in every doc")
    assert(top99.forall(_.getAs[Long]("df") == 1L))
    // every doc gets exactly k rows (corpus has >= k distinct terms)
    assert(out.count() == 42)
  }

  test("hash split is content-determined and roughly proportioned") {
    val out = docs.select(col("doc_id"), col("text"),
      TextAnalysis.hashSplit(docs, "text").as("split"))
    // duplicates land in the same split regardless of doc_id
    val conflicting = out.groupBy(col("text"))
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1)
    assert(conflicting.count() == 0, "same content must always co-split")
    val n = out.count().toDouble
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(frac.getOrElse("train", 0.0) > 0.6, s"train fraction: $frac")
    assert(frac.getOrElse("test", 0.0) > 0.02, s"test fraction: $frac")
    // repartitioning must not change any assignment (pure projection)
    val re = docs.repartition(7)
    val out2 = re.select(col("doc_id"), TextAnalysis.hashSplit(re, "text").as("split"))
    assert(out.select("doc_id", "split").exceptAll(out2).count() == 0)
  }
}
