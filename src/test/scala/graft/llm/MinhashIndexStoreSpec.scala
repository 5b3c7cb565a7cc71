package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persistent LSH index must be SEMANTICALLY IDENTICAL to the
  * recompute form (`Dedup.nearDedupIncremental`) while holding its
  * state across ticks — equality, incrementality, and replay. */
class MinhashIndexStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("probe equals nearDedupIncremental on the same split") {
    val root = Files.createTempDirectory("mhidx").toString
    val store = new MinhashIndexStore(spark, root)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    store.append(corpus, "doc_id", "text")
    val indexed = store.probe(batch, "doc_id", "text", 0.8).select("doc_id")
    val recompute = Dedup.nearDedupIncremental(batch, corpus, "doc_id", "text", 0.8)
      .select("doc_id")
    assertSameRows(indexed, recompute)
  }

  test("two ticks: the second batch screens against corpus PLUS first-tick survivors") {
    val root = Files.createTempDirectory("mhidx2").toString
    val store = new MinhashIndexStore(spark, root)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val b1 = docs.filter(col("doc_id") % 5 === 0)
    val b2 = docs.filter(col("doc_id") % 5 === 1)
    store.append(corpus, "doc_id", "text")
    val s1 = store.ingest(b1, "doc_id", "text", 0.8)
    val s2 = store.probe(b2, "doc_id", "text", 0.8).select("doc_id")
    val grown = corpus.select("doc_id", "text")
      .unionByName(b1.join(s1.select("doc_id"), Seq("doc_id"), "left_semi")
        .select("doc_id", "text"))
    val recompute = Dedup.nearDedupIncremental(b2, grown, "doc_id", "text", 0.8)
      .select("doc_id")
    assertSameRows(s2, recompute)
  }

  test("replaying a batch converges: store state identical, nothing lost") {
    val root = Files.createTempDirectory("mhidx3").toString
    val store = new MinhashIndexStore(spark, root)
    val corpus = docs.filter(col("doc_id") % 7 === 0)
    store.append(corpus, "doc_id", "text")
    val batch = docs.filter(col("doc_id") % 7 === 1)
    val first = store.ingest(batch, "doc_id", "text", 0.8).select("doc_id")
    val stateAfterFirst = canon(store.indexedDocs.get)
    // replay the delivery (the crash-recovery path): survivors admitted
    // by the first tick are now IN the corpus, so any of them with an
    // in-batch near-dup twin reads as a dup this time — the returned
    // list may shrink, but the STORE must not change and no admitted
    // doc may be lost
    store.ingest(batch, "doc_id", "text", 0.8)
    assert(canon(store.indexedDocs.get) == stateAfterFirst)
    val admitted = store.indexedDocs.get.select("doc_id")
    assert(first.join(admitted, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("empty store admits everything; probe of empty batch is empty") {
    val root = Files.createTempDirectory("mhidx4").toString
    val store = new MinhashIndexStore(spark, root)
    val batch = docs.limit(10)
    assert(store.probe(batch, "doc_id", "text").count() == batch.count())
    store.append(batch, "doc_id", "text")
    assert(store.probe(batch.limit(0), "doc_id", "text").count() == 0)
  }

  test("the probe's corpus-sized pass is the narrow signature table, not the text") {
    val root = Files.createTempDirectory("mhidx5").toString
    val store = new MinhashIndexStore(spark, root)
    store.append(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val survivors = store.probe(batch, "doc_id", "text", 0.8)
    survivors.count()
    // the signature table carries exactly (id, band, bandHash) — the
    // probe never widens it with text
    val sigSchema = spark.read.parquet(s"$root/sigs/seg_" +
      new java.io.File(s"$root/sigs").list().filter(_.startsWith("seg_")).head
        .stripPrefix("seg_")).schema
    assert(sigSchema.fieldNames.toSet == Set("doc_id", "band", "bandHash"))
  }
}
