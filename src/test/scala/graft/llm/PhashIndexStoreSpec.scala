package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persistent banded-Hamming image index must match an all-pairs
  * recompute (banding is recall-exact by pigeonhole), attribute every
  * reject to its smallest indexed neighbor, and converge under
  * replay — the [[MinhashIndexStore]] contract with aHash distance as
  * the resemblance measure. */
class PhashIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def hashesOf(rows: DataFrame): DataFrame =
    Multimodal.imagePhash(spark,
        Multimodal.syntheticGrayMedia(spark, rows, "doc_id", "seed", "pert", 16, 16))
      .toDF().select(col("media_id").as("doc_id"), col("ahash"))

  // corpus: 20 distinct images; batch: 5 exact copies of corpus images
  // (rejected, attributed), one perturbed near-copy, 5 novel images
  private lazy val corpus = hashesOf(
    (0L until 20L).map(i => (i, s"img:$i", false)).toDF("doc_id", "seed", "pert"))
    .localCheckpoint(false)
  private lazy val batch = hashesOf(
    ((100L until 105L).map(i => (i, s"img:${i - 100}", false)) ++
      Seq((110L, "img:6", true)) ++
      (105L until 110L).map(i => (i, s"novel:$i", false)))
      .toDF("doc_id", "seed", "pert")).localCheckpoint(false)

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("ingestWithMatches: all-pairs ground truth, smallest-id attribution, partition property") {
    val root = Files.createTempDirectory("phidx").toString
    val store = new PhashIndexStore(spark, root, "doc_id")
    store.append(corpus)
    val (survivors, matches) = store.ingestWithMatches(batch)
    // ground truth: driver all-pairs hamming vs the corpus
    val corp = corpus.as[(Long, Long)].collect()
    val bat = batch.as[(Long, Long)].collect()
    val want = bat.flatMap { case (id, h) =>
      val ns = corp.filter { case (cid, ch) => cid != id && ham(h, ch) <= 3 }.map(_._1)
      if (ns.isEmpty) None else Some(id -> ns.min)
    }.toMap
    val got = matches.as[(Long, Long)].collect().toMap
    assert(got == want, s"matches $got != ground truth $want")
    // the planted exact copies attribute to their sources; the
    // perturbed near-copy to ITS source
    assert((100L until 105L).forall(i => got.get(i).contains(i - 100)))
    assert(got.get(110L).contains(6L), s"perturbed copy: ${got.get(110L)}")
    // survivors ∪ matches partition the batch
    val s1 = survivors.select("doc_id").as[Long].collect().toSet
    assert(s1 == bat.map(_._1).toSet -- got.keySet)
    assert(s1 == (105L until 110L).toSet)
  }

  test("sequential ticks + replay convergence") {
    val root = Files.createTempDirectory("phidx2").toString
    val store = new PhashIndexStore(spark, root, "doc_id")
    store.append(corpus)
    val s1 = store.ingest(batch).select("doc_id").as[Long].collect().toSet
    val segs = store.segmentCount
    // tick 2 screens against corpus PLUS tick-1 survivors: an exact
    // copy of survivor 105's novel image is rejected, attributed there
    val b2 = hashesOf(Seq((200L, "novel:105", false), (201L, "fresh:201", false))
      .toDF("doc_id", "seed", "pert"))
    val m2 = store.probeMatches(b2).as[(Long, Long)].collect().toMap
    assert(m2 == Map(200L -> 105L),
      s"tick-2 must screen against tick-1 survivors, got $m2")
    assert(store.ingest(b2).select("doc_id").as[Long].collect().toSet == Set(201L))
    // replay tick 1: re-delivered survivors hit their own stored rows
    // only through the id-equality exemption — admitted again, store
    // state unchanged (reconciles by key)
    val n1 = store.sigRows
    val s1again = store.ingest(batch).select("doc_id").as[Long].collect().toSet
    assert(s1again == s1, s"replay must converge: $s1again vs $s1")
    assert(store.sigRows == n1, "replay must not grow the store")
    assert(store.segmentCount <= segs + 4, "fan-in stays bounded by compaction")
  }

  test("empty store admits everything; empty batch probes empty") {
    val root = Files.createTempDirectory("phidx3").toString
    val store = new PhashIndexStore(spark, root, "doc_id")
    assert(store.probe(batch).count() == batch.count())
    store.append(corpus)
    assert(store.probe(batch.limit(0)).isEmpty)
  }

  test("banding parameters are stamped: reopening under different ones refuses, not silently loses recall") {
    val root = Files.createTempDirectory("phidx_sig").toString
    val store = new PhashIndexStore(spark, root, "doc_id", maxHamming = 3, blocks = 6)
    store.append(corpus)
    // same params reopen fine
    assert(new PhashIndexStore(spark, root, "doc_id").probe(batch).count() > 0)
    // different banding: stored and probe-side band keys would stop
    // colliding silently — the stamp refuses instead
    val e = intercept[IllegalArgumentException] {
      new PhashIndexStore(spark, root, "doc_id", maxHamming = 2, blocks = 4)
        .probeMatches(batch).count()
    }
    assert(e.getMessage.contains("parameters"))
  }

  test("expire: stale generation re-admits, live still screens, GC reclaims") {
    val root = Files.createTempDirectory("phidx_exp").toString
    val store = new PhashIndexStore(spark, root, "doc_id")
    val gen1 = hashesOf((0L until 10L).map(i => (i, s"img:$i", false))
      .toDF("doc_id", "seed", "pert")).localCheckpoint(false)
    val gen2 = hashesOf((10L until 20L).map(i => (i, s"img:$i", false))
      .toDF("doc_id", "seed", "pert")).localCheckpoint(false)
    store.append(gen1, adm = 1L)
    store.append(gen2, adm = 2L)
    def copies(src: DataFrame) =
      src.select((col("doc_id") + 9000L).as("doc_id"), col("ahash"))
    assert(store.probe(copies(gen1)).count() == 0)
    assert(store.expire(2L) == 10L)
    // expired near-dups re-admit; the live generation still screens
    assert(store.probe(copies(gen1)).count() == 10)
    assert(store.probe(copies(gen2)).count() == 0)
    assert(store.expire(2L) == 0L, "expire is idempotent")
    // GC: reads unchanged, tombstone fan-in collapses to one segment
    store.gcTombstones()
    assert(store.probe(copies(gen2)).count() == 0)
    assert(store.probe(copies(gen1)).count() == 10)
    assert(store.segmentCount == 1, s"post-GC fan-in ${store.segmentCount}")
    // a re-admitted expired id screens again under its fresh stamp,
    // and the sliding window evicts gen-2 (adm 2) but not it
    store.append(gen1.limit(1), adm = 3L)
    assert(store.probe(copies(gen1.limit(1))).count() == 0)
    assert(store.expire(3L) == 10L)
    assert(store.probe(copies(gen1.limit(1))).count() == 0)
    assert(store.probe(copies(gen2)).count() == 10)
  }
}
