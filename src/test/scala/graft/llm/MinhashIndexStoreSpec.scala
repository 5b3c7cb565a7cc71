package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persistent LSH index must be SEMANTICALLY IDENTICAL to the
  * recompute form (`Dedup.nearDedupIncremental`) while holding its
  * state across ticks — equality, incrementality, replay convergence,
  * and the O(batch)-per-tick state shape. */
class MinhashIndexStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("probe equals nearDedupIncremental on the same split") {
    val root = Files.createTempDirectory("mhidx").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    store.append(corpus)
    val indexed = store.probe(batch, 0.8).select("doc_id")
    val recompute = Dedup.nearDedupIncremental(batch, corpus, "doc_id", "text", 0.8)
      .select("doc_id")
    assertSameRows(indexed, recompute)
  }

  test("two ticks: the second batch screens against corpus PLUS first-tick survivors") {
    val root = Files.createTempDirectory("mhidx2").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val b1 = docs.filter(col("doc_id") % 5 === 0)
    val b2 = docs.filter(col("doc_id") % 5 === 1)
    store.append(corpus)
    val s1 = store.ingest(b1, 0.8)
    val s2 = store.probe(b2, 0.8).select("doc_id")
    val grown = corpus.select("doc_id", "text")
      .unionByName(b1.join(s1.select("doc_id"), Seq("doc_id"), "left_semi")
        .select("doc_id", "text"))
    val recompute = Dedup.nearDedupIncremental(b2, grown, "doc_id", "text", 0.8)
      .select("doc_id")
    assertSameRows(s2, recompute)
  }

  test("replaying a batch converges: store state identical, nothing lost") {
    val root = Files.createTempDirectory("mhidx3").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 7 === 0)
    store.append(corpus)
    val batch = docs.filter(col("doc_id") % 7 === 1)
    val first = store.ingest(batch, 0.8).select("doc_id")
    val stateAfterFirst = canon(store.indexedDocs.get)
    // replay the delivery (the crash-recovery path): survivors admitted
    // by the first tick are now IN the corpus, so any of them with an
    // in-batch near-dup twin reads as a dup this time — the returned
    // list may shrink, but the STORE must not change and no admitted
    // doc may be lost
    store.ingest(batch, 0.8)
    assert(canon(store.indexedDocs.get) == stateAfterFirst)
    val admitted = store.indexedDocs.get.select("doc_id")
    assert(first.join(admitted, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("empty store admits everything; probe of empty batch is empty") {
    val root = Files.createTempDirectory("mhidx4").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    val batch = docs.limit(10)
    assert(store.probe(batch).count() == batch.count())
    store.append(batch)
    assert(store.probe(batch.limit(0)).count() == 0)
  }

  test("remove: tombstoned docs leave probe visibility; re-admission supersedes") {
    val root = Files.createTempDirectory("mhidx7").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    store.append(corpus)
    // which batch docs are dups of the corpus?
    val dupIds = batch.join(store.probe(batch, 0.8).select("doc_id"),
      Seq("doc_id"), "left_anti").select("doc_id").collect().map(_.getLong(0))
    assume(dupIds.nonEmpty, "fixture must plant corpus near-dups")
    // remove the ENTIRE corpus: every batch doc must now survive
    store.remove(corpus.select("doc_id"))
    assert(store.indexedDocs.get.count() == 0)
    assert(store.probe(batch, 0.8).count() == batch.count())
    // re-admission supersedes the tombstones: dups are dups again
    store.append(corpus)
    val again = batch.join(store.probe(batch, 0.8).select("doc_id"),
      Seq("doc_id"), "left_anti").select("doc_id").collect().map(_.getLong(0))
    assert(again.toSet == dupIds.toSet)
  }

  test("signature parameters are stamped: reopening under different ones refuses") {
    val root = Files.createTempDirectory("mhidx_sig").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    store.append(docs.filter(col("doc_id") % 10 === 1))
    // same params reopen fine
    assert(new MinhashIndexStore(spark, root, "doc_id", "text")
      .probe(docs.filter(col("doc_id") % 10 === 2), 0.8).count() > 0)
    // a probe under a different shingle size would recompute the batch
    // side into a disjoint bandHash space — silent recall loss; refuse
    val e = intercept[IllegalArgumentException] {
      new MinhashIndexStore(spark, root, "doc_id", "text", shingleSize = 5)
        .probeMatches(docs.filter(col("doc_id") % 10 === 2), 0.8).count()
    }
    assert(e.getMessage.contains("parameters"))
  }

  test("expire: stale generation leaves probe visibility, live one still screens, GC reclaims") {
    import spark.implicits._
    val root = Files.createTempDirectory("mhidx_exp").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    val gen1 = docs.filter(col("doc_id") % 10 === 1)
    val gen2 = docs.filter(col("doc_id") % 10 === 6)
    store.append(gen1, adm = 1L)
    store.append(gen2, adm = 2L)
    // probes of exact copies: both generations screen before expiry
    def copyOf(src: org.apache.spark.sql.DataFrame, shift: Long) =
      src.select((col("doc_id") + shift).as("doc_id"), col("text"))
    assert(store.probe(copyOf(gen1, 9000), 0.8).count() == 0)
    assert(store.probe(copyOf(gen2, 9000), 0.8).count() == 0)
    val evicted = store.expire(2L)
    assert(evicted == gen1.count(), s"expire must evict exactly gen-1 ($evicted)")
    // EXPIRED near-dups re-admit (the recall-horizon trade);
    // unexpired still screen; re-running expire is a no-op
    assert(store.probe(copyOf(gen1, 9000), 0.8).count() == gen1.count())
    assert(store.probe(copyOf(gen2, 9000), 0.8).count() == 0)
    assert(store.expire(2L) == 0L)
    // an expired doc re-delivered RE-ADMITS and screens again with a
    // fresh stamp (removal is a horizon, not a ban)
    val one = gen1.limit(1).localCheckpoint(false)
    assert(store.ingest(one, 0.8, adm = 3L).count() == 1)
    assert(store.probe(copyOf(one, 9000), 0.8).count() == 0)
    // the window slides: expire(3) evicts gen-2 (adm 2) but NOT the
    // adm-3 re-admission — the stamp is per-delivery, not per-id-ever
    assert(store.expire(3L) == gen2.count())
    assert(store.probe(copyOf(one, 9000), 0.8).count() == 0)
    assert(store.probe(copyOf(gen2, 9000), 0.8).count() == gen2.count())
    // GC physically reclaims: reads unchanged, each table one segment
    store.gcTombstones()
    assert(store.probe(copyOf(one, 9000), 0.8).count() == 0)
    assert(store.probe(copyOf(gen2, 9000), 0.8).count() == gen2.count())
    assert(store.segmentCounts == ((1, 1)),
      s"post-GC fan-in ${store.segmentCounts} — tombstones must be gone")
    // pre-stamp rows never expire: a store written without stamps
    val legacyRoot = Files.createTempDirectory("mhidx_leg").toString
    val legacy = new MinhashIndexStore(spark, legacyRoot, "doc_id", "text")
    legacy.append(gen1) // adm defaults to 0 — expire(0) finds nothing older
    assert(legacy.expire(0L) == 0L)
  }

  test("admission floor: persisted, monotone, survives expire-to-empty") {
    val root = Files.createTempDirectory("mhidx_floor").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    assert(store.admFloor.isEmpty, "a fresh store has no clock history")
    store.append(docs.filter(col("doc_id") % 10 === 1), adm = 5L)
    assert(store.admFloor.contains(5L))
    // a late lower-stamped append never REGRESSES the floor
    store.append(docs.filter(col("doc_id") % 10 === 6), adm = 3L)
    assert(store.admFloor.contains(5L))
    // evict EVERYTHING: a data-derived max would now be gone, but the
    // persisted floor still remembers how far the clock got — exactly
    // what a re-created checkpoint over an expired-empty store needs
    assert(store.expire(6L) > 0)
    assert(store.indexedDocs.get.count() == 0)
    assert(store.admFloor.contains(5L),
      "an expired-empty store must still remember its clock")
  }

  test("two-thread first-open: exactly one parameter-stamp adoption wins; the loser refuses") {
    // two handles under DIFFERENT signature parameters race first
    // contact with one root: without the per-root lock both pass the
    // missing-stamp check and local-FS rename-replace lets the LAST
    // stamp win silently — two doors then probing under different
    // banding, the silent-recall-loss failure the stamp exists to
    // refuse. Under the lock exactly one adoption wins, and the loser
    // re-reads the winner's stamp and refuses LOUDLY.
    val root = Files.createTempDirectory("mhidx_race").toString
    val slice = docs.filter(col("doc_id") % 10 === 1)
      .select("doc_id", "text").localCheckpoint(false)
    val a = new MinhashIndexStore(spark, root, "doc_id", "text")
    val b = new MinhashIndexStore(spark, root, "doc_id", "text", shingleSize = 5)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(a, b).map { s =>
      new Thread(() => {
        gate.await()
        try s.append(slice) catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join(300000))
    assert(threads.forall(!_.isAlive), "adoption race hung")
    assert(errs.size == 1,
      s"exactly one adoption must win and one refuse; got ${errs.size} failures: $errs")
    assert(errs.peek().getMessage.contains("parameters"),
      s"the loser must refuse on the stamp, not fail incidentally: ${errs.peek()}")
  }

  test("state is O(batch) per tick: a tick's delta bytes don't grow with the corpus") {
    // merge-on-read is the point of the store layout: admitting a small
    // batch after a large corpus must append small deltas, never
    // rewrite corpus-sized state (a copy-on-write table partitioned by
    // band would — every batch touches every band)
    def dirBytes(p: java.io.File): Long =
      if (p.isFile) p.length
      else Option(p.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    val root = Files.createTempDirectory("mhidx5").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    store.append(docs.filter(col("doc_id") % 11 =!= 0))   // large corpus
    val before = dirBytes(new java.io.File(root))
    store.ingest(docs.filter(col("doc_id") % 11 === 0).limit(5), 0.8)
    val delta = dirBytes(new java.io.File(root)) - before
    assert(delta > 0 && delta < before / 4,
      s"tick appended $delta bytes against $before of prior state — not O(batch)")
  }

  test("the probe's corpus-sized pass is the narrow signature table, not the text") {
    val root = Files.createTempDirectory("mhidx6").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    store.append(docs.filter(col("doc_id") % 3 =!= 0))
    store.probe(docs.filter(col("doc_id") % 3 === 0), 0.8).count()
    // the signature table carries exactly (id, band, bandHash) — the
    // probe never widens it with text
    val aFile = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/sigs"))
      .filter(p => p.toString.endsWith(".parquet"))
      .findFirst().get.toString
    val fields = spark.read.parquet(aFile).schema.fieldNames.toSet
    assert(Set("doc_id", "band", "bandHash").subsetOf(fields) &&
      !fields.contains("text"), fields.toString)
  }

  test("partition scheme is versioned on disk: stamped on create, refused on mismatch") {
    // the text-table partition function is part of the on-disk format:
    // a tombstone written under a DIFFERENT scheme than the live row
    // lands in the wrong partition, and a later partition-scoped
    // compaction resurrects the removed text — so an unstamped or
    // differently-stamped store must refuse writes, not corrupt
    val root = Files.createTempDirectory("mhidxfmt").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    store.append(docs.limit(5))
    val marker = java.nio.file.Paths.get(root, "_format")
    assert(java.nio.file.Files.exists(marker), "format stamp must be written on create")
    val stamp = new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
    assert(stamp.contains("xxhash64"), stamp)

    // a store stamped under another scheme refuses (drop hadoop's crc
    // sidecar — this raw overwrite bypasses the checksummed fs)
    val crc = java.nio.file.Paths.get(root, "._format.crc")
    java.nio.file.Files.deleteIfExists(crc)
    java.nio.file.Files.write(marker, "tp=pmod(id,16);v=1".getBytes("UTF-8"))
    val reopened = new MinhashIndexStore(spark, root, "doc_id", "text")
    val e = intercept[IllegalArgumentException](reopened.remove(docs.limit(1).select("doc_id")))
    assert(e.getMessage.contains("partition scheme"))

    // a PRE-versioning store (data, no stamp) also refuses
    java.nio.file.Files.delete(marker)
    val legacy = new MinhashIndexStore(spark, root, "doc_id", "text")
    val e2 = intercept[IllegalStateException](legacy.append(docs.limit(1)))
    assert(e2.getMessage.contains("rebuild"))
  }

  test("migrateFormat: an old-scheme store migrates in place and probes/writes correctly") {
    import graft.pipeline.MorStore
    import graft.schema.TableConfig
    import spark.implicits._
    val root = Files.createTempDirectory("mhidxmig").toString
    val corpus = docs.filter(col("doc_id") % 3 === 0).limit(30)
    val batch = docs.filter(col("doc_id") % 3 === 1).limit(15)
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    store.append(corpus)
    val expected = store.probe(batch).select("doc_id").as[Long].collect().toSet

    // forge the pre-versioning state: every text row re-partitioned
    // under a FOREIGN scheme (one alien partition value), stamp gone
    val raw = new MorStore(spark, s"$root/texts", "__tp",
      TableConfig("mhidx_texts", null, Seq("doc_id")))
    raw.snapshot(raw.read.get.withColumn("__tp", lit(99L)))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(root, "._format.crc"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_format"))

    val legacy = new MinhashIndexStore(spark, root, "doc_id", "text")
    intercept[IllegalStateException](legacy.append(batch.limit(1)))
    legacy.migrateFormat()

    // the stamp is back and every row sits in a CURRENT-scheme partition
    val stamp = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_format")), "UTF-8")
    assert(stamp.contains("xxhash64"))
    assert(raw.read.get.filter(col("__tp") === 99L).count() == 0)
    assert(raw.read.get.count() == 30, "migration must not lose or duplicate texts")

    // probes answer exactly as before; writes land coherently: a
    // remove's tombstone now shares its partition with the live row,
    // so partition-scoped compaction cannot resurrect it
    val migrated = new MinhashIndexStore(spark, root, "doc_id", "text")
    assert(migrated.probe(batch).select("doc_id").as[Long].collect().toSet == expected)
    val victim = corpus.limit(1).select("doc_id").as[Long].head()
    migrated.remove(corpus.limit(1).select("doc_id"))
    assert(!migrated.indexedDocs.get.select("doc_id").as[Long].collect().contains(victim))
  }

  test("probeMatches/ingestWithMatches: rejects attributed to the SMALLEST indexed near-dup; one pass feeds both sides") {
    import spark.implicits._
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    val batch = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    val root = Files.createTempDirectory("mhidx-m").toString
    val store = new MinhashIndexStore(spark, root, "doc_id", "text")
    store.append(corpus)
    val matches = store.probeMatches(batch, 0.8)
    // independent recompute, banding-free: candidates = every
    // shingle-overlapping (batch, corpus) pair (a J >= 0.8 pair always
    // overlaps), verified by exact Jaccard, min corpus id per batch doc
    val bs = batch.select(col("doc_id").as("ida"),
      explode(Dedup.shingles(col("text"))).as("sh"))
    val cs = corpus.select(col("doc_id").as("idb"),
      explode(Dedup.shingles(col("text"))).as("sh"))
    val cand = bs.join(cs, Seq("sh")).select("ida", "idb").distinct()
    val texts = batch.unionByName(corpus)
    val expected = Dedup.jaccardVerify(cand, texts, "doc_id", "text")
      .filter(col("jaccard") >= 0.8)
      .groupBy("ida").agg(min(col("idb")).as("match_id"))
      .select(col("ida").as("doc_id"), col("match_id"))
    assertSameRows(matches, expected)
    assert(matches.count() > 0, "fixture must exercise the reject side")
    // ingestWithMatches: the screen IS the matches' anti-join —
    // matches ∪ survivors partition the batch exactly
    val root2 = Files.createTempDirectory("mhidx-m2").toString
    val store2 = new MinhashIndexStore(spark, root2, "doc_id", "text")
    store2.append(corpus)
    val (survivors, m2) = store2.ingestWithMatches(batch, 0.8)
    assertSameRows(m2, expected)
    val sIds = survivors.select("doc_id").as[Long].collect().toSet
    val mIds = m2.select("doc_id").as[Long].collect().toSet
    val bIds = batch.select("doc_id").as[Long].collect().toSet
    assert((sIds intersect mIds).isEmpty && (sIds union mIds) == bIds,
      "survivors and matches must partition the batch")
    // and the store converges to the unattributed path's state
    val root3 = Files.createTempDirectory("mhidx-m3").toString
    val store3 = new MinhashIndexStore(spark, root3, "doc_id", "text")
    store3.append(corpus)
    store3.ingest(batch, 0.8)
    assertSameRows(store2.indexedDocs.get, store3.indexedDocs.get)
  }
}
