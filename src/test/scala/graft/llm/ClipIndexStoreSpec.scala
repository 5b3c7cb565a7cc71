package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The persistent frame-hash clip index must reject on the temporal-
  * alignment VOTE (≥ minFrames matches at ONE consistent offset), not
  * on mere hash containment; attribute every reject to its smallest
  * indexed neighbor; converge under replay; and honor the stop-hash df
  * cap — the [[MinhashIndexStore]]/[[PhashIndexStore]] family contract
  * with the (pair, offset) vote as the resemblance measure. Literal
  * frame rows keep the ground truth hand-checkable; the registered
  * `stream_video_clip_index` query ties the store to the real
  * Y4M → videoFramePhash pipeline. */
class ClipIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fr(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("vid_id", "f", "fhash")

  // corpus: video 1 = hashes 100..109 at frames 0..9; video 2 = 200..209
  private def corpus: DataFrame =
    fr((0L until 10L).map(f => (1L, f, 100L + f)) ++
       (0L until 10L).map(f => (2L, f, 200L + f)): _*)

  test("vote semantics: aligned runs reject, sub-threshold and misaligned matches admit") {
    val root = Files.createTempDirectory("clipidx").toString
    val store = new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
      minFrames = 5)
    store.append(corpus)
    val batch = fr(
      // 10: frames 0..7 = video 1's hashes 102..109 → 8 votes at offset 2
      (0L until 8L).map(f => (10L, f, 102L + f)) ++
      // 11: exactly minFrames — 5 votes at offset 5 against video 2
      (0L until 5L).map(f => (11L, f, 205L + f)) ++
      // 12: 4 votes < minFrames → admitted
      (0L until 4L).map(f => (12L, f, 206L + f)) ++
      // 13: FIVE of video 1's hashes but each at a DIFFERENT offset
      // (frame k carries hash 100+2k) — five 1-vote cells, no alignment,
      // ADMITTED: the vote distinguishes clip structure from containment
      (0L until 5L).map(k => (13L, k, 100L + 2 * k)) ++
      (5L until 10L).map(f => (13L, f, 900L + f)) ++
      // 14: novel
      (0L until 5L).map(f => (14L, f, 800L + f)): _*)
    val (survivors, matches) = store.ingestWithMatches(batch)
    val got = matches.as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 11L -> 2L), s"matches $got")
    val s1 = survivors.select("vid_id").distinct().as[Long].collect().toSet
    assert(s1 == Set(12L, 13L, 14L), s"survivors $s1")
    // survivors ∪ matches partition the batch ids
    assert(s1 ++ got.keySet ==
      batch.select("vid_id").distinct().as[Long].collect().toSet)
  }

  test("sequential ticks + replay convergence; same-id re-delivery exempt") {
    val root = Files.createTempDirectory("clipidx2").toString
    val store = new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
      minFrames = 5)
    store.append(corpus)
    val b1 = fr((0L until 10L).map(f => (13L, f, 900L + f)) ++
                (0L until 8L).map(f => (10L, f, 102L + f)): _*)
    val s1 = store.ingest(b1).select("vid_id").distinct()
      .as[Long].collect().toSet
    assert(s1 == Set(13L))
    // tick 2 screens against corpus PLUS tick-1 survivors: a clip of
    // survivor 13's tail (frames 5..9) rejects, attributed to 13
    val b2 = fr((0L until 5L).map(f => (20L, f, 905L + f)) ++
                (0L until 5L).map(f => (21L, f, 700L + f)): _*)
    val m2 = store.probeMatches(b2).as[(Long, Long)].collect().toMap
    assert(m2 == Map(20L -> 13L), s"tick 2 must see tick-1 survivors: $m2")
    assert(store.ingest(b2).select("vid_id").distinct()
      .as[Long].collect().toSet == Set(21L))
    // replay tick 1: 13's frames hit only its own stored rows (the
    // id-equality exemption) — admitted again, store state unchanged
    val n1 = store.frameRows
    val s1again = store.ingest(b1).select("vid_id").distinct()
      .as[Long].collect().toSet
    assert(s1again == s1, s"replay must converge: $s1again vs $s1")
    assert(store.frameRows == n1, "replay must not grow the store")
  }

  test("df cap drops stop-hashes before the join; empty store admits everything") {
    val root = Files.createTempDirectory("clipidx3").toString
    val capped = new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
      minFrames = 5, maxHashDf = 2)
    val probe = fr((0L until 5L).map(f => (30L, f, 300L + f)): _*)
    assert(capped.probe(probe).count() == probe.count(), "empty store admits")
    // hashes 300..304 stored by THREE videos → df 3 > cap → stop-hashes;
    // the probe sees no evidence and admits
    capped.append(fr((3L to 5L).flatMap(id =>
      (0L until 5L).map(f => (id, f, 300L + f))): _*))
    assert(capped.probeMatches(probe).isEmpty,
      "df-capped hashes must not generate candidates")
    // the same state WITHOUT the cap rejects, attributed to the
    // smallest indexed id
    val uncapped = new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
      minFrames = 5)
    val m = uncapped.probeMatches(probe).as[(Long, Long)].collect().toMap
    assert(m == Map(30L -> 3L), m.toString)
  }

  test("bucket count is stamped: reopening under a different fan-out refuses") {
    val root = Files.createTempDirectory("clipidx_fmt").toString
    val store = new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
      minFrames = 5, buckets = 16)
    store.append(corpus)
    // same buckets reopen fine; minFrames/maxHashDf are QUERY-time
    // knobs, not layout — different values must NOT refuse
    assert(new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
      minFrames = 8, maxHashDf = 64).probe(corpus.limit(0)).isEmpty)
    // a different bucket count would mis-partition every later
    // tombstone — the stamp refuses instead
    val e = intercept[IllegalArgumentException] {
      new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
        minFrames = 5, buckets = 32)
        .append(fr((50L, 0L, 999L)))
    }
    assert(e.getMessage.contains("parameters"))
  }

  test("expire: stale video re-admits its clips, live still screens, GC reclaims") {
    val root = Files.createTempDirectory("clipidx_exp").toString
    val store = new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
      minFrames = 5)
    store.append(fr((0L until 10L).map(f => (1L, f, 100L + f)): _*), adm = 1L)
    store.append(fr((0L until 10L).map(f => (2L, f, 200L + f)): _*), adm = 2L)
    val clipOf1 = fr((0L until 8L).map(f => (10L, f, 102L + f)): _*)
    val clipOf2 = fr((0L until 8L).map(f => (11L, f, 202L + f)): _*)
    assert(store.probe(clipOf1).isEmpty && store.probe(clipOf2).isEmpty)
    assert(store.expire(2L) == 1L)
    // the expired video's frame rows are gone: its clip re-admits;
    // the live video still screens; expire is idempotent
    assert(store.probe(clipOf1).count() == clipOf1.count())
    assert(store.probe(clipOf2).isEmpty)
    assert(store.expire(2L) == 0L)
    assert(store.frameRows == 10L, "only video 2's rows remain reconciled")
    store.gcTombstones()
    assert(store.probe(clipOf2).isEmpty && store.probe(clipOf1).count() == 8)
    assert(store.segmentCount == 1, s"post-GC fan-in ${store.segmentCount}")
    // re-admission under a fresh stamp screens again, and the sliding
    // window evicts video 2 (adm 2) but not the adm-3 re-admission
    store.append(fr((0L until 10L).map(f => (1L, f, 100L + f)): _*), adm = 3L)
    assert(store.probe(clipOf1).isEmpty)
    assert(store.expire(3L) == 1L)
    assert(store.probe(clipOf1).isEmpty)
    assert(store.probe(clipOf2).count() == clipOf2.count())
  }
}
