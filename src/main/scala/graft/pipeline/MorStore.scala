package graft.pipeline

import graft.merge.MergeEngine
import graft.schema.TableConfig
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ twin of [[ManifestStore]] (Iceberg's equality-delete /
  * Hudi's MOR table idea in the same minimal manifest-file form): a CDC
  * tick APPENDS its rows as an immutable delta segment — upserts and
  * tombstones alike — and readers reconcile at scan time by taking the
  * newest version of each key. Writes never read data files at all.
  *
  * Why it exists next to the copy-on-write store: [[ManifestStore.upsert]]
  * rewrites the touched partitions' merged slice every tick, so a hot
  * 1-billion-row partition taking 100-row CDC updates pays O(partition)
  * write amplification per tick. Here the tick costs O(batch) bytes —
  * the 100 TB steady-state ingest shape — and the reconcile cost moves
  * to readers, bounded by [[compactPartitions]] (the `mergeBatch`
  * binding auto-compacts any partition whose segment list outgrows
  * `compactSegments` — O(hot partitions), the same amortized-O(batch)
  * argument as `TableStore.append(df, maxChain)`).
  *
  * Layout:
  *   - delta/base segments are immutable dirs `seg_<commit>_<uuid>`; the
  *     commit index in the name is the segment's global SEQUENCE NUMBER;
  *   - every stored row carries `__deleted` (tombstones are rows whose
  *     non-key columns are NULL and `__deleted` is true);
  *   - the manifest maps each partition value to its ORDERED segment
  *     list; commits are staged-write + one atomic rename, so readers
  *     see all-old or all-new — the same crash contract as
  *     [[ManifestStore]] (MorStoreSpec injects the crashes).
  *
  * Reconciliation order: per key, highest `cursorField` wins (CDC
  * restatements beat arrival order — a key's updates may land out of
  * order across micro-batches), sequence number breaks cursor ties
  * (later commit wins), so the reconciled view equals the cursor-latest
  * batch merge regardless of how the feed was split. Guarded-merge
  * variants (M1 `<`/`>=` guards against the CURRENT target row) need
  * the copy-on-write path — a read-side reconcile sees versions, not
  * the merge-time target, and the class refuses configs it cannot honor.
  */
final class MorStore(spark: SparkSession, root: String, val partitionCol: String,
                     cfg: TableConfig,
                     compactSegments: Int = 8,
                     keepManifests: Int = 8,
                     onStage: (String, Double) => Unit = (_, _) => ()) extends MergeSink {
  require(cfg.keys.nonEmpty, s"${cfg.name}: merge-on-read needs key columns")
  require(cfg.guard == graft.schema.MergeGuard.None ||
    cfg.cursorField.exists(c => cfg.guard == graft.schema.MergeGuard.TargetOlder(c) ||
      cfg.guard == graft.schema.MergeGuard.SourceNotOlder(c)),
    s"${cfg.name}: merge-on-read reconciles by (cursor, commit seq) — a guard over " +
      "a non-cursor column compares against the merge-time target row, which only " +
      "the copy-on-write ManifestStore path can see")

  /** The configured reconcile cursor, exposed so maintenance callers
    * ([[JoinView.maintainMulti]]) can ship it on the tombstone side of
    * [[applyDelta]]. */
  def cursorField: Option[String] = cfg.cursorField

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def manDir = new Path(s"$root/_manifests")

  private[graft] val DeletedCol = "__deleted"
  private val SeqCol = "__seq"

  def manifestVersions: Seq[Int] =
    if (!fs.exists(manDir)) Seq.empty
    else fs.listStatus(manDir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("m=")).map(_.stripPrefix("m=").toInt).sorted

  def latestManifestVersion: Option[Int] = manifestVersions.lastOption

  private def enc(v: String): String = java.net.URLEncoder.encode(v, "UTF-8")
  private def dec(v: String): String = java.net.URLDecoder.decode(v, "UTF-8")
  private val NullToken = "__HIVE_DEFAULT_PARTITION__"

  /** value → ordered segment list (commit order). */
  private[graft] def readManifest(n: Int): Map[String, Seq[String]] = {
    val in = fs.open(new Path(manDir, s"m=$n"))
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(v, segs) = line.split("\t", 2)
      dec(v) -> segs.split(",").toSeq
    }.toMap
  }

  // NOTE deliberately no commit(m) = commitAs(m, latestManifestVersion)
  // convenience: re-reading the parent AT PUBLISH TIME guards nothing —
  // a foreign commit landing between a caller's manifest read and its
  // publish would make the stale-derived manifest pass the check and
  // silently drop the foreign segments (the r19 concurrent soak's
  // misplaced-rows failure). Every caller passes the version its
  // manifest map was READ at.

  /** Stage + atomically publish manifest `parent+1`. The publish is
    * CONDITIONAL on `parent` still being the latest at write time:
    * callers that derived `m` from a manifest read pass that read's
    * version, and a concurrent commit landing in between makes THIS
    * commit refuse instead of silently dropping the other writer's
    * segments. On HDFS the rename itself fails on an existing target;
    * RawLocalFileSystem's rename() silently REPLACES one, so the
    * check-then-rename pair runs under a per-root JVM lock — without
    * it two in-process writers can both pass the existence check and
    * the later rename silently swallows the earlier commit (the r19
    * concurrent door×retrain soak caught exactly this: a door delta
    * overwrote a re-encode snapshot's manifest and every pre-existing
    * row kept its stale codes). The lock scopes ONLY the driver-side
    * check+rename — segment writes and manifest serialization stay
    * outside it. */
  private def commitAs(m: Map[String, Seq[String]], parent: Option[Int]): Int = {
    fs.mkdirs(manDir)
    val n = parent.getOrElse(0) + 1
    // staged under a writer-unique name: a concurrent committer's tmp
    // file must never be deleted or reused by this one
    val tmp = new Path(manDir,
      s".tmp_m=${n}_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(m.toSeq.sortBy(_._1)
      .map { case (v, segs) => s"${enc(v)}\t${segs.mkString(",")}" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(manDir, s"m=$n")
    MorStore.publishLock(root).synchronized {
      val latest = latestManifestVersion
      if (latest != parent || fs.exists(dst)) {
        fs.delete(tmp, false)
        throw new java.util.ConcurrentModificationException(
          s"${cfg.name}: manifest advanced from $parent to $latest during commit — " +
            "a concurrent writer's segments would be dropped by publishing over it; " +
            "append paths retry from a fresh manifest, snapshot/compaction keep the " +
            "single-writer discipline and refuse (the staged segment is left " +
            "unreferenced for vacuum)")
      }
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"failed to commit manifest $n of $root")
    }
    n
  }

  private def partitionValues(df: DataFrame): Seq[String] =
    df.select(col(partitionCol).cast("string")).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse(NullToken)).toSeq

  private def valueFilter(values: Seq[String]): Column = {
    val nonNull = values.filterNot(_ == NullToken)
    val base: Column =
      if (nonNull.isEmpty) lit(false)
      else col(partitionCol).cast("string").isin(nonNull: _*)
    if (values.contains(NullToken)) base || col(partitionCol).isNull else base
  }

  private def segSeq(name: String): Int =
    name.stripPrefix("seg_").takeWhile(_ != '_').toInt

  /** Write one segment and return (name, distinct partition values),
    * the values observed as an accumulator DURING the write job — no
    * second execution of the input plan, no read-back scan (a
    * join-view refresh's input is a CDF join; re-executing it per
    * commit was the dominant per-tick fixed cost). */
  private def writeSegmentObserved(df: DataFrame, commitIdx: Int): (String, Seq[String]) = {
    val name = f"seg_$commitIdx%06d_${java.util.UUID.randomUUID().toString.take(8)}"
    val obs = org.apache.spark.sql.Observation()
    df.repartition(col(partitionCol)).sortWithinPartitions(partitionCol)
      // collect_set skips NULL — count them separately so the NULL
      // partition still commits under its token
      .observe(obs, collect_set(col(partitionCol).cast("string")).as("vals"),
        count(when(col(partitionCol).isNull, 1)).as("nulls"))
      .write.parquet(s"$root/$name")
    val row = obs.get
    val vals = row("vals").asInstanceOf[Seq[String]] ++
      (if (row("nulls").asInstanceOf[Long] > 0) Seq(NullToken) else Nil)
    (name, vals)
  }

  /** Append one CDC batch as a delta segment: write-only — no data
    * segment is ever read (MorStoreSpec proves it by breaking them).
    * The batch is pre-deduped to one row per key (cursor-latest) so a
    * segment never carries two versions of a key. */
  def appendDelta(batch: DataFrame): Seq[String] = appendRows(batch, deleted = false)

  /** Append equality-delete tombstones. `keysDf` carries the partition
    * column, the key columns, and (when configured) the cursor column —
    * a tombstone beats exactly the versions its cursor dominates, so a
    * later-cursor re-insert of the key survives it. */
  def delete(keysDf: DataFrame): Seq[String] = {
    // distinct: a store whose partition column is also a key (the
    // MinHash signature table's band) must not select it twice
    val needed = ((partitionCol +: cfg.keys) ++ cfg.cursorField.toSeq).distinct
    val missing = needed.filterNot(keysDf.columns.contains)
    require(missing.isEmpty,
      s"${cfg.name}: delete batch must carry ${needed.mkString(", ")} — missing ${missing.mkString(", ")}")
    appendRows(keysDf.select(needed.map(col): _*), deleted = true)
  }

  private def appendRows(batch: DataFrame, deleted: Boolean): Seq[String] = {
    val cursorOrder = cfg.cursorField.map(c => col(c).desc_nulls_last).toSeq
    val deduped = MergeEngine.latestPerKey(batch, cfg.keys, cursorOrder)
      .withColumn(DeletedCol, lit(deleted))
    commitSegment(deduped)
  }

  /** Refreshed post-images AND equality-delete tombstones in ONE
    * segment under ONE manifest commit — the maintenance-tick shape
    * ([[JoinView.maintainMulti]] folds fact upserts and fact deletes
    * from the same CDF): as two separate commits the tick doubled the
    * manifest churn, spent an extra action probing the delete side for
    * emptiness, and left a window in which the view had refreshed rows
    * but not yet their sibling tombstones (harmless — the fold marker
    * advances after both — but a re-fold on crash replayed it). The
    * delete side carries the partition column, keys, and (when
    * configured) the cursor; an empty side contributes nothing. A key
    * appearing on BOTH sides resolves cursor-first, tombstone-wins at
    * equal cursor — one shared per-key window instead of two. */
  def applyDelta(refresh: DataFrame, deleteKeys: DataFrame): Seq[String] = {
    val needed = ((partitionCol +: cfg.keys) ++ cfg.cursorField.toSeq).distinct
    val missing = needed.filterNot(deleteKeys.columns.contains)
    require(missing.isEmpty,
      s"${cfg.name}: delete side must carry ${needed.mkString(", ")} — missing ${missing.mkString(", ")}")
    val cursorOrder = cfg.cursorField.map(c => col(c).desc_nulls_last).toSeq
    val both = refresh.withColumn(DeletedCol, lit(false))
      .unionByName(
        deleteKeys.select(needed.map(col): _*).withColumn(DeletedCol, lit(true)),
        allowMissingColumns = true)
    commitSegment(MergeEngine.latestPerKey(both, cfg.keys,
      cursorOrder :+ col(DeletedCol).desc))
  }

  /** Full-table REPLACE in one manifest commit: the new manifest
    * references ONLY the snapshot's segment, so every prior segment
    * becomes unreferenced ([[vacuum]] fodder) and the one-rename
    * atomicity still holds — a reader sees wholly-old or wholly-new
    * state, never a mix. This is the partition-RESCHEME primitive:
    * when rows must move partitions (e.g. a format migration), a
    * re-append cannot work — the old partition's copy would keep
    * winning inside its own partition-scoped compaction window — so
    * the whole table swaps at once.
    *
    * SINGLE-WRITER REQUIRED: `df` is typically derived from this
    * store's live state, and the commit references ONLY the snapshot's
    * segment — a delta committed by another writer between the caller's
    * read and this commit would be silently dropped. That is the repo's
    * standard one-writer-per-store discipline; as a guard against
    * accidental violations, the manifest PUBLISH itself is conditional
    * on the version captured at entry ([[commitAs]] — re-verified just
    * before the rename, not only at entry, so a delta landing while the
    * snapshot segment was being written also refuses). The caller-read→
    * entry window remains the caller's contract, and a REFUSED snapshot
    * leaves its already-written segment unreferenced until the next
    * [[vacuum]] reclaims it. */
  def snapshot(df: DataFrame): Seq[String] = snapshotFrom(df, latestManifestVersion)

  /** The guard's test seam: `v0` is the manifest version captured at
    * entry; the conditional commit refuses if the manifest is past it
    * at publish time (the spec passes a stale `v0` to exercise exactly
    * that path). */
  private[graft] def snapshotFrom(df: DataFrame, v0: Option[Int]): Seq[String] = {
    val cursorOrder = cfg.cursorField.map(c => col(c).desc_nulls_last).toSeq
    val deduped = MergeEngine.latestPerKey(df, cfg.keys, cursorOrder)
      .withColumn(DeletedCol, lit(false))
    val idx = v0.getOrElse(0) + 1
    val (seg, affected) = writeSegmentObserved(deduped, idx)
    commitAs(affected.map(v => v -> Seq(seg)).toMap, v0)
    affected
  }

  /** APPEND-type commits retry under optimistic concurrency: unlike
    * [[snapshot]] (whose output is derived from a read of the store —
    * re-publishing over a foreign commit would drop it, so it MUST
    * refuse), a delta segment is a pure function of the caller's batch;
    * losing the conditional publish just means the manifest moved, and
    * re-deriving the merge from the FRESH manifest is exactly correct.
    * This is what lets two writers append concurrently — the concrete
    * case being an ingest door's tick committing while a retrain's
    * migration pass commits moves into the same store (the
    * [[graft.llm.IvfMorIndexStore]] concurrent-retrain protocol). The
    * losing attempt rewrites its segment under the new commit index
    * (the sequence number is part of reconcile order, so reusing the
    * stale-index segment could tie a foreign segment's seq); abandoned
    * segments are vacuum fodder, the standard crash contract. */
  private def commitSegment(deduped: DataFrame): Seq[String] = {
    val maxAttempts = 20
    var attempt = 0
    while (true) {
      // the parent version is captured ONCE, and the manifest map, the
      // segment's sequence number, and the conditional publish all
      // derive from it — the publish refuses iff anything advanced past
      // exactly this read
      val v = latestManifestVersion
      val man = v.map(readManifest).getOrElse(Map.empty)
      val idx = v.getOrElse(0) + 1
      // a crash between write and commit leaves an unreferenced segment
      // for [[vacuum]] — the standard contract
      val (seg, affected) = writeSegmentObserved(deduped, idx)
      try {
        commitAs(man ++ affected.map(v2 => v2 -> (man.getOrElse(v2, Seq.empty) :+ seg)), v)
        return affected
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          // tiny jittered backoff: the contention window is one
          // manifest rename, not a data write
          Thread.sleep(10L + scala.util.Random.nextInt(40))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Per-key winners over the wanted partition values: union the
    * referenced segments (each filtered to the values that list it),
    * keep the newest VERSION per key — cursor first, commit sequence
    * as tiebreak — tombstone winners included. One shuffle on the
    * keys; schema evolution across segments reads missing columns as
    * NULL, the same additive contract as [[ManifestStore]]. */
  private def winners(man: Map[String, Seq[String]]): DataFrame = {
    val bySeg = man.toSeq.flatMap { case (v, segs) => segs.map(_ -> v) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val parts = bySeg.toSeq.sortBy(_._1).map { case (seg, values) =>
      SegmentIO.read(spark, s"$root/$seg").filter(valueFilter(values))
        .withColumn(SeqCol, lit(segSeq(seg)))
    }
    val all = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    val order = cfg.cursorField.map(c => col(c).desc_nulls_last).toSeq :+ col(SeqCol).desc
    MergeEngine.latestPerKey(all, cfg.keys, order)
  }

  /** Scan-time reconcile: [[winners]] minus the tombstoned keys. */
  private def reconcile(man: Map[String, Seq[String]]): DataFrame =
    winners(man).filter(!col(DeletedCol)).drop(SeqCol, DeletedCol)

  /** Reconciled current table state; None before any commit or when the
    * latest manifest is empty. */
  def read: Option[DataFrame] = latestManifestVersion.flatMap { n =>
    val man = readManifest(n)
    if (man.isEmpty) None else Some(reconcile(man))
  }

  /** [[read]] WITH the manifest version the plan was pinned to — the
    * input [[snapshotFrom]] needs to make a read-derived snapshot
    * conditional on ITS OWN read, not on a re-read at snapshot entry:
    * `read → snapshot` has a window in which a concurrent delta commits
    * between the two, the snapshot's entry-time version capture then
    * covers the delta, and the conditional publish PASSES while the
    * materialized rows are winners of the PRE-delta manifest — the
    * delta's rows silently vanish from the reconciled state. Callers
    * that snapshot what they read (gcTombstones across the admission
    * stores) pair this with [[snapshotFrom]] so a racing delta makes
    * the publish refuse loudly instead. */
  private[graft] def readVersioned: Option[(DataFrame, Int)] =
    latestManifestVersion.flatMap { n =>
      val man = readManifest(n)
      if (man.isEmpty) None else Some((reconcile(man), n))
    }

  /** Partition-pruned reconciled read — only the wanted values' segment
    * lists are scanned. */
  def readPartitions(values: Seq[String]): Option[DataFrame] =
    latestManifestVersion.flatMap { n =>
      val full = readManifest(n)
      if (full.isEmpty) None
      else {
        val man = full.view.filterKeys(values.contains).toMap
        if (man.isEmpty) Some(reconcile(full).filter(lit(false)))
        else Some(reconcile(man))
      }
    }

  /** Segments the latest manifest references — the reconcile fan-in of a
    * full read (and the compaction trigger). */
  def liveSegments: Int =
    latestManifestVersion.map(readManifest(_).values.flatten.toSet.size).getOrElse(0)

  /** Materialize the per-key WINNERS into ONE base segment: reads pay
    * the reconcile window until the next deltas arrive, then only over
    * base + fresh deltas. Superseded versions fall out; tombstone
    * winners are RETAINED — under cursor-dominant reconciliation a
    * tombstone must outlive compaction or a late, LOWER-cursor
    * re-insert of the key would silently resurrect it (the classic
    * equality-delete compaction hazard; MorStorePropertySpec's model
    * test is what caught it). A tombstone is reclaimed the normal way:
    * the moment a higher-cursor upsert supersedes it, it loses the
    * next compaction's window. Atomic like every commit; a crash
    * leaves an unreferenced segment for [[vacuum]]. */
  def compact(): Unit = latestManifestVersion.foreach { n =>
    val man = readManifest(n)
    if (man.nonEmpty) {
      val materialized = winners(man).drop(SeqCol)
      val idx = n + 1
      val seg = writeSegmentObserved(materialized, idx)._1
      commitAs(man.keys.map(_ -> Seq(seg)).toMap, Some(n))
    }
  }

  /** PARTITION-SCOPED compaction — the one production runs on a
    * cadence: materialize only `values`' winner slices (superseded
    * versions fall out, tombstones are retained — see [[compact]])
    * and re-point exactly those values, leaving cold partitions'
    * segment lists untouched. Cost is O(hot partitions), never
    * O(table) — a store where one hot partition takes every CDC tick
    * compacts that partition alone. */
  def compactPartitions(values: Seq[String]): Unit = {
    val v = latestManifestVersion
    val man = v.map(readManifest).getOrElse(Map.empty)
    val hot = man.view.filterKeys(values.contains).toMap
    if (hot.isEmpty) return
    val slice = winners(hot).drop(SeqCol)
    val idx = v.getOrElse(0) + 1
    val seg = writeSegmentObserved(slice, idx)._1
    commitAs(man ++ hot.keys.map(_ -> Seq(seg)), v)
  }

  /** Drop segments no kept manifest references and manifests beyond the
    * retention horizon — same crash-safety argument as
    * [[ManifestStore.vacuum]]. Defaults to the store's CONFIGURED
    * retention so an explicit `store.vacuum()` and the automatic
    * [[mergeBatch]] vacuum agree — a lower ad-hoc default would
    * silently shrink the time-travel / join-view fold horizon below
    * what the store was built to keep.
    *
    * CONCURRENT-APPENDER SAFE via the segment's embedded sequence
    * number, no clocks involved: a segment that can still be
    * SUCCESSFULLY published necessarily carries a commit index STRICTLY
    * ABOVE the current latest manifest version (its writer read
    * `latest = idx − 1` and [[commitAs]] refuses the moment anything
    * advances past that read), so vacuum skips every unreferenced
    * `seg_` dir whose index exceeds the latest version — the staged
    * segment of an in-flight appender racing this vacuum. Conversely an
    * unreferenced segment at `idx ≤ latest` is provably abandoned (the
    * manifest advanced past its writer's read, so its publish must
    * refuse) and is reclaimed. A crashed writer's orphan therefore
    * lingers only until the next commit advances the version past it —
    * bounded, and the next [[compactHot]] vacuum sweeps it.
    *
    * Staged manifests (`.tmp_m=<n>_*`) are swept by the same index
    * guard: a live stage's `n` is strictly above the latest version
    * (same parent-read argument), so tmp files at `n ≤ latest` are
    * crash leftovers whose publish could only refuse — without this
    * they accumulated forever (the old commit path swept them per
    * commit; writer-unique staging deletes only its own on refusal). */
  def vacuum(keepManifests: Int = this.keepManifests): Unit = {
    val keep = manifestVersions.takeRight(keepManifests)
    val latest = manifestVersions.lastOption.getOrElse(0)
    val referenced = keep.flatMap(readManifest(_).values.flatten).toSet
    val rootP = new Path(root)
    if (fs.exists(rootP))
      fs.listStatus(rootP).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg_") &&
          !referenced.contains(s.getPath.getName) &&
          segSeq(s.getPath.getName) <= latest)
        .foreach(s => fs.delete(s.getPath, true))
    manifestVersions.dropRight(keepManifests)
      .foreach(v => fs.delete(new Path(manDir, s"m=$v"), false))
    if (fs.exists(manDir))
      fs.listStatus(manDir).toSeq
        .filter { s =>
          val n = s.getPath.getName
          n.startsWith(".tmp_m=") &&
            scala.util.Try(n.stripPrefix(".tmp_m=").takeWhile(_ != '_').toInt)
              .toOption.exists(_ <= latest)
        }
        .foreach(s => fs.delete(s.getPath, false))
  }

  /** The post-commit maintenance cadence every unbounded-tick caller
    * needs: PARTITION-SCOPED compaction of exactly the values whose
    * segment list outgrew `compactSegments` (the manifest already
    * carries per-value fan-in — no data read decides it), then the
    * retention vacuum. O(hot partitions) per call; a call with no hot
    * partition costs two driver-side manifest reads and nothing else.
    * Idempotent and read-equivalent (compaction never changes the
    * reconciled state), so callers may run it at any point of their
    * own commit protocol. */
  def compactHot(): Unit = {
    val man = latestManifestVersion.map(readManifest).getOrElse(Map.empty)
    val hot = man.collect { case (v, segs) if segs.length > compactSegments => v }.toSeq
    // vacuum only when compaction just unreferenced segments: garbage
    // appears exactly when pointers are rewritten, so a quiet tick pays
    // one manifest read here, never an O(segments) root listing.
    // Compaction derives its slice from a manifest read, so a foreign
    // commit racing it makes the conditional publish refuse — and
    // UNLIKE an append, re-publishing the stale slice would drop the
    // foreign segment, so the right move is to SKIP: compaction is
    // read-equivalent maintenance and the next tick's call retries
    // from fresh state.
    if (hot.nonEmpty)
      try { compactPartitions(hot); vacuum(keepManifests) }
      catch { case _: java.util.ConcurrentModificationException => () }
  }

  /** [[MergeSink]] binding: O(batch) append per tick + [[compactHot]] —
    * bounded read amplification AND bounded disk under an unbounded
    * streaming cadence. The append and compaction walls log as SEPARATE
    * `onStage` rows (tagged with a tick counter), so a per-tick spike is
    * attributable to merge vs compaction from the stage log alone — the
    * r16 `stream_cdc_merge_mor` bench question ("is the batch-2 spike
    * the first compaction?") needed exactly this split. */
  private[this] var tickN = -1
  override def mergeBatch(batch: DataFrame, batchCfg: TableConfig): Unit = {
    tickN += 1
    val t0 = System.nanoTime()
    appendDelta(batch)
    val t1 = System.nanoTime()
    onStage(s"mor_append_t$tickN", (t1 - t0) / 1e9)
    compactHot()
    onStage(s"mor_compact_t$tickN", (System.nanoTime() - t1) / 1e9)
  }
}

object MorStore {
  // per-root publish locks: the check+rename pair of the conditional
  // manifest publish must be mutually exclusive WITHIN a JVM because
  // the local filesystem's rename replaces an existing target instead
  // of failing (see commitAs). Keyed by store root so unrelated stores
  // never contend; two HANDLES of one root (a door's and a
  // retrainer's) share the lock, which is the point.
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // private[graft]: the llm admission stores scope their first-open
  // parameter-stamp adoption ([[graft.llm.StoreFormat.ensure]], the IVF
  // stamp state machine) with the same per-root lock — the stamp write
  // is a conditional publish too, and local-FS rename-replace has the
  // identical last-writer-wins hole the r19 soak caught here.
  private[graft] def publishLock(root: String): Object =
    publishLocks.computeIfAbsent(root, _ => new Object)
}
