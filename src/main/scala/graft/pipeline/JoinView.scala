package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN view — the missing
  * half of incremental models: [[graft.streaming.StreamOps.maintainRollupCdf]]
  * keeps an AGGREGATE current from a change feed; this keeps
  * `V = fact ⟕ dim₁ ⟕ … ⟕ dimₙ` current when ANY side changes,
  * without ever re-joining the full fact table ([[maintainMulti]];
  * [[maintain]] is the one-dim form). The dbt shape it replaces is the
  * "incremental model joining dims" that silently serves stale dim
  * attributes until the next full refresh — here a dim update
  * propagates to exactly the fact rows that reference it, in the next
  * tick.
  *
  * Delta algebra per tick (classic DBToaster-style view maintenance,
  * restricted to the N:1 mart join with unique dim keys):
  *   - fact inserts/updates (post-images from [[ManifestStore.changes]],
  *     O(changed fact partitions)) re-join against the CURRENT dim and
  *     upsert into the view;
  *   - fact deletes become view tombstones;
  *   - dim changes (inserts/updates/deletes, O(changed dim partitions))
  *     reduce to their key set; fact rows referencing those keys are
  *     re-joined and upserted — a dim DELETE correctly nulls the dim
  *     columns of its referencing rows (left-join semantics). When no
  *     dim key changed, the fact table is NEVER scanned (the steady
  *     state at CDC cadence).
  *
  * The view lives in a [[MorStore]]: refreshed rows are O(batch)
  * appends, fact deletes are equality tombstones, commit-sequence
  * reconciliation makes re-folding the same delta idempotent — which
  * is the crash contract: fold markers (the folded-up-to versions of
  * both stores) advance AFTER the view commits, so a crash between
  * them just re-folds an identical delta next tick.
  *
  * Scale: the dim side of both joins is `broadcast()` (mart dims are
  * broadcast-size by definition — a billion-row "dim" wants the
  * co-partitioned copy-on-write mart instead); the dim-touched fact
  * scan is a broadcast SEMI join over only the changed keys, which the
  * layout layer's Bloom/zone-map skipping prunes further when the fact
  * store carries stats on the dim key.
  */
object JoinView {

  private val StateFile = "_joinview_state"       // legacy fixed-name marker (read-only compat)
  private val MarkerPrefix = "_joinview_state_v=" // versioned markers, atomic-rename committed

  private def markerSeqs(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix).toLong)

  /** (folded fact version, folded dim version); (0, 0) before the
    * first tick — `changes(0, v)` reads as all-inserts, so the
    * bootstrap tick IS a full build through the same code path.
    * Reads the HIGHEST-sequenced marker: a crash after the marker
    * rename but before old-marker cleanup leaves extras behind, never
    * a gap, so there is no window in which the fold state vanishes
    * (the old delete-then-rename of one fixed file had exactly that
    * window — a crash between the two silently re-folded from (0,0),
    * an unbounded full rebuild appended as deltas). */
  def foldedVersions(spark: SparkSession, viewRoot: String): (Int, Int) = {
    val vs = foldedAll(spark, viewRoot, 2)
    (vs(0), vs(1))
  }

  /** General marker read: fact version followed by each dim's version,
    * space-separated — `n` is 1 + dim count; an absent marker reads as
    * all-zeros (fold everything from the beginning). */
  def foldedAll(spark: SparkSession, viewRoot: String, n: Int): Seq[Int] = {
    val dir = new Path(viewRoot)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seqs = markerSeqs(fs, dir)
    val p = if (seqs.nonEmpty) new Path(viewRoot, MarkerPrefix + seqs.max)
            else new Path(viewRoot, StateFile) // pre-versioning layout
    if (!fs.exists(p)) Seq.fill(n)(0)
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val vs = text.trim.split("\\s+").map(_.toInt).toSeq
      require(vs.length == n,
        s"join-view marker of $viewRoot tracks ${vs.length} stores, caller expects $n")
      vs
    }
  }

  private def writeFolded(spark: SparkSession, viewRoot: String, f: Int, d: Int): Unit =
    writeFoldedAll(spark, viewRoot, Seq(f, d))

  private def writeFoldedAll(spark: SparkSession, viewRoot: String, vs: Seq[Int]): Unit = {
    val dir = new Path(viewRoot)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val old = markerSeqs(fs, dir)
    val next = (0L +: old).max + 1
    val tmp = new Path(viewRoot, s".tmp_$StateFile$next")
    val out = fs.create(tmp, true)
    try out.write(vs.mkString(" ").getBytes("UTF-8")) finally out.close()
    // the rename IS the commit; everything after is best-effort cleanup
    if (!fs.rename(tmp, new Path(viewRoot, MarkerPrefix + next)))
      throw new java.io.IOException(s"failed to commit join-view state of $viewRoot")
    old.foreach(v => fs.delete(new Path(viewRoot, MarkerPrefix + v), false))
    fs.delete(new Path(viewRoot, StateFile), false)
  }

  /** Administrative rewind: commit a marker pointing at earlier folded
    * versions so the NEXT [[maintain]] re-folds from there. Safe by the
    * same idempotence contract crash-recovery relies on — re-folding an
    * already-applied delta reconciles to the same view. */
  def rewind(spark: SparkSession, viewRoot: String, f: Int, d: Int): Unit =
    writeFolded(spark, viewRoot, f, d)

  /** Streaming binding — the view maintained AT CADENCE: drain the CDC
    * feed, upsert each micro-batch into the fact store, then fold one
    * [[maintain]] tick. Effectively-once composes from the parts:
    * the checkpoint serializes delivery, the fact upsert is the
    * idempotent keyed merge, and a crash between the fact commit and
    * the view's fold-marker advance just re-folds an identical delta
    * next tick (JoinViewSpec injects exactly that crash). Dim changes
    * committed between batches are picked up by the next tick — the
    * dim side needs no stream of its own. */
  def maintainStreaming(spark: SparkSession, stream: DataFrame, viewRoot: String,
                        view: MorStore, fact: ManifestStore, factCfg: graft.schema.TableConfig,
                        dim: ManifestStore, factKeys: Seq[String], dimKey: String,
                        checkpoint: String,
                        onStage: (String, Double) => Unit = (_, _) => ()): Unit =
    maintainStreamingMulti(spark, stream, viewRoot, view, fact, factCfg,
      Seq((dim, dimKey)), factKeys, checkpoint, onStage)

  /** [[maintainStreaming]] over the multi-dim view — the same drain
    * (checkpointed delivery, idempotent fact upsert, one fold per
    * micro-batch); changes to ANY dim committed between batches are
    * picked up by the next tick without a stream of their own. */
  def maintainStreamingMulti(spark: SparkSession, stream: DataFrame, viewRoot: String,
                             view: MorStore, fact: ManifestStore,
                             factCfg: graft.schema.TableConfig,
                             dims: Seq[(ManifestStore, String)], factKeys: Seq[String],
                             checkpoint: String,
                             onStage: (String, Double) => Unit = (_, _) => ()): Unit = {
    val q = stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t0 = System.nanoTime()
        graft.streaming.StreamOps.tickConf(batch.sparkSession) {
          // an empty delivery still ticks (dim changes between batches
          // propagate) but commits no empty fact version
          if (!batch.isEmpty) fact.upsert(batch, factCfg)
          maintainMulti(spark, viewRoot, view, fact, dims, factKeys)
        }
        onStage(s"batch$batchId", (System.nanoTime() - t0) / 1e9)
      }
      .start()
    q.awaitTermination()
  }

  /** One maintenance tick: fold everything committed to `fact` and
    * `dim` since the last tick into `view`. `factKeys` is the view's
    * row identity; `dimKey` the N:1 join key (present in both sides,
    * unique in `dim`); non-key dim columns must be disjoint from fact
    * columns. Returns the folded-up-to (factV, dimV). */
  def maintain(spark: SparkSession, viewRoot: String, view: MorStore,
               fact: ManifestStore, dim: ManifestStore,
               factKeys: Seq[String], dimKey: String): (Int, Int) = {
    val vs = maintainMulti(spark, viewRoot, view, fact, Seq((dim, dimKey)), factKeys)
    (vs(0), vs(1))
  }

  /** The general form — `V = fact ⟕ dim₁ ⟕ … ⟕ dimₙ`, the real-mart
    * shape (an order mart joins customer AND priority AND date dims;
    * maintaining each pairwise view separately would re-materialize the
    * fact n times). Same delta algebra per tick, per side:
    *
    *   - fact post-images re-join against ALL current dims;
    *   - EACH dim's changed-key set (independently CDF-scoped) selects
    *     its referencing fact slice via the broadcast semi probe; the
    *     union of all touched slices re-joins ONCE against all dims —
    *     a row whose two dims both changed is refreshed once, not
    *     twice ([[graft.merge.MergeEngine.latestPerKey]] dedup);
    *   - a tick where NO store changed reads nothing.
    *
    * `dims` is (store, N:1 join key in fact) per dim; all dims'
    * non-key columns must be disjoint from the fact AND each other.
    * Returns the folded-up-to versions, fact first then dims in
    * order (the fold-marker layout — the 1-dim marker is the n=1
    * special case, so existing views upgrade in place). */
  def maintainMulti(spark: SparkSession, viewRoot: String, view: MorStore,
                    fact: ManifestStore, dims: Seq[(ManifestStore, String)],
                    factKeys: Seq[String]): Seq[Int] = {
    require(dims.nonEmpty, "a join view needs at least one dim")
    val prev = foldedAll(spark, viewRoot, 1 + dims.size)
    val f0 = prev.head; val d0s = prev.tail
    val f1 = fact.latestManifestVersion.getOrElse(0)
    val d1s = dims.map(_._1.latestManifestVersion.getOrElse(0))
    if (f0 == f1 && d0s == d1s) return f1 +: d1s

    val dimNows = dims.map { case (st, key) =>
      (st.read.getOrElse(throw new IllegalStateException(
        "join view needs a committed dim table")), key)
    }
    // ONE fact frame per tick: every consumer (the disjointness check's
    // schema, each dim's semi probe) shares it instead of re-resolving
    // the manifest into a fresh segment union
    val factNow = fact.read
    val factCols = factNow.map(_.columns.toSet).getOrElse(Set.empty)
    dimNows.zipWithIndex.foreach { case ((dimNow, key), i) =>
      val others = factCols ++ dimNows.take(i)
        .flatMap { case (d, k) => d.columns.toSet - k }
      val overlap = (dimNow.columns.toSet - key).intersect(others)
      require(overlap.isEmpty,
        s"non-key dim columns must be disjoint across fact and dims, clashing: ${overlap.mkString(", ")}")
    }

    // fact-side delta: post-images refresh, deletes tombstone. The
    // manifest-level changedValues pre-check is what keeps EMPTY
    // commits harmless: a tick whose batch had zero rows still bumps
    // the version, and diffing two empty manifests has no schema to
    // resolve — skip straight to marker advance instead.
    // CACHED for the tick: the CDF (a full-outer join over the changed
    // partitions) feeds the refresh write, the delete-emptiness probe,
    // and the delete write — uncached it re-executed per action, and
    // that re-execution was the tick's dominant fixed cost
    val fcdf =
      if (f0 == f1 || fact.changedValues(f0, f1).isEmpty) None
      else Some(fact.changes(f0, f1, factKeys).cache())
    val fUpserts = fcdf.map(_.filter(col("_change") =!= "delete").drop("_change"))
    val fDeletes = fcdf.map(_.filter(col("_change") === "delete").drop("_change"))

    // dim-side deltas: each dim's steady-state skip is decided from its
    // MANIFEST diff alone (no data read); when dim partitions did
    // change, the changed-key set stays a DISTRIBUTED frame and the
    // fact scan is a broadcast LEFT SEMI join over it — a dim
    // mass-update (every key changed, the nightly snapshot-refresh
    // case) is then one fact scan against a broadcast hash set, never
    // a driver-collected `isin` literal list
    val dimTouched = dims.zip(d0s.zip(d1s)).flatMap { case ((st, key), (d0, d1)) =>
      if (d0 == d1 || st.changedValues(d0, d1).isEmpty) None
      else {
        // EXACT changed keys, not a rewritten-partition superset: a
        // hash-spread 0.1% dim update touches every partition, and a
        // superset would then probe-select the ENTIRE fact — the
        // row-diff join over the (broadcast-size) dim slices is the
        // cheap side of that trade
        val changedKeys = st.changedKeys(d0, d1, Seq(key))
        factNow.map(dimTouchedFact(_, changedKeys, key))
      }
    }

    val refresh = (fUpserts.toSeq ++ dimTouched)
      // a row can arrive via several paths (restated fact whose dims
      // also changed) — every copy is the same post-image, keep one
      .reduceOption(_.unionByName(_))
      .map(u => graft.merge.MergeEngine.latestPerKey(u, factKeys, Seq.empty))
    refresh.foreach { r =>
      val joined = dimNows.foldLeft(r) { case (acc, (dimNow, key)) =>
        acc.join(broadcast(dimNow), Seq(key), "left")
      }
      // refresh rows and fact-delete tombstones land as ONE segment
      // under ONE manifest commit (fDeletes ⇒ fcdf ⇒ refresh is
      // defined, so the combined path covers every delete-bearing
      // tick); an empty delete side contributes nothing — no
      // emptiness probe, no second commit
      fDeletes match {
        case Some(dels) =>
          // the tombstone side must carry the view's cursor when the
          // store reconciles by one (applyDelta requires it): the fact
          // CDF pre-image carries every fact column, so select it
          // through. A missing cursor FAILS the tick (see
          // [[tombstoneCols]]) rather than silently dropping the delete.
          val delCols = tombstoneCols(view.partitionCol, factKeys,
            view.cursorField, dels.columns.toSet)
          view.applyDelta(joined, dels.select(delCols.map(col): _*))
        case None => view.appendDelta(joined)
      }
    }
    fcdf.foreach(_.unpersist())
    // the view store's maintenance cadence: a tick appends one delta
    // segment, so WITHOUT compaction a long-running view's hot
    // partitions accumulate unbounded read fan-in (the r14 100-tick
    // soak is what this bounds). Hot-partition-scoped + idempotent, so
    // a crash anywhere around it re-folds safely next tick.
    if (refresh.nonEmpty) view.compactHot()
    writeFoldedAll(spark, viewRoot, f1 +: d1s)
    f1 +: d1s
  }

  /** Columns a fact-delete tombstone must ship to the view store,
    * REQUIRING every one of them present on the delete side. Under
    * desc_nulls_last a NULL-cursor tombstone loses to any live
    * cursored view row — the delete would silently never land, a
    * ghost row in a view whose headline contract is exactness — so a
    * fact CDF that lacks the cursor fails the tick loudly instead of
    * substituting NULL. */
  private[graft] def tombstoneCols(partitionCol: String, factKeys: Seq[String],
                                   cursorField: Option[String],
                                   available: Set[String]): Seq[String] = {
    val delCols = ((partitionCol +: factKeys) ++ cursorField).distinct
    val missing = delCols.filterNot(available.contains)
    require(missing.isEmpty,
      s"fact CDF delete side lacks column(s) ${missing.mkString(", ")} " +
        "required to order tombstones against live view rows; " +
        "refusing the tick rather than silently dropping the delete")
    delCols
  }

  /** The dim-touched fact slice: fact rows referencing a changed dim
    * key, as a broadcast semi-join (PlanSpec asserts the shape —
    * BroadcastHashJoin LeftSemi, no literal IN list of unbounded
    * arity). Factored out so the plan is testable in isolation. */
  private[graft] def dimTouchedFact(fact: DataFrame, changedKeys: DataFrame,
                                    dimKey: String): DataFrame =
    fact.join(broadcast(changedKeys), Seq(dimKey), "left_semi")
}
