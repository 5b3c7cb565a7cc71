package graft.pipeline

import graft.merge.MergeEngine
import graft.schema.TableConfig
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned ODS table with ATOMIC multi-partition commits — the
  * transactional refinement of [[PartitionedStore]] (whose per-directory
  * swap documents a crash window where a reader could see partition A
  * merged but partition B not yet).
  *
  * Design (the table-format idea — Iceberg/Delta's manifest commit — in
  * its minimal file-layout form):
  *   - data lives in IMMUTABLE segment directories `seg_*`, written once,
  *     never renamed or edited; the partition column is RETAINED in the
  *     files (no Hive name=value encoding), so a segment is self-contained;
  *   - a MANIFEST maps each partition value to the segment holding its
  *     current rows; manifests are numbered files under `_manifests/`,
  *     committed by staged-write + one atomic rename;
  *   - readers resolve the highest committed manifest: every query sees
  *     exactly one manifest — all-old or all-new, never a mix, no matter
  *     where a writer died (ManifestStoreSpec injects the crashes);
  *   - a merge writes ONE new segment holding the merged slice of the
  *     touched partitions and re-points only those values — untouched
  *     partitions' segments are never read, rewritten, or moved;
  *   - orphans (segments written before a crash, torn `.tmp_` manifests)
  *     are invisible by construction and swept by [[vacuum]].
  *
  * Partition pruning without Hive dirs: a manifest read scans only the
  * segments the wanted values point at, each with a pushed-down
  * partition-value filter; segments are written clustered + sorted on the
  * partition column, so parquet row-group min/max stats prune within the
  * segment. At 100 TB the manifest (one line per partition value) stays
  * KB-scale — partition counts are thousands, not billions.
  */
final class ManifestStore(spark: SparkSession, root: String, val partitionCol: String,
                          mergeBatchMaxSegments: Int = 16,
                          mergeBatchKeepManifests: Int = 8,
                          clusterCols: Seq[String] = Nil,
                          statsCols: Seq[String] = Nil,
                          clusterFiles: Int = 0) extends MergeSink {

  /** [[MergeSink]] binding: partition-scoped upsert — a micro-batch
    * writes ONE segment holding only the touched partitions' merged
    * slice, with `mergeBatchMaxSegments` bounding read amplification —
    * then [[vacuum]] down to `mergeBatchKeepManifests`: compaction
    * retires segments but never deletes them, so an unbounded streaming
    * cadence would otherwise grow dead bytes forever. Vacuum after a
    * committed merge is crash-safe (only unreferenced segments and
    * past-horizon manifests are dropped); direct [[upsert]] callers
    * keep manual retention control. */
  override def mergeBatch(batch: DataFrame, cfg: TableConfig): Unit = {
    upsert(batch, cfg, mergeBatchMaxSegments)
    vacuum(keepManifests = mergeBatchKeepManifests)
  }

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def manDir = new Path(s"$root/_manifests")

  /** Committed manifest versions, ascending. */
  def manifestVersions: Seq[Int] =
    if (!fs.exists(manDir)) Seq.empty
    else fs.listStatus(manDir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("m=")).map(_.stripPrefix("m=").toInt).sorted

  def latestManifestVersion: Option[Int] = manifestVersions.lastOption

  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, "UTF-8")
  private def dec(v: String): String =
    java.net.URLDecoder.decode(v, "UTF-8")

  /** value → segment dir name. NULL partition value travels as a token
    * distinct from any real string (URL-encoding keeps real values from
    * colliding with it or with the line format). */
  private[graft] def readManifest(n: Int): Map[String, String] = {
    val in = fs.open(new Path(manDir, s"m=$n"))
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(v, seg) = line.split("\t", 2)
      dec(v) -> seg
    }.toMap
  }

  /** SINGLE-WRITER commit contract: version numbering assumes one
    * committer per table — exactly what the engine's write paths give
    * (a streaming checkpoint serializes its one writer; batch jobs own
    * their run window). Under a ROGUE concurrent writer the outcome is
    * filesystem-dependent: HDFS rename-to-existing fails, so the race
    * loser throws and its staged segment is vacuum-swept; a POSIX
    * local rename replaces, so the LAST committer's pointers win and
    * the other's version is lost (readers still only ever see one
    * complete manifest — atomicity is never at risk, only the lost
    * update). True multi-writer tables need an external lock or a
    * catalog CAS, which is precisely what the table formats bolt on
    * top of this same layout. */
  private def commit(m: Map[String, String]): Int = {
    fs.mkdirs(manDir)
    // sweep torn staged manifests from earlier crashes
    fs.listStatus(manDir).toSeq.filter(_.getPath.getName.startsWith(".tmp_"))
      .foreach(s => fs.delete(s.getPath, true))
    val n = latestManifestVersion.getOrElse(0) + 1
    val tmp = new Path(manDir, s".tmp_m=$n")
    val out = fs.create(tmp, true)
    try out.write(m.toSeq.sortBy(_._1)
      .map { case (v, seg) => s"${enc(v)}\t$seg" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(manDir, s"m=$n")))
      throw new java.io.IOException(s"failed to commit manifest $n of $root")
    n
  }

  // same convention (and same documented caveat: a REAL string value
  // equal to the token collides) as Hive's default-partition name
  private val NullToken = "__HIVE_DEFAULT_PARTITION__"

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

  /** One immutable segment: clustered and sorted on the partition column
    * so parquet row-group min/max stats prune reads within the segment.
    *
    * With `clusterCols` set the segment is RANGE-partitioned and sorted
    * on (partitionCol, clusterCols…) — partition values stay contiguous
    * (the manifest's partition pruning is unchanged) and each file
    * covers a tight cluster-column range. With `statsCols` set the
    * segment carries its own `_zonemaps`, built from THIS segment only
    * at write time: statistics maintenance is O(batch) per commit —
    * committed segments' stats are immutable alongside their data, and
    * compaction produces a fresh segment with fresh stats. */
  private def writeSegment(df: DataFrame): String = writeSegmentObserved(df)._1

  /** [[writeSegment]] that also returns the segment's distinct
    * partition values, observed as an accumulator DURING the write job
    * — the values cost no second execution of the writer's input plan
    * and no read-back scan (for snapshot/overwrite callers that input
    * is often a full merge or rollup plan, and its re-execution was
    * the dominant per-commit fixed cost). */
  private def writeSegmentObserved(df: DataFrame): (String, Seq[String]) = {
    val name = s"seg_${java.util.UUID.randomUUID().toString.take(8)}"
    val sorted =
      if (clusterCols.isEmpty)
        df.repartition(col(partitionCol)).sortWithinPartitions(partitionCol)
      else {
        val keys = (partitionCol +: clusterCols).map(col)
        // clusterFiles = 0 leaves the file count to the engine (AQE
        // coalesces small batches — the right default at streaming
        // cadence); an explicit count pins the clustering granularity
        // so zone maps have per-file ranges worth pruning
        val ranged =
          if (clusterFiles > 0) df.repartitionByRange(clusterFiles, keys: _*)
          else df.repartitionByRange(keys: _*)
        ranged.sortWithinPartitions(keys: _*)
      }
    val obs = org.apache.spark.sql.Observation()
    // collect_set skips NULL — count them separately so the NULL
    // partition still commits under its token
    sorted.observe(obs, collect_set(col(partitionCol).cast("string")).as("vals"),
        count(when(col(partitionCol).isNull, 1)).as("nulls"))
      .write.parquet(s"$root/$name")
    if (statsCols.nonEmpty)
      Layout.buildZoneMaps(spark, s"$root/$name", statsCols)
    val row = obs.get
    val vals = row("vals").asInstanceOf[Seq[String]] ++
      (if (row("nulls").asInstanceOf[Long] > 0) Seq(NullToken) else Nil)
    (name, vals)
  }

  /** Union of the manifest's segments, each filtered to the values that
    * still point at it (an old segment may hold superseded rows of values
    * that have since re-pointed — the filter is what retires them).
    * Schema EVOLUTION across segments: allowMissingColumns unions by
    * name, so a column added after earlier segments were committed reads
    * as NULL from them — additive evolution without rewriting history
    * (the same contract parquet-on-Hive and the table formats give). */
  private def resolve(man: Map[String, String]): DataFrame = {
    val bySeg = man.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    bySeg.toSeq.sortBy(_._1).map { case (seg, values) =>
      SegmentIO.read(spark, s"$root/$seg").filter(valueFilter(values))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** None when no manifest was ever committed OR the latest manifest is
    * empty (snapshot of an empty frame) — an empty manifest has no
    * segment to resolve a schema from, so "no data" is the honest
    * answer, not a reduce-on-empty crash. */
  def read: Option[DataFrame] = latestManifestVersion.flatMap { n =>
    val man = readManifest(n)
    if (man.isEmpty) None else Some(resolve(man))
  }

  /** TIME-TRAVEL read: the table exactly as of committed version `v`
    * (any version inside [[vacuum]]'s retention horizon). Immutable
    * segments make this free — an old manifest's pointers still resolve
    * byte-identically until vacuum passes them. The query-side
    * companion of [[rollbackTo]]: rollback REPOINTS the head, readAt
    * just looks; together with [[changes]] they are the audit loop
    * (what did version v say / what changed since / put it back). */
  def readAt(v: Int): Option[DataFrame] = {
    require(manifestVersions.contains(v),
      s"version $v is not committed in $root (retained: ${manifestVersions.mkString(",")})")
    val man = readManifest(v)
    if (man.isEmpty) None else Some(resolve(man))
  }

  /** Zone-map-pruned read: [[read]], but each live segment's per-file
    * statistics drop the files whose [min, max] / Bloom cannot satisfy
    * `preds` BEFORE the scan is planned — the manifest's partition
    * pruning and the layout layer's file skipping compose. Segments
    * written before `statsCols` was configured carry no stats and are
    * read whole (listed file count still reported, so the prune ratio
    * stays honest); residual predicates are re-applied either way, so
    * the answer NEVER depends on the statistics. Returns None on the
    * same empty-manifest contract as [[read]]. */
  def readPruned(preds: Seq[Layout.FilePred]): Option[(DataFrame, Layout.PruneStats)] =
    latestManifestVersion.flatMap { n =>
      val man = readManifest(n)
      if (man.isEmpty) None
      else {
        require(preds.nonEmpty, "readPruned needs at least one predicate")
        val residual = preds.map(_.residual).reduce(_ && _)
        val bySeg = man.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
        var total = 0; var selected = 0
        val parts = bySeg.toSeq.sortBy(_._1).map { case (seg, values) =>
          val segDir = s"$root/$seg"
          val df =
            if (fs.exists(new Path(s"$segDir/${Layout.ZoneMapDir}"))) {
              val (pruned, st) = Layout.prunedRead(spark, segDir, preds)
              total += st.totalFiles; selected += st.selectedFiles
              pruned
            } else {
              val files = fs.listStatus(new Path(segDir)).toSeq
                .count(_.getPath.getName.endsWith(".parquet"))
              total += files; selected += files
              SegmentIO.read(spark, segDir).filter(residual)
            }
          df.filter(valueFilter(values))
        }
        Some((parts.reduce(_.unionByName(_, allowMissingColumns = true)),
          Layout.PruneStats(total, selected)))
      }
    }

  /** Partition-pruned read: only segments referenced by `values` are
    * scanned. Same empty-manifest contract as [[read]]. */
  def readPartitions(values: Seq[String]): Option[DataFrame] =
    latestManifestVersion.flatMap { n =>
      val full = readManifest(n)
      if (full.isEmpty) None
      else {
        val man = full.view.filterKeys(values.contains).toMap
        if (man.isEmpty) Some(resolve(full).filter(lit(false)))
        else Some(resolve(man))
      }
    }

  /** Full snapshot — one segment, every value points at it. Returns
    * the committed partition values. */
  def snapshot(df: DataFrame): Seq[String] = {
    val (seg, values) = writeSegmentObserved(df)
    commit(values.map(_ -> seg).toMap)
    values
  }

  /** Keyed upsert touching only the partitions present in the batch.
    * Rows must stay in their partition (the partition column is part of
    * the business identity — [[PartitionedStore]]'s same contract). The
    * merged slice lands as one new segment; the manifest re-points the
    * affected values in ONE atomic rename. */
  def upsert(source: DataFrame, cfg: TableConfig): Seq[String] =
    latestManifestVersion match {
      case None =>
        val cursorOrder = cfg.cursorField.map(c => col(c).desc_nulls_last).toSeq
        val deduped = MergeEngine.latestPerKey(source, cfg.keys, cursorOrder)
        snapshot(deduped)
      case Some(n) =>
        val man = readManifest(n)
        val affected = partitionValues(source)
        val touched = man.view.filterKeys(affected.contains).toMap
        val target =
          if (touched.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              source.schema)
          else resolve(touched)
        val merged = MergeEngine.upsert(target, source, cfg)
        val seg = writeSegment(merged)
        commit(man ++ affected.map(_ -> seg))
        affected
    }

  /** Write-audit-publish (the Iceberg WAP pattern): merge, stage the
    * result as an UNREFERENCED segment (invisible to every reader by
    * construction), audit the STAGED BYTES — the audit reads the
    * parquet a reader would read, so write-path corruption is caught,
    * not just logical errors — and only on a clean audit commit the
    * manifest pointer. A failed audit deletes the staged segment and
    * returns the failures; the table is untouched, readers never saw a
    * row. This is the quality gate a 100 TB ingest wants in the COMMIT
    * path rather than as an after-the-fact alert. */
  def upsertAudited(source: DataFrame, cfg: TableConfig,
                    audit: DataFrame => Seq[graft.validate.CheckResult])
      : Either[Seq[graft.validate.CheckResult], Seq[String]] = {
    val (merged, affected, man) = latestManifestVersion match {
      case None =>
        val cursorOrder = cfg.cursorField.map(c => col(c).desc_nulls_last).toSeq
        val deduped = MergeEngine.latestPerKey(source, cfg.keys, cursorOrder)
        (deduped, partitionValues(deduped), Map.empty[String, String])
      case Some(n) =>
        val man0 = readManifest(n)
        val aff = partitionValues(source)
        val touched = man0.view.filterKeys(aff.contains).toMap
        val target =
          if (touched.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], source.schema)
          else resolve(touched)
        (MergeEngine.upsert(target, source, cfg), aff, man0)
    }
    val seg = writeSegment(merged)
    val staged = SegmentIO.read(spark, s"$root/$seg")
    val failures = audit(staged).filterNot(_.passed)
    if (failures.nonEmpty) {
      fs.delete(new Path(s"$root/$seg"), true)
      Left(failures)
    } else {
      commit(man ++ affected.map(_ -> seg))
      Right(affected)
    }
  }

  /** M4 — replace whole partitions from the source atomically. */
  def overwritePartitions(source: DataFrame): Seq[String] = {
    val (seg, affected) = writeSegmentObserved(source)
    val man = latestManifestVersion.map(readManifest).getOrElse(Map.empty)
    commit(man ++ affected.map(_ -> seg))
    affected
  }

  /** [[overwritePartitions]] that can also DROP partitions: every value
    * in `clear` is first un-pointed from the manifest, then the source's
    * partitions land as one new segment — all in one atomic commit. A
    * cleared value absent from the source simply disappears (its old
    * segment rows are retired by the value filter; [[vacuum]] reclaims
    * the bytes). This is the delete path: rewrite a partition minus some
    * rows by passing the remainder as `source` with the partition in
    * `clear`, and a partition emptied entirely stays consistent instead
    * of resurrecting its old segment. */
  def replacePartitions(source: DataFrame, clear: Seq[String]): Seq[String] = {
    val man = latestManifestVersion.map(readManifest).getOrElse(Map.empty) -- clear
    val (seg, affected) = writeSegmentObserved(source)
    if (affected.isEmpty) { fs.delete(new Path(s"$root/$seg"), true); commit(man); Seq.empty }
    else {
      commit(man ++ affected.map(_ -> seg))
      affected
    }
  }

  /** Roll the table back to committed version `v`: COMMIT a new
    * manifest carrying version v's pointers — history is preserved
    * (the bad versions stay readable for forensics via [[readManifest]]
    * until [[vacuum]]'s horizon passes them), readers flip atomically,
    * and the rolled-back-to segments are re-referenced by the NEW head
    * so vacuum keeps them. The recovery lever after a bad merge or a
    * poisoned upstream batch — O(manifest) cost, zero data movement. */
  def rollbackTo(v: Int): Int = {
    require(manifestVersions.contains(v), s"version $v is not committed in $root")
    commit(readManifest(v))
  }

  /** Changed partition values between two committed versions — the
    * values whose manifest pointer differs (including appearing or
    * disappearing). Immutable segments make this EXACT, not heuristic:
    * an identical pointer means identical bytes. */
  private[graft] def changedValues(fromV: Int, toV: Int): Seq[String] = {
    def man(v: Int): Map[String, String] =
      if (v == 0) Map.empty else readManifest(v)
    val mf = man(fromV); val mt = man(toV)
    (mf.keySet ++ mt.keySet).filter(v => mf.get(v) != mt.get(v)).toSeq.sorted
  }

  /** EXACTLY the keys whose rows differ between two committed versions
    * — [[changes]] projected to the key columns. Precision here is a
    * SCALE property, not a nicety: the tempting cheap alternative
    * (union both versions' changed-partition slices, keys only, no
    * diff join) degenerates to ALL keys whenever an update is spread
    * across every partition — which hash-distributed keys make the
    * common case — and a consumer like the join view then refreshes
    * the entire fact-sized view for a 0.1% dim update. The row-diff
    * join is O(changed partitions) of THIS table; for the dim side of
    * a mart join that is broadcast-size by definition, a fraction of
    * the fact-sized work the false positives would trigger. */
  def changedKeys(fromV: Int, toV: Int, keys: Seq[String]): DataFrame =
    changes(fromV, toV, keys).select(keys.map(col): _*).distinct()

  /** Row-level CDC between two committed versions — the time-travel
    * diff (Delta's change-data-feed idea in manifest form): one row per
    * changed key with `_change` ∈ insert | update | delete; updates
    * carry the post-image, deletes the pre-image. Keys compare
    * null-safely; a key present in both versions with identical
    * non-key columns emits nothing.
    *
    * Cost is O(changed partitions), not O(table): a partition whose
    * segment pointer is unchanged between the two manifests is provably
    * untouched and is NEVER read — at 100 TB a merge cycle touches a
    * handful of partitions, and so does its diff. */
  def changes(fromV: Int, toV: Int, keys: Seq[String]): DataFrame =
    changes(fromV, toV, keys, updatePreimage = false)

  /** [[changes]] with the update shape chosen by the consumer:
    * `updatePreimage = true` emits updates as TWO rows —
    * `update_preimage` (the before-row) and `update_postimage` (the
    * after-row) — which is what incremental AGGREGATE maintenance
    * needs (subtract the old contribution, add the new one;
    * [[CdfRollup.applyCdf]] consumes exactly this shape). `fromV = 0`
    * reads as the empty store, so the first commit's diff is
    * all-inserts. */
  def changes(fromV: Int, toV: Int, keys: Seq[String],
              updatePreimage: Boolean): DataFrame = {
    require(keys.nonEmpty, "changes needs at least one key column")
    def man(v: Int): Map[String, String] =
      if (v == 0) Map.empty else readManifest(v)
    val mf = man(fromV); val mt = man(toV)
    val changed = (mf.keySet ++ mt.keySet)
      .filter(v => mf.get(v) != mt.get(v)).toSeq.sorted
    def slice(man: Map[String, String]): Option[DataFrame] = {
      val sub = man.view.filterKeys(changed.contains).toMap
      if (sub.isEmpty) None else Some(resolve(sub))
    }
    val template = slice(mt).orElse(slice(mf)).orElse(read).getOrElse(
      throw new IllegalStateException(s"version diff on empty store $root"))
    val empty = template.filter(lit(false))
    val dataCols = template.columns.toSeq
    val nonKeys = dataCols.filterNot(keys.contains)
    val after = slice(mt).getOrElse(empty)
      .select(dataCols.map(col): _*).withColumn("__in_a", lit(true))
    val before = slice(mf).getOrElse(empty)
      .select(dataCols.map(col): _*).withColumn("__in_b", lit(true))
      .toDF(dataCols.map("__b_" + _) :+ "__in_b": _*)
    val cond = keys.map(k => col(k) <=> col("__b_" + k)).reduce(_ && _)
    val unchanged = nonKeys.map(c => col(c) <=> col("__b_" + c))
      .reduceOption(_ && _).getOrElse(lit(true))
    val change = when(col("__in_b").isNull, lit("insert"))
      .when(col("__in_a").isNull, lit("delete"))
      .when(unchanged, lit(null).cast("string"))
      .otherwise(lit("update"))
    val joined = after.join(before, cond, "full_outer")
      .withColumn("_change", change)
      .filter(col("_change").isNotNull)
    // the surviving image: post where the key exists in `after`,
    // pre for deletes
    def image(df: DataFrame, changeAs: Column) = df.select(dataCols.map(c =>
      when(col("__in_a").isNotNull, col(c)).otherwise(col("__b_" + c)).as(c)) :+
      changeAs.as("_change"): _*)
    if (!updatePreimage) image(joined, col("_change"))
    else {
      val upd = joined.filter(col("_change") === "update")
      image(joined.filter(col("_change") =!= "update"), col("_change"))
        .unionByName(upd.select(dataCols.map(c => col("__b_" + c).as(c)) :+
          lit("update_preimage").as("_change"): _*))
        .unionByName(upd.select(dataCols.map(col) :+
          lit("update_postimage").as("_change"): _*))
    }
  }

  /** Number of distinct segments the latest manifest references — the
    * read amplification of a full-table scan (each live segment is one
    * filtered parquet read in [[resolve]]). Grows by one per
    * [[upsert]]/[[overwritePartitions]] run until compaction. */
  def liveSegments: Int =
    latestManifestVersion.map(readManifest(_).values.toSet.size).getOrElse(0)

  /** Collapse every live segment into ONE (small-files compaction for
    * the manifest layout): resolve the current manifest and commit the
    * result as a fresh snapshot — same atomic manifest-pointer rename,
    * so readers see the fragmented table or the compacted one, never a
    * mix; a crash mid-compact leaves an unreferenced segment that
    * [[vacuum]] sweeps. Run when [[liveSegments]] outgrows the segment
    * budget (e.g. after every N merge cycles); [[upsert]] with
    * `maxSegments` automates that policy. */
  def compact(): Unit = read.foreach(snapshot)

  /** Upsert, then compact iff the manifest references more than
    * `maxSegments` segments — bounded read amplification under an
    * unbounded merge cadence, the same amortized-O(batch) argument as
    * `TableStore.append(df, maxChain)`. */
  def upsert(source: DataFrame, cfg: TableConfig, maxSegments: Int): Seq[String] = {
    val affected = upsert(source, cfg)
    if (maxSegments > 0 && liveSegments > maxSegments) compact()
    affected
  }

  /** Drop segments no live manifest references and manifests older than
    * the newest `keepManifests` (time travel horizon). Safe against
    * crashed writers: an orphaned segment was never referenced, so
    * deleting it cannot affect any reader. No in-flight guard is needed
    * here, unlike [[MorStore.vacuum]]'s commit-index skip: this store's
    * commit contract is SINGLE-WRITER (see [[commit]]), so the only
    * unreferenced segments are the caller's own crashed leftovers —
    * there is no sanctioned concurrent appender whose staged segment a
    * vacuum could race. Defaults to the store's configured retention so
    * explicit and automatic vacuums agree. */
  def vacuum(keepManifests: Int = this.mergeBatchKeepManifests): Unit = {
    val keep = manifestVersions.takeRight(keepManifests)
    val referenced = keep.flatMap(readManifest(_).values).toSet
    val rootP = new Path(root)
    if (fs.exists(rootP))
      fs.listStatus(rootP).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg_") &&
          !referenced.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, true))
    manifestVersions.dropRight(keepManifests)
      .foreach(v => fs.delete(new Path(manDir, s"m=$v"), false))
  }
}
