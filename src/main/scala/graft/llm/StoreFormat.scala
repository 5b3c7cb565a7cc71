package graft.llm

import org.apache.spark.sql.SparkSession

/** Parameter-stamp discipline shared by the persistent admission
  * stores: any constructor parameter that is PART OF THE ON-DISK
  * LAYOUT — banding geometry (which band keys exist), hash-bucket
  * fan-out (where tombstones must land), shingle/signature sizing
  * (what a stored bandHash MEANS) — is stamped at the store root on
  * first use and verified on every reopen. Without the stamp a store
  * written under one parameter set and reopened under another fails
  * SILENTLY: probes recompute the batch side under the new parameters,
  * band keys stop colliding, and recall quietly drops to zero — the
  * worst failure class a dedup gate has (it admits everything and
  * nothing looks wrong). The [[IvfMorIndexStore]] `_centroids` stamp
  * and the [[MinhashIndexStore]] `_format` stamp established the
  * pattern; this is the shared verify-or-adopt primitive.
  *
  * Semantics: missing marker → stamp the handle's parameters (ADOPTION
  * — a pre-stamp store's layout is this handle's claim going forward,
  * the `_centroids` precedent); present and equal → fine; mismatch →
  * refuse with the stamped value (reopen with those parameters, or
  * rebuild). The check+write+rename triple runs under the per-root
  * publish lock ([[graft.pipeline.MorStore.publishLock]]): two handles
  * first-opening one root concurrently on a local FS would otherwise
  * BOTH pass the existence check and rename-replace would let the LAST
  * stamp win silently — two doors then proceed under DIFFERENT
  * parameters, precisely the recall loss the stamp exists to refuse.
  * Under the lock exactly one adoption wins and the loser re-reads the
  * winner's stamp: equal parameters proceed, mismatched REFUSE. */
private[graft] object StoreFormat {

  def ensure(spark: SparkSession, root: String, name: String,
             expect: String, store: String): Unit =
    graft.pipeline.MorStore.publishLock(root).synchronized {
      val rootP = new org.apache.hadoop.fs.Path(root)
      val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(rootP, name)
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val got = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        require(got == expect,
          s"$store at $root was written under parameters '$got'; this handle " +
            s"carries '$expect' — probing across parameter sets silently loses " +
            "recall, so reopen with the stamped parameters or rebuild (re-ingest)")
      } else {
        fs.mkdirs(rootP)
        val tmp = new org.apache.hadoop.fs.Path(rootP, s"._tmp_$name")
        val out = fs.create(tmp, true)
        try out.write(expect.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, marker) && !fs.exists(marker))
          throw new java.io.IOException(s"failed to stamp $name of $root")
      }
    }

  /** The admission-clock FLOOR marker (`_adm_floor`): the highest
    * retention stamp ever admitted at this root, persisted so the
    * clock SURVIVES CHECKPOINT RE-CREATION. The streaming drains stamp
    * `adm = base + batchId`; batch ids restart at 0 when a checkpoint
    * is re-created (routine over a year — the engine's own
    * reindex/migration story encourages fresh checkpoints), and
    * without the floor new admissions would stamp BELOW already-expired
    * watermarks (instantly evictable) while watermarks derived from the
    * new clock stop evicting old state. The floor only ever ADVANCES
    * (monotone max — an empty-after-expire store still remembers how
    * far the clock got, which a data-derived max cannot), and a fresh
    * drain's base is `floor + 1`. Pre-floor stores read None and keep
    * the historical base-0 behavior. Read/bump are one tiny driver-side
    * marker op each, scoped by the per-root publish lock (the bump is
    * a read-modify-write). */
  private[llm] val FloorFile = "_adm_floor"

  def readFloor(spark: SparkSession, root: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(root), FloorFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  def bumpFloor(spark: SparkSession, root: String, adm: Long): Unit =
    graft.pipeline.MorStore.publishLock(root).synchronized {
      val rootP = new org.apache.hadoop.fs.Path(root)
      val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cur = readFloor(spark, root)
      if (!cur.exists(_ >= adm)) {
        fs.mkdirs(rootP)
        val tmp = new org.apache.hadoop.fs.Path(rootP, s"._tmp_$FloorFile")
        val out = fs.create(tmp, true)
        try out.write(adm.toString.getBytes("UTF-8")) finally out.close()
        val dst = new org.apache.hadoop.fs.Path(rootP, FloorFile)
        fs.delete(dst, false)
        if (!fs.rename(tmp, dst) && !fs.exists(dst))
          throw new java.io.IOException(s"failed to write $FloorFile of $root")
      }
    }
}
