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
  * rebuild). */
private[llm] object StoreFormat {

  def ensure(spark: SparkSession, root: String, name: String,
             expect: String, store: String): Unit = {
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
}
