package graft.pipeline

import graft.SparkSpec
import graft.schema.TableConfig
import java.nio.file.Files
import java.sql.Timestamp
import scala.util.Random

/** Model-based property test: a random interleaving of appendDelta /
  * delete / compact / compactPartitions / vacuum against a trivial
  * in-memory reference model — after every mutation the reconciled
  * read must equal the model exactly. The model is last-CURSOR-wins
  * per key with tombstone parity (ties broken by arrival), i.e. the
  * documented reconcile contract, executed naively. */
class MorStorePropertySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableConfig("mor.prop", null, Seq("k"), cursorField = Some("ts"))

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("random op sequences: reconciled read always equals the reference model") {
    val rnd = new Random(1234)
    val keys = (1 to 12).map(i => s"k$i")
    val parts = Seq("p1", "p2", "p3")
    // model: key -> (partition, cursorMin, seq, deleted, value)
    var model = Map.empty[String, (String, Int, Int, Boolean, Int)]
    var seq = 0
    val t = Files.createTempDirectory("mor-prop").toString
    val store = new MorStore(spark, t, "p", cfg, compactSegments = 3)

    def applyRows(rows: Seq[(String, Int, String, Int)], deleted: Boolean): Unit = {
      seq += 1
      // batch pre-dedup keeps cursor-latest per key; replicate per-batch
      val batchLatest = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values
      batchLatest.foreach { case (k, cur, p, v) =>
        val keep = model.get(k) match {
          case None => true
          case Some((_, mc, ms, _, _)) => cur > mc || (cur == mc && seq > ms)
        }
        if (keep) model += k -> ((p, cur, seq, deleted, v))
      }
    }

    def expected: Seq[Seq[String]] =
      model.collect { case (k, (_, _, _, false, v)) => Seq(k, v.toString) }
        .toSeq.sortBy(_.mkString("|"))

    // each key is pinned to one partition (the store's documented
    // identity contract)
    val partOf = keys.map(k => k -> parts(rnd.nextInt(parts.size))).toMap

    (1 to 25).foreach { step =>
      rnd.nextInt(6) match {
        case 0 | 1 => // upsert batch of 1-4 DISTINCT keys (equal-cursor
          // duplicates of a key inside one batch tie-break on content
          // hash, which the naive model can't replay — distinct keys
          // keep the model honest while cross-batch cursor ties still
          // exercise the sequence tiebreak)
          val rows = (1 to 1 + rnd.nextInt(3)).map { _ =>
            val k = keys(rnd.nextInt(keys.size))
            (k, rnd.nextInt(50), partOf(k), rnd.nextInt(1000))
          }.groupBy(_._1).values.map(_.head).toSeq
          applyRows(rows, deleted = false)
          store.appendDelta(rows.map { case (k, c, p, v) => (k, ts(c), p, v) }
            .toDF("k", "ts", "p", "v"))
        case 2 => // tombstone batch
          val k = keys(rnd.nextInt(keys.size))
          val cur = rnd.nextInt(50)
          applyRows(Seq((k, cur, partOf(k), 0)), deleted = true)
          store.delete(Seq((partOf(k), k, ts(cur))).toDF("p", "k", "ts"))
        case 3 =>
          if (store.latestManifestVersion.isDefined) store.compact()
        case 4 =>
          store.compactPartitions(Seq(parts(rnd.nextInt(parts.size))))
        case 5 =>
          store.vacuum(keepManifests = 2)
      }
      val got = store.read.map(df => canon(df.select("k", "v"))).getOrElse(Seq.empty)
      assert(got == expected, s"diverged at step $step: got $got, want $expected")
    }
  }
}
