package graft.pipeline

import graft.SparkSpec
import graft.schema.TableConfig
import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.util.Random

/** Model-based property test for incremental join-view maintenance:
  * a random interleaving of fact upserts, dim attribute rewrites,
  * partition deletes on either side, and maintenance ticks — after
  * EVERY tick the materialized view must equal the from-scratch
  * `fact ⟕ dim` of the current table states. The reference model is
  * the recompute itself (the definition of view correctness). */
class JoinViewPropertySpec extends SparkSpec {
  import spark.implicits._

  private val factCfg = TableConfig("jvp.fact", null, Seq("id"))
  private val dimCfg = TableConfig("jvp.dim", null, Seq("ck"))
  private val viewCfg = TableConfig("jvp.view", null, Seq("id"))

  test("random mutate/tick sequences: view always equals the recompute") {
    val rnd = new Random(77)
    val t = Files.createTempDirectory("jvp").toString
    val fact = new ManifestStore(spark, s"$t/fact", "p")
    val dim = new ManifestStore(spark, s"$t/dim", "dp")
    val view = new MorStore(spark, s"$t/view", "p", viewCfg)
    def tick() = JoinView.maintain(spark, s"$t/view", view, fact, dim, Seq("id"), "ck")

    val parts = Seq("p1", "p2")
    val dparts = Seq("d1", "d2")
    val partOf = (1L to 30L).map(id => id -> parts((id % 2).toInt)).toMap
    val dpartOf = (1L to 6L).map(ck => ck -> dparts((ck % 2).toInt)).toMap

    // seed both sides, bootstrap
    fact.upsert((1L to 10L).map(id => (id, 1L + id % 6, partOf(id), id * 1.0))
      .toDF("id", "ck", "p", "v"), factCfg)
    dim.upsert((1L to 6L).map(ck => (ck, dpartOf(ck), s"seg$ck"))
      .toDF("ck", "dp", "seg"), dimCfg)
    tick()

    def check(step: Int): Unit = {
      val want = (fact.read, dim.read) match {
        case (Some(f), Some(dm)) => canon(f.join(dm, Seq("ck"), "left")
          .select("id", "ck", "v", "seg"))
        case (Some(f), None) => canon(f.select("id", "ck", "v")
          .withColumn("seg", lit(null).cast("string")))
        case _ => Seq.empty
      }
      val got = view.read.map(df => canon(df.select("id", "ck", "v", "seg")))
        .getOrElse(Seq.empty)
      assert(got == want, s"view diverged at step $step:\n got $got\nwant $want")
    }
    check(0)

    (1 to 18).foreach { step =>
      rnd.nextInt(5) match {
        case 0 | 1 => // fact upsert: restatements + fresh ids
          val rows = (1 to 1 + rnd.nextInt(4)).map { _ =>
            val id = 1L + rnd.nextInt(30)
            (id, 1L + rnd.nextInt(6).toLong, partOf(id), rnd.nextInt(500) * 1.0)
          }.groupBy(_._1).values.map(_.head).toSeq
          fact.upsert(rows.toDF("id", "ck", "p", "v"), factCfg)
        case 2 => // dim attribute rewrite for a random key
          val ck = 1L + rnd.nextInt(6)
          dim.upsert(Seq((ck, dpartOf(ck), s"seg$ck-v$step")).toDF("ck", "dp", "seg"), dimCfg)
        case 3 => // drop a random fact id via partition replace
          fact.read.foreach { f =>
            val id = 1L + rnd.nextInt(30)
            val pv = partOf(id)
            fact.replacePartitions(
              f.filter(col("p") === pv && col("id") =!= id), Seq(pv))
          }
        case 4 => // drop a random dim key via partition replace
          dim.read.foreach { dm =>
            val ck = 1L + rnd.nextInt(6)
            val dv = dpartOf(ck)
            dim.replacePartitions(
              dm.filter(col("dp") === dv && col("ck") =!= ck), Seq(dv))
          }
      }
      tick()
      check(step)
    }
  }
}
