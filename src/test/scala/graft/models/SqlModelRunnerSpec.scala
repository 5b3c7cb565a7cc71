package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SqlModelRunner — the dbt-parity layer. Mirrors the reference project's
  * exact model shapes: a staging view cleanse
  * (dbt/models/staging/casreport/stg_casreport__v_prd_srv.sql) and an
  * incremental mart with the max-watermark guard
  * (dbt/models/marts/casreport/dim_casreport_services.sql:24-29), plus the
  * macros file (dbt/macros/transformations.sql) and schema tests
  * (dbt/models/staging/casreport/schema.yml).
  */
class SqlModelRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val p = java.nio.file.Files.createTempDirectory("dbt_runner")
    p.toFile.deleteOnExit()
    p.toString
  }

  private val referenceStyleMacros =
    """{% macro clean_text_field(column_name) %}
      |    TRIM(REGEXP_REPLACE({{ column_name }}, '\r|\n|\x00', ''))
      |{% endmacro %}
      |{% macro handle_null_numeric(column_name, default_value=0) %}
      |    COALESCE({{ column_name }}, {{ default_value }})
      |{% endmacro %}
      |{% macro get_current_timestamp() %}
      |    CURRENT_TIMESTAMP
      |{% endmacro %}""".stripMargin

  test("config parsing: materialized / unique_key scalar and list / schema") {
    val (c1, body) = ModelSql.extractConfig(
      "{{ config(materialized='incremental', unique_key='k', schema='marts', on_schema_change='sync_all_columns') }}\nSELECT 1")
    assert(c1 == ModelConfig("incremental", Seq("k"), Some("marts"), "sync_all_columns"))
    assert(body.trim == "SELECT 1")
    val (c2, _) = ModelSql.extractConfig("{{ config(unique_key=['a', 'b']) }} SELECT 1")
    assert(c2.uniqueKey == Seq("a", "b"))
  }

  test("incremental blocks: kept when incremental, else-branch otherwise") {
    val sql = "SELECT * FROM t {% if is_incremental() %}WHERE x > 1{% else %}WHERE 1=1{% endif %}"
    assert(ModelSql.applyIncrementalBlocks(sql, incremental = true).contains("x > 1"))
    assert(ModelSql.applyIncrementalBlocks(sql, incremental = false).contains("1=1"))
    val noElse = "SELECT * FROM t {% if is_incremental() %}WHERE x > 1{% endif %}"
    assert(!ModelSql.applyIncrementalBlocks(noElse, incremental = false).contains("x > 1"))
  }

  test("macro expansion: positional args, defaults, nested calls") {
    val m = ModelSql.parseMacros(referenceStyleMacros)
    assert(m.keySet == Set("clean_text_field", "handle_null_numeric", "get_current_timestamp"))
    val out = ModelSql.expandMacros(
      "SELECT {{ clean_text_field(name) }} AS name, {{ handle_null_numeric(v) }} AS v, {{ handle_null_numeric(w, -1) }} AS w", m)
    assert(out.contains("TRIM(REGEXP_REPLACE(name,"))
    assert(out.contains("COALESCE(v, 0)"))
    assert(out.contains("COALESCE(w, -1)"))
  }

  test("view model: cleanse via macro, reads registered source, nothing written") {
    val root = freshRoot()
    val r = new SqlModelRunner(spark, root, referenceStyleMacros)
    r.addSource("staging", "svc", Seq(
      ("  A1 ", "Express"), ("B2", "Standard\r"), (null, "Orphan")
    ).toDF("code", "name"))
    r.addModel("stg_svc",
      """{{ config(materialized='view', schema='staging') }}
        |{# cleanse mirrors stg_casreport__v_prd_srv.sql #}
        |SELECT TRIM(code) AS code, {{ clean_text_field(name) }} AS name
        |FROM {{ source('staging', 'svc') }}
        |WHERE code IS NOT NULL""".stripMargin,
      ModelTests(notNull = Seq("code"), unique = Seq("code")))
    val out = r.run("stg_svc")
    assert(canon(out) == Seq(Seq("A1", "Express"), Seq("B2", "Standard")).sortBy(_.mkString("|")))
    // a view writes nothing
    assert(r.store("stg_svc").versions.isEmpty)
  }

  test("table model: snapshot per run, versioned") {
    val root = freshRoot()
    val r = new SqlModelRunner(spark, root)
    r.addSource("ods", "t", Seq((1, "x")).toDF("id", "v"))
    r.addModel("tbl", "{{ config(materialized='table') }} SELECT id, v FROM {{ source('ods', 't') }}")
    r.run("tbl")
    r.addSource("ods", "t", Seq((2, "y")).toDF("id", "v"))
    val out = r.run("tbl")
    assert(canon(out) == Seq(Seq("2", "y")))
    assert(r.store("tbl").versions == Seq(1, 2))
  }

  test("incremental mart across two runs equals full recompute (watermark guard + unique_key merge)") {
    val root = freshRoot()
    def rows(upTo: Int) = (1 to upTo).flatMap(i =>
      Seq((i.toLong % 5, i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"))))
    val full = rows(40).toDF("k", "seq", "updated_at")

    val stg =
      """{{ config(materialized='view') }}
        |SELECT k, seq, updated_at FROM {{ source('ods', 'ev') }} WHERE k IS NOT NULL""".stripMargin
    val mart =
      """{{ config(materialized='incremental', unique_key='k') }}
        |WITH s AS (
        |  SELECT k, seq, updated_at,
        |         row_number() OVER (PARTITION BY k ORDER BY updated_at DESC, seq DESC) AS rn
        |  FROM {{ ref('stg') }})
        |SELECT k, seq, updated_at FROM s WHERE rn = 1
        |{% if is_incremental() %}
        |  AND updated_at > (SELECT COALESCE(MAX(updated_at), TIMESTAMP '1900-01-01') FROM {{ this }})
        |{% endif %}""".stripMargin

    val r = new SqlModelRunner(spark, root)
    r.addModel("stg", stg)
    r.addModel("mart", mart, ModelTests(unique = Seq("k"), notNull = Seq("k"), nonEmpty = true))
    // run 1: first half of the history
    r.addSource("ods", "ev", full.filter(col("seq") <= 20))
    r.run("mart")
    // run 2: full history — the watermark guard restricts the batch
    r.addSource("ods", "ev", full)
    val incremental = r.run("mart")

    // oracle: one-shot full recompute of latest-per-key
    val r2 = new SqlModelRunner(spark, freshRoot())
    r2.addModel("stg", stg)
    r2.addModel("mart", mart)
    r2.addSource("ods", "ev", full)
    assertSameRows(incremental, r2.run("mart"))
    // two versions committed: initial snapshot + one merge
    assert(r.store("mart").versions == Seq(1, 2))
  }

  test("incremental without unique_key appends in O(batch): delta segment holds only the batch") {
    val root = freshRoot()
    val r = new SqlModelRunner(spark, root)
    r.addModel("log", "{{ config(materialized='incremental') }} SELECT id FROM {{ source('ods', 's') }}")
    r.addSource("ods", "s", (1 to 1000).toDF("id"))
    r.run("log")
    r.addSource("ods", "s", Seq(2001).toDF("id"))
    val out = r.run("log")
    assert(out.count() == 1001)
    // the append run wrote a delta version containing ONLY the batch —
    // not a full-table rewrite (dbt's append strategy is O(batch))
    assert(r.store("log").versions == Seq(1, 2))
    assert(spark.read.parquet(s"$root/log/v=2").count() == 1)
  }

  test("append model auto-compacts once the chain exceeds append_max_chain") {
    val root = freshRoot()
    val r = new SqlModelRunner(spark, root)
    r.addModel("log",
      "{{ config(materialized='incremental', append_max_chain='2') }} " +
      "SELECT id FROM {{ source('ods', 's') }}")
    val st = r.store("log")
    r.addSource("ods", "s", Seq(1).toDF("id")); r.run("log") // v1 full
    r.addSource("ods", "s", Seq(2).toDF("id")); r.run("log") // v2 ← v1, chain 2
    assert(st.chainLength == 2)
    r.addSource("ods", "s", Seq(3).toDF("id"))
    val out = r.run("log") // chain would be 3 > 2 → auto-compacted full version
    assert(st.chainLength == 1)
    assert(out.count() == 3)
    assert(st.read.get.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("snapshot: two-pass SCD2 build equals one-shot; model refs read stored state") {
    val root = freshRoot()
    val r = new SqlModelRunner(spark, root)
    val full = Seq(
      (1L, 1L, "v1"), (1L, 5L, "v2"), (1L, 9L, "v3"), (2L, 3L, "x1")
    ).toDF("k", "seq", "v")
    r.addSnapshot("hist",
      "{{ config(strategy='timestamp', unique_key='k', updated_at='seq') }} " +
      "SELECT k, seq, v FROM {{ source('ods', 's') }}")
    r.addSource("ods", "s", full.filter(col("seq") < 6))
    r.runSnapshot("hist")
    r.addSource("ods", "s", full)
    val twoRun = r.runSnapshot("hist")
    // equals the one-shot SCD2 recompute over the full feed
    val oneShot = graft.merge.MergeEngine.scd2Merge(None, full, Seq("k"), "seq")
    assertSameRows(twoRun, oneShot)
    // a model ref()ing the snapshot reads its CURRENT rows, doesn't run it
    r.addModel("current_dims",
      "SELECT k, v FROM {{ ref('hist') }} WHERE is_current")
    assert(canon(r.run("current_dims")) ==
      Seq(Seq("1", "v3"), Seq("2", "x1")).sortBy(_.mkString("|")))
    assert(r.store("hist").versions.length == 2) // untouched by the model run
    // refs to a never-run snapshot fail clearly
    val r2 = new SqlModelRunner(spark, freshRoot())
    r2.addSnapshot("hist", "{{ config(strategy='timestamp', unique_key='k', updated_at='seq') }} SELECT 1 AS k, 1 AS seq")
    r2.addModel("m", "SELECT * FROM {{ ref('hist') }}")
    val e = intercept[IllegalStateException](r2.run("m"))
    assert(e.getMessage.contains("never been run"))
  }

  test("snapshot tests are enforced on the post-merge history, like any node") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addSnapshot("hist",
      "{{ config(strategy='timestamp', unique_key='k', updated_at='seq') }} " +
      "SELECT k, seq, v FROM {{ source('ods', 's') }}",
      // tests run on the HISTORY schema: updated_at lands as valid_from
      ModelTests(notNull = Seq("v"), unique = Seq("k", "valid_from")))
    r.addSource("ods", "s", Seq((1L, 1L, "v1"), (2L, 1L, "x1")).toDF("k", "seq", "v"))
    r.runSnapshot("hist")
    assert(r.test("hist").forall(_.passed))
    // a NULL in a not_null column aborts the snapshot run loudly
    r.addSource("ods", "s",
      Seq((1L, 2L, null.asInstanceOf[String])).toDF("k", "seq", "v"))
    val e = intercept[IllegalStateException](r.runSnapshot("hist"))
    assert(e.getMessage.contains("not_null"), e.getMessage)
    // test() on a never-run snapshot fails clearly
    val r2 = new SqlModelRunner(spark, freshRoot())
    r2.addSnapshot("hist",
      "{{ config(strategy='timestamp', unique_key='k', updated_at='seq') }} SELECT 1 AS k, 1 AS seq",
      ModelTests(notNull = Seq("k")))
    val e2 = intercept[IllegalStateException](r2.test("hist"))
    assert(e2.getMessage.contains("never been run"))
  }

  test("incremental test scope: verdict equals the full-relation verdict, O(batch) cost") {
    // SNAPSHOT path (incremental scope is the default): three cadence
    // runs; after each, the FULL-relation checks (r.test) must agree
    // with the incremental verdict that let the run through
    val r = new SqlModelRunner(spark, freshRoot())
    r.addSnapshot("hist",
      "{{ config(strategy='timestamp', unique_key='k', updated_at='seq') }} " +
      "SELECT k, seq, v FROM {{ source('ods', 's') }}",
      ModelTests(notNull = Seq("v"), unique = Seq("k", "valid_from"), nonEmpty = true))
    val feeds = Seq(
      Seq((1L, 1L, "v1"), (2L, 1L, "x1")),
      Seq((1L, 5L, "v2"), (3L, 2L, "y1")),
      Seq((2L, 9L, "x2")))
    feeds.foreach { f =>
      r.addSource("ods", "s", f.toDF("k", "seq", "v"))
      r.runSnapshot("hist") // incremental scope by default
      assert(r.test("hist").forall(_.passed),
        "full-relation verdict diverged from the incremental one")
    }
    // an in-batch violation is still caught at O(batch) scope
    r.addSource("ods", "s", Seq((3L, 9L, null.asInstanceOf[String])).toDF("k", "seq", "v"))
    val e = intercept[IllegalStateException](r.runSnapshot("hist"))
    assert(e.getMessage.contains("not_null"))

    // MODEL path (the DEFAULT since r11 — no opt-in): merge-strategy
    // incremental model, unique test on the merge key → sliced check
    val r2 = new SqlModelRunner(spark, freshRoot())
    r2.addModel("mart",
      "{{ config(materialized='incremental', unique_key='k') }} " +
      "SELECT k, v FROM {{ source('ods', 's') }}",
      ModelTests(notNull = Seq("v"), unique = Seq("k")))
    r2.addSource("ods", "s", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    r2.run("mart")
    r2.addSource("ods", "s", Seq((2L, "b2"), (3L, "c")).toDF("k", "v"))
    r2.run("mart")
    assert(r2.test("mart").forall(_.passed))
    // in-batch NULL caught by the slice
    r2.addSource("ods", "s", Seq((3L, null.asInstanceOf[String])).toDF("k", "v"))
    val e2 = intercept[IllegalStateException](r2.run("mart"))
    assert(e2.getMessage.contains("not_null"))

    // unique test on a column NOT containing the merge key: a new row
    // colliding with an UNTOUCHED old row straddles the slice — the
    // scope must fall back to the full-relation scan and still catch it
    val r3 = new SqlModelRunner(spark, freshRoot())
    r3.addModel("dim",
      "{{ config(materialized='incremental', unique_key='k') }} " +
      "SELECT k, code FROM {{ source('ods', 's') }}",
      ModelTests(unique = Seq("code")))
    r3.addSource("ods", "s", Seq((1L, "A"), (2L, "B")).toDF("k", "code"))
    r3.run("dim")
    r3.addSource("ods", "s", Seq((3L, "A")).toDF("k", "code")) // collides with k=1's code
    val e3 = intercept[IllegalStateException](r3.run("dim"))
    assert(e3.getMessage.contains("unique"))

    // withFullTests (the nightly-audit opt-out): full-relation scope
    // re-detects pre-existing corruption the O(batch) slice deliberately
    // skips — here an out-of-band writer breaks an UNTOUCHED key's row,
    // and only the audit mode notices on the next (disjoint) run
    val root4 = freshRoot()
    def runner4() = new SqlModelRunner(spark, root4)
    val mkModel = "{{ config(materialized='incremental', unique_key='k') }} " +
      "SELECT k, v FROM {{ source('ods', 's') }}"
    val rSeed = runner4().addModel("mart", mkModel, ModelTests(notNull = Seq("v")))
    rSeed.addSource("ods", "s", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    rSeed.run("mart")
    // out-of-band corruption: rewrite the stored relation with a NULL v
    // on key 1 (bypassing every enforced run)
    val store = rSeed.store("mart")
    store.snapshot(store.read.get.withColumn("v",
      when(col("k") === 1L, lit(null).cast("string")).otherwise(col("v"))))
    val batch3 = Seq((3L, "c")).toDF("k", "v")
    val rQuiet = runner4().addModel("mart", mkModel, ModelTests(notNull = Seq("v")))
    rQuiet.addSource("ods", "s", batch3)
    rQuiet.run("mart") // O(batch) default: disjoint slice passes — by design
    val rAudit = runner4().addModel("mart", mkModel, ModelTests(notNull = Seq("v")))
      .withFullTests()
    rAudit.addSource("ods", "s", Seq((4L, "d")).toDF("k", "v"))
    val e4 = intercept[IllegalStateException](rAudit.run("mart"))
    assert(e4.getMessage.contains("not_null"), "audit mode must re-detect corruption")
  }

  test("diamond DAG: a twice-ref'd upstream materializes once per invocation") {
    val root = freshRoot()
    val r = new SqlModelRunner(spark, root)
    r.addSource("ods", "t", Seq((1, 10), (2, 20)).toDF("id", "v"))
    r.addModel("base", "{{ config(materialized='table') }} SELECT id, v FROM {{ source('ods', 't') }}")
    r.addModel("left_leg", "SELECT id, v FROM {{ ref('base') }} WHERE id = 1")
    r.addModel("right_leg", "SELECT id, v FROM {{ ref('base') }} WHERE id = 2")
    r.addModel("top",
      "SELECT * FROM {{ ref('left_leg') }} UNION ALL SELECT * FROM {{ ref('right_leg') }}")
    val out = r.run("top")
    assert(out.count() == 2)
    // base ran ONCE: a second materialization would have committed v=2
    assert(r.store("base").versions == Seq(1))
    // a NEW top-level invocation does re-run the DAG
    r.run("top")
    assert(r.store("base").versions == Seq(1, 2))
  }

  test("test() on a view is read-only: upstream stores stay untouched") {
    val root = freshRoot()
    val r = new SqlModelRunner(spark, root)
    r.addSource("ods", "t", Seq((1, "a")).toDF("id", "v"))
    r.addModel("base", "{{ config(materialized='table') }} SELECT id, v FROM {{ source('ods', 't') }}")
    r.addModel("vw", "SELECT id FROM {{ ref('base') }}", ModelTests(notNull = Seq("id")))
    r.run("vw")
    assert(r.store("base").versions == Seq(1))
    val checks = r.test("vw")
    assert(checks.forall(_.passed))
    // testing the view must NOT have re-materialized (written) base
    assert(r.store("base").versions == Seq(1))
  }

  test("on_schema_change='sync_all_columns' evolves the merge; default ignores; others fail fast") {
    def mk(onChange: String): (SqlModelRunner, String) = {
      val r = new SqlModelRunner(spark, freshRoot())
      val cfgStr =
        if (onChange.isEmpty) "materialized='incremental', unique_key='id'"
        else s"materialized='incremental', unique_key='id', on_schema_change='$onChange'"
      r.addModel("m", s"{{ config($cfgStr) }} SELECT * FROM {{ source('ods', 's') }}")
      (r, "m")
    }
    // sync_all_columns: the new column lands; pre-existing rows read NULL
    val (rs, _) = mk("sync_all_columns")
    rs.addSource("ods", "s", Seq((1, "a")).toDF("id", "v"))
    rs.run("m")
    rs.addSource("ods", "s", Seq((2, "b", "extra")).toDF("id", "v", "w"))
    val evolved = rs.run("m")
    assert(evolved.columns.toSeq == Seq("id", "v", "w"))
    assert(canon(evolved) == Seq(Seq("1", "a", "null"), Seq("2", "b", "extra")))
    // default (ignore): the new column is dropped, schema stays put
    val (ri, _) = mk("")
    ri.addSource("ods", "s", Seq((1, "a")).toDF("id", "v"))
    ri.run("m")
    ri.addSource("ods", "s", Seq((2, "b", "extra")).toDF("id", "v", "w"))
    val ignored = ri.run("m")
    assert(ignored.columns.toSeq == Seq("id", "v"))
    // any other value is rejected loudly instead of silently ignored
    val (rf, _) = mk("full_refresh_nonsense")
    rf.addSource("ods", "s", Seq((1, "a")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](rf.run("m"))
    assert(e.getMessage.contains("on_schema_change"))
  }

  test("runFullRefresh rebuilds an incremental model from scratch") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addModel("m",
      "{{ config(materialized='incremental', unique_key='id') }} " +
      "SELECT * FROM {{ source('ods', 's') }} " +
      "{% if is_incremental() %} WHERE id > (SELECT MAX(id) FROM {{ this }}) {% endif %}")
    r.addSource("ods", "s", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    r.run("m")
    // the source RESTATES id=1; the watermark guard hides it from an
    // incremental run, and a plain run keeps serving the stale row
    r.addSource("ods", "s", Seq((1, "a9"), (2, "b")).toDF("id", "v"))
    assert(canon(r.run("m")) == Seq(Seq("1", "a"), Seq("2", "b")))
    // full refresh recomputes without the is_incremental() guard
    assert(canon(r.runFullRefresh("m")) == Seq(Seq("1", "a9"), Seq("2", "b")))
    // and subsequent incremental runs continue from the refreshed state
    r.addSource("ods", "s", Seq((1, "a9"), (2, "b"), (3, "c")).toDF("id", "v"))
    assert(canon(r.run("m")) == Seq(Seq("1", "a9"), Seq("2", "b"), Seq("3", "c")))
  }

  test("snapshot check strategy: tracked-column changes version, untracked ones do not") {
    import java.sql.Timestamp
    def ts(d: String) = Timestamp.valueOf(d + " 00:00:00")
    val r = new SqlModelRunner(spark, freshRoot())
    r.addSnapshot("snap",
      "{{ config(strategy='check', unique_key='id', check_cols=['tier']) }} " +
      "SELECT * FROM {{ source('ods', 'c') }}")
    r.addSource("ods", "c",
      Seq((1, "gold", "x"), (2, "silver", "y")).toDF("id", "tier", "note"))
    r.runSnapshot("snap", asOf = Some(ts("2024-01-01")))
    // id=1: TRACKED tier changes; id=2: only the untracked note changes
    r.addSource("ods", "c",
      Seq((1, "platinum", "x"), (2, "silver", "y2"), (3, "bronze", "z"))
        .toDF("id", "tier", "note"))
    val out = r.runSnapshot("snap", asOf = Some(ts("2024-02-01")))
    val hist = out.collect().map(rr => (rr.getAs[Int]("id"), rr.getAs[String]("tier"),
      rr.getAs[Boolean]("is_current"))).toSet
    assert(hist == Set(
      (1, "gold", false), (1, "platinum", true),   // versioned
      (2, "silver", true),                          // untracked change: untouched
      (3, "bronze", true)))                         // new key
    // id=2 kept its ORIGINAL note — check strategy does not capture
    // untracked-column drift (dbt's contract)
    val note2 = out.filter(col("id") === 2).select("note").head().getString(0)
    assert(note2 == "y")
    // a third run with NO tracked changes commits no new versions
    val before = out.count()
    r.addSource("ods", "c",
      Seq((1, "platinum", "x9"), (2, "silver", "y9"), (3, "bronze", "z9"))
        .toDF("id", "tier", "note"))
    assert(r.runSnapshot("snap", asOf = Some(ts("2024-03-01"))).count() == before)
  }

  test("snapshot check strategy: default stamp clamps past the open version") {
    // simulate the same-millisecond / clock-regression case
    // deterministically: the open version is stamped in 2099, so a
    // wall-clock default lands BEFORE it — without the clamp, scd2's
    // cursor > valid_from filter would silently drop the new version
    val r = new SqlModelRunner(spark, freshRoot())
    r.addSnapshot("snap",
      "{{ config(strategy='check', unique_key='id', check_cols=['tier']) }} " +
      "SELECT * FROM {{ source('ods', 'c') }}")
    r.addSource("ods", "c", Seq((1, "gold")).toDF("id", "tier"))
    val future = java.sql.Timestamp.valueOf("2099-01-01 00:00:00")
    r.runSnapshot("snap", asOf = Some(future))
    r.addSource("ods", "c", Seq((1, "platinum")).toDF("id", "tier"))
    val out = r.runSnapshot("snap") // default (wall-clock) stamp, clamped
    val hist = out.collect().map(rr =>
      (rr.getAs[String]("tier"), rr.getAs[Boolean]("is_current"),
        rr.getAs[java.sql.Timestamp]("valid_from"))).toSet
    assert(hist.map(h => (h._1, h._2)) == Set(("gold", false), ("platinum", true)),
      s"regressed-clock run must still version, got $hist")
    val platFrom = hist.find(_._1 == "platinum").get._3
    assert(platFrom.getTime == future.getTime + 1, s"clamp must stamp open+1ms, got $platFrom")
  }

  test("snapshot check strategy refuses a batch with no trackable columns") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addSnapshot("snap",
      "{{ config(strategy='check', unique_key='id') }} " +
      "SELECT * FROM {{ source('ods', 'c') }}")
    r.addSource("ods", "c", Seq(Tuple1(1)).toDF("id")) // key-only batch
    val e = intercept[IllegalArgumentException](r.runSnapshot("snap"))
    assert(e.getMessage.contains("tracked column"))
  }

  test("accepted_values model test enforces the domain per run") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addModel("m", "{{ config(materialized='table') }} SELECT * FROM {{ source('ods', 's') }}",
      ModelTests(acceptedValues = Map("t" -> Seq("a", "b"))))
    r.addSource("ods", "s", Seq((1, "a"), (2, "b")).toDF("id", "t"))
    r.run("m") // in-domain: passes
    r.addSource("ods", "s", Seq((3, "zz")).toDF("id", "t"))
    val e = intercept[IllegalStateException](r.run("m"))
    assert(e.getMessage.contains("accepted_values"))
  }

  test("incremental_strategy delete+insert: batch keys replaced, duplicate batch rows kept") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addModel("m", "{{ config(materialized='incremental', unique_key='id', " +
      "incremental_strategy='delete+insert') }} SELECT * FROM {{ source('ods', 's') }}")
    r.addSource("ods", "s", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    r.run("m")
    // second batch restates id=1 with TWO rows (a correction pair a
    // keyed merge would collapse) and inserts id=3
    r.addSource("ods", "s", Seq((1, "a1"), (1, "a2"), (3, "c")).toDF("id", "v"))
    val out = r.run("m")
    assert(canon(out) == Seq(
      Seq("1", "a1"), Seq("1", "a2"), Seq("2", "b"), Seq("3", "c")))
  }

  test("incremental_strategy insert_overwrite: only touched partitions replaced") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addModel("m", "{{ config(materialized='incremental', " +
      "incremental_strategy='insert_overwrite', partition_by='day') }} " +
      "SELECT * FROM {{ source('ods', 's') }}")
    r.addSource("ods", "s",
      Seq(("d1", 1, 10), ("d1", 2, 20), ("d2", 3, 30)).toDF("day", "id", "v"))
    r.run("m")
    // the batch rewrites d1 with ONE row; d2 must be untouched
    r.addSource("ods", "s", Seq(("d1", 9, 99)).toDF("day", "id", "v"))
    val out = r.run("m")
    assert(canon(out) == Seq(Seq("d1", "9", "99"), Seq("d2", "3", "30")))
  }

  test("incremental_strategy combos are validated loudly") {
    def bad(cfgStr: String): String = {
      val r = new SqlModelRunner(spark, freshRoot())
      r.addModel("m", s"{{ config($cfgStr) }} SELECT * FROM {{ source('ods', 's') }}")
      r.addSource("ods", "s", Seq((1, "a")).toDF("id", "v"))
      intercept[IllegalArgumentException](r.run("m")).getMessage
    }
    assert(bad("materialized='incremental', incremental_strategy='insert_overwrite'")
      .contains("partition_by"))
    assert(bad("materialized='incremental', incremental_strategy='delete+insert'")
      .contains("unique_key"))
    assert(bad("materialized='incremental', unique_key='id', incremental_strategy='bogus'")
      .contains("incremental_strategy"))
  }

  test("append_new_columns keeps source-dropped columns; sync_all_columns drops them") {
    def build(onChange: String): SqlModelRunner = {
      val r = new SqlModelRunner(spark, freshRoot())
      r.addModel("m", s"{{ config(materialized='incremental', unique_key='id', " +
        s"on_schema_change='$onChange') }} SELECT * FROM {{ source('ods', 's') }}")
      r.addSource("ods", "s", Seq((1, "a", 10)).toDF("id", "v", "old"))
      r.run("m")
      // the producer DROPS 'old' and ADDS 'w'
      r.addSource("ods", "s", Seq((2, "b", "extra")).toDF("id", "v", "w"))
      r
    }
    // dbt append_new_columns: 'w' lands, 'old' survives (new rows NULL)
    val ap = build("append_new_columns").run("m")
    assert(ap.columns.toSeq == Seq("id", "v", "old", "w"))
    assert(canon(ap) == Seq(Seq("1", "a", "10", "null"), Seq("2", "b", "null", "extra")))
    // dbt sync_all_columns: schema follows the source — 'old' is dropped
    val sy = build("sync_all_columns").run("m")
    assert(sy.columns.toSeq == Seq("id", "v", "w"))
    assert(canon(sy) == Seq(Seq("1", "a", "null"), Seq("2", "b", "extra")))
  }

  test("macro args: nested calls and quoted commas survive; unbalanced parens fail loudly") {
    val m = ModelSql.parseMacros(referenceStyleMacros)
    val out = ModelSql.expandMacros(
      "SELECT {{ handle_null_numeric(CONCAT(a, ', ', b)) }} AS j", m)
    assert(out.contains("COALESCE(CONCAT(a, ', ', b), 0)"), out)
    val nested = ModelSql.expandMacros(
      "SELECT {{ clean_text_field(SUBSTR(UPPER(name), 1, 3)) }} AS s", m)
    assert(nested.contains("TRIM(REGEXP_REPLACE(SUBSTR(UPPER(name), 1, 3),"), nested)
    val e = intercept[IllegalArgumentException](
      ModelSql.expandMacros("SELECT {{ handle_null_numeric(CONCAT(a, b }} FROM t", m))
    assert(e.getMessage.contains("unbalanced"))
    // known macro, balanced parens, but never closed with '}}' — must
    // fail loudly naming the macro, not leave raw Jinja in the SQL
    val e2 = intercept[IllegalArgumentException](
      ModelSql.expandMacros("SELECT {{ handle_null_numeric(a) FROM t", m))
    assert(e2.getMessage.contains("handle_null_numeric") &&
      e2.getMessage.contains("terminated"), e2.getMessage)
  }

  test("a MetaStore-attached runner logs per-model task rows and metrics") {
    val meta = new graft.meta.MetaStore(spark,
      java.nio.file.Files.createTempDirectory("dbt-meta").toString + "/task_result")
    val r = new SqlModelRunner(spark, freshRoot(), "", Some(meta))
    r.addSource("ods", "t", Seq((1, "x")).toDF("id", "v"))
    r.addModel("base", "{{ config(materialized='table') }} SELECT id, v FROM {{ source('ods', 't') }}")
    r.addModel("vw", "SELECT id FROM {{ ref('base') }}")
    r.run("vw")
    val tasks = meta.taskResults.select("task").as[String].collect().sorted
    assert(tasks.toSeq == Seq("model.base", "model.vw"))
    assert(meta.metrics.filter(col("name") === "ti_successes").count() == 2)
  }

  test("failing dbt test aborts the run") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addSource("ods", "dup", Seq((1, "a"), (1, "b")).toDF("id", "v"))
    r.addModel("bad", "{{ config(materialized='view') }} SELECT * FROM {{ source('ods', 'dup') }}",
      ModelTests(unique = Seq("id")))
    val e = intercept[IllegalStateException](r.run("bad"))
    assert(e.getMessage.contains("unique"))
  }

  test("model cycles and missing refs are rejected") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addModel("a", "SELECT * FROM {{ ref('b') }}")
    r.addModel("b", "SELECT * FROM {{ ref('a') }}")
    val e = intercept[Exception](r.run("a"))
    assert(e.getMessage.contains("cycle"))
    val r2 = new SqlModelRunner(spark, freshRoot())
    r2.addModel("c", "SELECT * FROM {{ ref('nope') }}")
    intercept[NoSuchElementException](r2.run("c"))
  }

  test("{{ this }} outside an incremental block fails clearly on first run") {
    val r = new SqlModelRunner(spark, freshRoot())
    r.addModel("m", "{{ config(materialized='incremental') }} SELECT * FROM {{ this }}")
    val e = intercept[IllegalStateException](r.run("m"))
    assert(e.getMessage.contains("first run"))
  }
}
