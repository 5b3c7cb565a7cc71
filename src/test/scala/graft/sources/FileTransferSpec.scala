package graft.sources

import graft.pipeline.RunConfig
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** S6/S8 file staging + V5 run gating — driver-side, no Spark needed. */
class FileTransferSpec extends AnyFunSuite {

  test("S6 transferDated: lands the stamped file, None when absent") {
    val src = Files.createTempDirectory("ft-src").toString
    val dst = Files.createTempDirectory("ft-dst").toString + "/landing"
    Files.writeString(Paths.get(src, "pns_detail_15012024.csv"), "x")
    val d = LocalDate.of(2024, 1, 15)
    assert(FileTransfer.transferDated(src, dst, "pns_detail_{date}.csv", d).isDefined)
    assert(Files.exists(Paths.get(dst, "pns_detail_15012024.csv")))
    assert(FileTransfer.transferDated(src, dst, "pns_detail_{date}.csv", d.plusDays(1)).isEmpty)
  }

  test("S8 downloadTMinus: T-1 stamped files only, destination cleaned") {
    val src = Files.createTempDirectory("ft2-src").toString
    val dst = Files.createTempDirectory("ft2-dst").toString + "/in"
    Files.writeString(Paths.get(src, "rpt_20240114_a.csv"), "t1a")
    Files.writeString(Paths.get(src, "rpt_20240114_b.csv"), "t1b")
    Files.writeString(Paths.get(src, "rpt_20240113_old.csv"), "t2")
    Files.createDirectories(Paths.get(dst))
    Files.writeString(Paths.get(dst, "stale.csv"), "old-run")
    val got = FileTransfer.downloadTMinus(src, dst, LocalDate.of(2024, 1, 15))
    assert(got.sorted == Seq("rpt_20240114_a.csv", "rpt_20240114_b.csv"))
    assert(!Files.exists(Paths.get(dst, "stale.csv")))
    assert(!Files.exists(Paths.get(dst, "rpt_20240113_old.csv")))
  }

  test("V5 RunConfig gating and manual window override") {
    val all = RunConfig()
    assert(all.tableEnabled("bccp.item"))
    val subset = RunConfig(tables = Some(Seq("bccp.item")))
    assert(subset.tableEnabled("bccp.item") && !subset.tableEnabled("bccp.delivery"))
    val manual = RunConfig(window = Some(("2024-01-01", "2024-01-02")), manual = true)
    assert(manual.effectiveWindow("sched-a", "sched-b") == (("2024-01-01", "2024-01-02")))
    assert(all.effectiveWindow("sched-a", "sched-b") == (("sched-a", "sched-b")))
  }
}
