package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** Out-of-engine file ingest utilities (SURVEY.md §2.1 S6/S8).
  *
  * The reference stages date-stamped files from SFTP/FTP into object
  * storage before any processing (ftp_downloader.py:41-98,
  * custom_ftp_hook.py:43-86). That step is transport, not computation —
  * the engine keeps it as a thin driver-side utility over abstract paths
  * (local fs here; the same calls target a mounted object store or an
  * SFTP-backed NIO provider in production). The date is an explicit
  * parameter, never wall-clock, so runs are reproducible and backfills
  * are just older dates.
  */
object FileTransfer {

  /** S6 — transfer one date-stamped file if it exists: the reference's
    * `…{ddMMyyyy}.xlsx` existence check + stream upload. Returns the
    * landed path, or None when the file is absent (the reference skips
    * and alerts). */
  def transferDated(srcDir: String, destDir: String, namePattern: String,
                    date: LocalDate, dateFormat: String = "ddMMyyyy"): Option[Path] = {
    val stamp = date.format(DateTimeFormatter.ofPattern(dateFormat))
    val name = namePattern.replace("{date}", stamp)
    val src = Paths.get(srcDir, name)
    if (!Files.exists(src)) None
    else {
      Files.createDirectories(Paths.get(destDir))
      Some(Files.copy(src, Paths.get(destDir, name), StandardCopyOption.REPLACE_EXISTING))
    }
  }

  /** S8 — T-minus-N directory pull: list the remote dir, keep files whose
    * name contains the T-N date stamp, clean the local dir, copy matches
    * (custom_ftp_hook.py:43-86). Returns landed file names. */
  def downloadTMinus(srcDir: String, destDir: String, runDate: LocalDate,
                     tMinus: Int = 1, dateFormat: String = "yyyyMMdd"): Seq[String] = {
    val stamp = runDate.minusDays(tMinus).format(DateTimeFormatter.ofPattern(dateFormat))
    val dest = Paths.get(destDir)
    if (Files.exists(dest))
      listFiles(dest).filter(Files.isRegularFile(_)).foreach(Files.delete)
    Files.createDirectories(dest)
    val srcP = Paths.get(srcDir)
    if (!Files.exists(srcP)) Seq.empty
    else listFiles(srcP)
      .filter(p => p.getFileName.toString.contains(stamp))
      .map { p =>
        Files.copy(p, dest.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
        p.getFileName.toString
      }
  }

  /** Files.list streams hold a directory handle — drain and close. */
  private def listFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }
}
