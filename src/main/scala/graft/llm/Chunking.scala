package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: split long documents
  * into overlapping fixed-token windows (the standard pre-tokenization
  * step before embedding or packing a corpus whose documents exceed the
  * model context).
  *
  * Pure Column arithmetic — tokenize once, `sequence` + `slice` per
  * window, no UDF — so the whole operator stays inside whole-stage
  * codegen and the only data movement is the row explosion itself (each
  * output chunk carries ~`chunkTokens/stride` × input bytes; there is no
  * shuffle — chunking is embarrassingly parallel over input partitions,
  * which is what lets it run over 100 TB as a pure map stage).
  *
  * Window layout: chunk `i` covers tokens `[i·stride, i·stride+chunk)`
  * with `stride = chunkTokens − overlapTokens`; the final window is
  * allowed to be short (no padding, nothing dropped). A document with at
  * most `chunkTokens` tokens yields exactly one chunk. Tokenization is
  * the engine-neutral whitespace split shared with
  * [[TextAnalysis.tokenCount]], so chunk boundaries are replayable
  * outside Spark (the DuckDB oracle replays them exactly).
  */
object Chunking {

  /** Token-window chunks of `textCol`, keyed by `idCols`.
    *
    * Output: `idCols…, chunk_index (int, 0-based), token_start (int,
    * 0-based offset of the chunk's first token), n_tokens (int),
    * chunk_text (string — tokens re-joined with single spaces)`.
    * Documents with no tokens (NULL / empty / whitespace-only) produce
    * no chunks.
    */
  def chunkByTokens(docs: DataFrame, textCol: String = "text",
                    idCols: Seq[String] = Seq("doc_id"),
                    chunkTokens: Int = 64, overlapTokens: Int = 16): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens of $chunkTokens")
    val stride = chunkTokens - overlapTokens
    val ids = idCols.map(col)
    val chunkIdx = col("chunk_index")
    val piece: Column = slice(col("__toks"), chunkIdx * stride + 1, lit(chunkTokens))
    docs
      .where(length(trim(coalesce(col(textCol), lit("")))) > 0)
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__n", size(col("__toks")))
      // ceil((n - overlap) / stride) chunks, floored at 1 — `div` keeps
      // the arithmetic integral (bit-identical to the oracle's `//`)
      .withColumn("__nc", when(col("__n") <= chunkTokens, lit(1)).otherwise(
        expr(s"(__n - $overlapTokens + ${stride - 1}) div $stride").cast("int")))
      .withColumn("chunk_index", explode(sequence(lit(0), col("__nc") - 1)))
      .select(ids ++ Seq(
        chunkIdx.cast("int").as("chunk_index"),
        (chunkIdx * stride).cast("int").as("token_start"),
        size(piece).cast("int").as("n_tokens"),
        array_join(piece, " ").as("chunk_text")): _*)
  }

  /** Character-window chunks — the cheap variant for byte-budgeted
    * consumers (no tokenization at all; boundaries may split words).
    * Same layout contract as [[chunkByTokens]] over characters:
    * `chunk_index, char_start (0-based), n_chars, chunk_text`. */
  def chunkByChars(docs: DataFrame, textCol: String = "text",
                   idCols: Seq[String] = Seq("doc_id"),
                   chunkChars: Int = 512, overlapChars: Int = 64): DataFrame = {
    require(chunkChars > 0, s"chunkChars must be positive, got $chunkChars")
    require(overlapChars >= 0 && overlapChars < chunkChars,
      s"overlapChars must be in [0, chunkChars), got $overlapChars of $chunkChars")
    val stride = chunkChars - overlapChars
    val ids = idCols.map(col)
    val chunkIdx = col("chunk_index")
    docs
      .where(length(coalesce(col(textCol), lit(""))) > 0)
      .withColumn("__n", length(col(textCol)))
      .withColumn("__nc", when(col("__n") <= chunkChars, lit(1)).otherwise(
        expr(s"(__n - $overlapChars + ${stride - 1}) div $stride").cast("int")))
      .withColumn("chunk_index", explode(sequence(lit(0), col("__nc") - 1)))
      .select(ids ++ Seq(
        chunkIdx.cast("int").as("chunk_index"),
        (chunkIdx * stride).cast("int").as("char_start"),
        least(col("__n") - chunkIdx * stride, lit(chunkChars)).cast("int").as("n_chars"),
        // substr(pos, len) is 1-based and clamps at the end; Column API
        // (not an expr interpolation) so a textCol needing quoting works
        col(textCol).substr((chunkIdx * stride + 1).cast("int"), lit(chunkChars))
          .as("chunk_text")): _*)
  }
}
