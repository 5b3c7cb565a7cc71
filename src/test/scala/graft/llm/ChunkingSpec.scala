package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, n: Int): (Long, String) =
    (id, (1 to n).map(i => s"w$i").mkString(" "))

  test("chunkByTokens: layout, overlap, and short-final-window contract") {
    // 10 tokens, chunk=4, overlap=1 → stride 3 → ceil((10-1)/3)=3 chunks
    val df = Seq(doc(1L, 10)).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, chunkTokens = 4, overlapTokens = 1)
      .orderBy("chunk_index")
      .select("chunk_index", "token_start", "n_tokens", "chunk_text")
      .as[(Int, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (0, 0, 4, "w1 w2 w3 w4"),
      (1, 3, 4, "w4 w5 w6 w7"),
      (2, 6, 4, "w7 w8 w9 w10")))
  }

  test("chunkByTokens: every token is covered; de-overlapped concat rebuilds the doc") {
    val docs = Seq(doc(1L, 1), doc(2L, 64), doc(3L, 65), doc(4L, 200), doc(5L, 1000))
      .toDF("doc_id", "text")
    val chunked = Chunking.chunkByTokens(docs, chunkTokens = 64, overlapTokens = 16)
    val stride = 64 - 16
    // reconstruction: chunk 0 whole, later chunks minus their 16-token
    // overlap prefix, concatenated in order == the original token stream
    // collect_list order isn't guaranteed — sort the (index, part) structs
    val rebuilt = chunked
      .select(col("doc_id"), col("chunk_index"),
        when(col("chunk_index") === 0, col("chunk_text"))
          .otherwise(array_join(slice(split(col("chunk_text"), " "), 17, 64), " ")).as("part"))
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("chunk_index"), col("part")))),
          x => x.getField("part")), " ").as("rebuilt"))
    val joined = docs.join(rebuilt, "doc_id")
    assert(joined.where(col("text") =!= col("rebuilt")).count() == 0)
    // chunk counts: 1-token and 64-token docs → 1 chunk; 65 → ceil(49/48)+... = 2
    val counts = chunked.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts(1L) == 1 && counts(2L) == 1)
    assert(counts(3L) == math.ceil((65 - 16).toDouble / stride).toLong)
    assert(counts(5L) == math.ceil((1000 - 16).toDouble / stride).toLong)
  }

  test("chunkByTokens: empty / whitespace / NULL docs emit no chunks; zero overlap partitions exactly") {
    val df = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]), (4L, "a b c d e"))
      .toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, chunkTokens = 2, overlapTokens = 0)
    assert(out.select("doc_id").distinct().as[Long].collect().toSeq == Seq(4L))
    val texts = out.orderBy("chunk_index").select("chunk_text").as[String].collect().toSeq
    assert(texts == Seq("a b", "c d", "e"))
  }

  test("chunkByChars: offsets clamp at the end and rebuild the text") {
    val df = Seq((1L, "abcdefghij"), (2L, "xy")).toDF("doc_id", "text")
    val out = Chunking.chunkByChars(df, chunkChars = 4, overlapChars = 2)
      .orderBy("doc_id", "chunk_index")
      .select("doc_id", "chunk_index", "char_start", "n_chars", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    // 10 chars, chunk=4, stride=2 → ceil((10-2)/2)=4 chunks
    assert(out == Seq(
      (1L, 0, 0, 4, "abcd"), (1L, 1, 2, 4, "cdef"),
      (1L, 2, 4, 4, "efgh"), (1L, 3, 6, 4, "ghij"),
      (2L, 0, 0, 2, "xy")))
  }

  test("chunkByChars works on a column name that needs quoting") {
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "doc text")
    val out = Chunking.chunkByChars(df, textCol = "doc text",
        chunkChars = 4, overlapChars = 2)
      .orderBy("chunk_index").select("chunk_text").as[String].collect().toSeq
    assert(out == Seq("abcd", "cdef", "efgh", "ghij"))
  }

  test("chunkByTokens stays a pure map stage: no shuffle in the plan") {
    val df = Seq(doc(1L, 100)).toDF("doc_id", "text")
    val plan = Chunking.chunkByTokens(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
