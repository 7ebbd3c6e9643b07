package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkByTokens: coverage, overlap, no chunk inside its " +
    "predecessor, short doc single chunk, empty doc none") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than chunk
      (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text",
      chunkTokens = 4, overlapTokens = 1)
      .collect().groupBy(_.getLong(0))
    // doc 1: stride 3 → ceil((10−1)/3) = 3 chunks at 0/3/6
    val c1 = out(1L).sortBy(_.getAs[Long]("chunk_id"))
    assert(c1.map(_.getAs[Long]("token_start")).toSeq == Seq(0L, 3L, 6L))
    assert(c1.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L))
    assert(c1.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    // consecutive chunks share exactly the 1-token overlap; the last
    // token is covered; a 4th chunk (start 9, pure overlap) is NOT cut
    assert(out(2L).map(r => (r.getAs[Long]("n_tokens"),
      r.getAs[String]("chunk_text"))).toSeq == Seq((2L, "a b")))
    assert(!out.contains(3L) && !out.contains(4L))
  }

  test("chunkByTokens: zero overlap partitions exactly; ragged tail") {
    val df = Seq((1L, (1 to 7).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", 3, 0)
      .collect().sortBy(_.getAs[Long]("chunk_id"))
    assert(out.map(_.getAs[Long]("token_start")).toSeq == Seq(0L, 3L, 6L))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(3L, 3L, 1L))
    assert(out.last.getAs[String]("chunk_text") == "w7")
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "doc_id", "text", 3, 3)
    }
  }
}
