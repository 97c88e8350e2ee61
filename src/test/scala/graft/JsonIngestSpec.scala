package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonIngest

/** JsonIngest: clean/quarantine split, reject lines preserved verbatim,
  * schema respected, no exception on malformed input.
  */
class JsonIngestSpec extends AnyFunSuite {
  import TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("malformed lines quarantine instead of failing the read") {
    val dir = Files.createTempDirectory("json_ingest")
    val f = dir.resolve("part-0.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """{"doc_id": 3, "text": "truncated...""",
      """not json at all""",
      """{"doc_id": 4, "text": "ok again", "lang": "en"}"""))
    val (clean, bad) = JsonIngest.readSplit(spark, dir.toString, schema)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"))
    val rows = clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "hello world"), (2L, "bonjour"), (4L, "ok again")))
    val rejects = bad.collect().map(_.getString(0)).toSet
    assert(rejects.size == 2 && rejects.exists(_.contains("truncated")) &&
      rejects.contains("not json at all"), rejects.mkString("|"))
  }

  test("type-violating values quarantine too (doc_id as string)") {
    val dir = Files.createTempDirectory("json_ingest_types")
    Files.write(dir.resolve("x.jsonl"), java.util.Arrays.asList(
      """{"doc_id": "NOT_A_NUMBER", "text": "t", "lang": "en"}""",
      """{"doc_id": 7, "text": "fine", "lang": "de"}"""))
    val (clean, bad) = JsonIngest.readSplit(spark, dir.toString, schema)
    assert(clean.count() == 1 && bad.count() == 1)
  }
}
