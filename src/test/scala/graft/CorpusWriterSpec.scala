package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusWriter

/** CorpusWriter: lossless roundtrip, source-partitioned directory layout,
  * bounded file counts (no #tasks × #sources explosion), per-file doc_id
  * sortedness, and the maxRecordsPerFile shard bound.
  */
class CorpusWriterSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private def listParquet(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toSeq

  test("roundtrip is lossless and the layout is source-partitioned") {
    val docs = Tables.documents(spark, sf0001)
    val out = Files.createTempDirectory("corpus_writer").toString
    CorpusWriter.write(docs, out, numShards = 8)

    val dirs = Files.list(java.nio.file.Paths.get(out)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("source=")), s"layout: $dirs")

    val back = spark.read.parquet(out)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val a = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(back.collect().map(_.toSeq).toSet == a, "roundtrip lost or changed rows")
  }

  test("range layout bounds file count; files are internally doc_id-sorted") {
    val docs = Tables.documents(spark, sf0001)
    val nSources = docs.select("source").distinct().count().toInt
    val shards = 8
    val out = Files.createTempDirectory("corpus_writer_files")
    CorpusWriter.write(docs, out.toString, numShards = shards)

    val files = listParquet(out)
    // Each range task holds a contiguous (source, doc_id) slice, so it
    // writes at most 2 partition dirs: total files ≤ shards + sources,
    // NOT shards × sources.
    assert(files.size <= shards + nSources,
      s"${files.size} files for $shards shards × $nSources sources — small-file explosion")
    files.foreach { f =>
      val ids = spark.read.parquet(f.toString).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"file $f not sorted by doc_id")
    }
  }

  test("maxRecordsPerFile splits oversized shards") {
    val docs = Tables.documents(spark, sf0001)
    val total = docs.count()
    val out = Files.createTempDirectory("corpus_writer_cap")
    CorpusWriter.write(docs, out.toString, numShards = 2, maxRecordsPerFile = 50)
    val files = listParquet(out)
    assert(files.size >= (total / 50).toInt,
      s"expected >= ${total / 50} capped files, got ${files.size}")
    files.foreach { f =>
      val n = spark.read.parquet(f.toString).count()
      assert(n <= 50, s"file $f has $n rows > cap 50")
    }
  }
}
