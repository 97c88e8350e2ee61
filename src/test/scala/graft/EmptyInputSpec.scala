package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input totality, catalog-wide: at 100 TB a source, split, or
  * partition being empty is an operating condition, not an anomaly — a
  * filter that matches nothing, a new tenant with no history, a corpus
  * drop that failed upstream. Every catalog entry must return an empty
  * (or degenerate-but-defined) frame on a fully empty corpus instead of
  * throwing from a driver-side head()/argmax/sketch-build. The crash
  * sites this sweep originally found (BPE's pair argmax, PageRank's
  * node-count guard, the Bloom build over zero keys) are fixed and held
  * here so new entries can't regress the contract.
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def fixture(rows: Int): String = {
    val out = java.nio.file.Files.createTempDirectory(s"graft-deg$rows").toString
    tables.foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet").limit(rows)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private def sweep(dir: String): Seq[String] =
    graft.queries.Catalog.all.flatMap { e =>
      val r =
        try { e.build(spark, dir).count(); None }
        catch {
          case ex: Throwable =>
            val msg = Option(ex.getMessage).getOrElse("")
              .linesIterator.toSeq.headOption.getOrElse("").take(120)
            Some(s"${e.name}: ${ex.getClass.getSimpleName} $msg")
        }
      SessionHygiene.dropEntryState(spark)
      r
    }

  test("every catalog entry is total on an empty corpus") {
    val failures = sweep(fixture(0))
    assert(failures.isEmpty,
      s"${failures.size} entries throw on empty input:\n${failures.mkString("\n")}")
  }

  test("every catalog entry is total on single-row tables") {
    // One row per table breaks referential integrity (joins go empty) and
    // degenerates every per-group statistic to n=1 — the sweep that found
    // split_token_divergence dividing by an empty split's token total.
    val failures = sweep(fixture(1))
    assert(failures.isEmpty,
      s"${failures.size} entries throw on single-row input:\n${failures.mkString("\n")}")
  }
}
