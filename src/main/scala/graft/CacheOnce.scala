package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** `.cacheOnce()` — `cache()` that is a no-op when the plan is already
  * registered with the CacheManager.
  *
  * Catalog entries cache interior frames that feed ≥2 plan branches and
  * rely on harness teardown ([[SessionHygiene.dropEntryState]]) between
  * entries. Inside ONE session, though, two entries (or an entry and its
  * ground-truth companion in a spec) legitimately cache the same lineage
  * — e.g. the bigram index feeds several near-dup entries — and Spark's
  * `cache()` then logs `WARN CacheManager: Asked to cache already cached
  * data` while reusing the registration anyway. The reuse is exactly
  * what we want; the warning is noise that buries real ones (the r14
  * "What's wrong" #3). `cacheOnce()` performs the same CacheManager
  * lookup `cache()` would and simply skips the re-registration, so the
  * semantics (shared plan-keyed cache, caller unpersists its handle) are
  * bit-identical to `cache()` minus the log line.
  */
object CacheOnce {
  implicit final class CacheOnceOps(private val df: DataFrame) extends AnyVal {
    def cacheOnce(): DataFrame = {
      if (df.storageLevel == StorageLevel.NONE) df.cache()
      df
    }
  }
}
