package graft.queries

/** The full query surface exposed through SparkEntry, in fixed order (Bench
  * and Verify iterate this order): currently the reference engine's catalog
  * (SURVEY §2). Pipeline catalogs (dedup / similarity / text analysis /
  * multimodal) append here as they land.
  */
object Catalog {
  def all: Seq[CatalogEntry] = ReferenceCatalog.all
}
