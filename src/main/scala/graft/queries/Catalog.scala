package graft.queries

/** The full query surface exposed through SparkEntry: the reference
  * engine's catalog (SURVEY §2) plus the large-scale training-data pipeline
  * operators (dedup / similarity / text analysis / multimodal).
  */
object Catalog {
  def all: Seq[CatalogEntry] = ReferenceCatalog.all
}
