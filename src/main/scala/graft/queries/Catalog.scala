package graft.queries

/** The full query surface exposed through SparkEntry, in fixed order (Bench
  * and Verify iterate this order): the reference engine's catalog (SURVEY
  * §2) plus the training-data pipeline operators (dedup / text analysis /
  * language ID / fingerprinting; similarity and multimodal append as they
  * land).
  */
object Catalog {
  def all: Seq[CatalogEntry] =
    ReferenceCatalog.all ++ PipelineCatalog.all ++ TrainPrepCatalog.all ++
      NearDupCatalog.all ++ EmbeddingCatalog.all ++ MultimodalCatalog.all ++
      SensorCatalog.all ++ SqlCatalog.all ++ JoinCatalog.all ++ TpchExtCatalog.all ++
      OlapCatalog.all ++ ScaleCatalog.all
}
