package graft.meta

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.types.StructType

/** Per-table metadata service — the reference's meta managers
  * (/root/reference/dt-common/src/meta/mysql/mysql_meta_manager.rs,
  * rdb_meta_manager.rs): lazily fetched, cached per (schema, tb),
  * invalidated on DDL.
  *
  * `originType` keeps the source-native type string per column
  * (the reference's col_origin_type_map) in StructField metadata terms.
  */
object MetaManager {

  final case class TableMeta(
      schema: String,
      tb: String,
      structType: StructType,
      idCols: Seq[String],
      orderCols: Seq[String],
      partitionCol: Option[String],
      originTypes: Map[String, String] = Map.empty) {
    require(idCols.forall(structType.fieldNames.contains),
      s"id cols $idCols not all present in ${structType.fieldNames.toSeq}")
  }

  /** Pluggable catalog fetcher (JDBC metadata in production, parquet
    * schema here).
    */
  trait MetaFetcher {
    def fetch(schema: String, tb: String): TableMeta
  }
}

final class MetaManager(fetcher: MetaManager.MetaFetcher) {
  import MetaManager._

  private val cache = new ConcurrentHashMap[(String, String), TableMeta]()

  def get(schema: String, tb: String): TableMeta =
    cache.computeIfAbsent((schema, tb),
      { case (s, t) => fetcher.fetch(s, t) })

  /** DDL barrier hook: drop the cached meta so the next access refetches
    * (reference: refresh_meta after sink_ddl,
    * base_pipeline.rs:268-305).
    */
  def invalidate(schema: String, tb: String): Unit =
    cache.remove((schema, tb))

  def invalidateAll(): Unit = cache.clear()

  def cachedTables: Set[(String, String)] = {
    import scala.jdk.CollectionConverters._
    cache.keySet().asScala.toSet
  }
}
