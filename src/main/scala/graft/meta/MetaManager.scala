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

  /** Schema evolution: apply typed ALTER actions to the cached meta IN
    * PLACE instead of blanket-invalidating — the upgrade over the
    * reference's invalidate-and-refetch, possible because
    * [[AlterParser]] gives the actions structure. Returns true when the
    * cache now reflects the post-DDL schema (evolved, or nothing was
    * cached); false when an action is out of model — then the entry is
    * invalidated and the next access refetches (the safe fallback).
    */
  def evolve(schema: String, tb: String,
      actions: Seq[AlterParser.AlterAction]): Boolean = {
    import AlterParser._
    import org.apache.spark.sql.types.StructField
    val key = (schema, tb)
    val cur = cache.get(key)
    if (cur == null) return true
    def place(fields: Seq[StructField], f: StructField, pos: Position)
        : Seq[StructField] = pos match {
      case DefaultPos => fields :+ f
      case First => f +: fields
      case After(c) =>
        val i = fields.indexWhere(_.name == c)
        if (i < 0) fields :+ f
        else (fields.take(i + 1) :+ f) ++ fields.drop(i + 1)
    }
    var meta = cur
    val ok = actions.forall {
      case AddColumn(name, tpe, constraints, pos) =>
        val f = StructField(name, TypeMapper.mysqlToSpark(tpe),
          nullable = !constraints.toLowerCase.contains("not null"))
        meta = meta.copy(
          structType = StructType(
            place(meta.structType.fields.toSeq.filterNot(_.name == name),
              f, pos)),
          originTypes = meta.originTypes + (name -> tpe))
        true
      case DropColumn(name) =>
        meta = meta.copy(
          structType = StructType(
            meta.structType.fields.toSeq.filterNot(_.name == name)),
          idCols = meta.idCols.filterNot(_ == name),
          orderCols = meta.orderCols.filterNot(_ == name),
          partitionCol = meta.partitionCol.filterNot(_ == name),
          originTypes = meta.originTypes - name)
        true
      case ModifyColumn(name, tpe, constraints, pos) =>
        meta.structType.fields.find(_.name == name) match {
          case None => false
          case Some(_) =>
            val f = StructField(name, TypeMapper.mysqlToSpark(tpe),
              nullable = !constraints.toLowerCase.contains("not null"))
            val without = meta.structType.fields.toSeq
              .filterNot(_.name == name)
            val fields = pos match {
              case DefaultPos => meta.structType.fields.toSeq
                .map(x => if (x.name == name) f else x)
              case p => place(without, f, p)
            }
            meta = meta.copy(structType = StructType(fields),
              originTypes = meta.originTypes + (name -> tpe))
            true
        }
      case ChangeColumn(oldName, newName, tpe, constraints, pos) =>
        meta.structType.fields.find(_.name == oldName) match {
          case None => false
          case Some(_) =>
            val f = StructField(newName, TypeMapper.mysqlToSpark(tpe),
              nullable = !constraints.toLowerCase.contains("not null"))
            val fields = pos match {
              case DefaultPos => meta.structType.fields.toSeq
                .map(x => if (x.name == oldName) f else x)
              case p => place(meta.structType.fields.toSeq
                .filterNot(_.name == oldName), f, p)
            }
            meta = meta.copy(structType = StructType(fields),
              idCols = meta.idCols.map(c =>
                if (c == oldName) newName else c),
              orderCols = meta.orderCols.map(c =>
                if (c == oldName) newName else c),
              partitionCol = meta.partitionCol.map(c =>
                if (c == oldName) newName else c),
              originTypes = meta.originTypes - oldName + (newName -> tpe))
            true
        }
      case RenameColumn(oldName, newName) =>
        meta.structType.fields.find(_.name == oldName) match {
          case None => false
          case Some(_) =>
            meta = meta.copy(
              structType = StructType(meta.structType.fields.toSeq
                .map(x => if (x.name == oldName)
                  x.copy(name = newName) else x)),
              idCols = meta.idCols.map(c =>
                if (c == oldName) newName else c),
              orderCols = meta.orderCols.map(c =>
                if (c == oldName) newName else c),
              partitionCol = meta.partitionCol.map(c =>
                if (c == oldName) newName else c),
              originTypes = (meta.originTypes - oldName) ++
                meta.originTypes.get(oldName).map(newName -> _))
            true
        }
      case RenameTo(newDb, newTb) =>
        meta = meta.copy(schema = newDb.getOrElse(schema), tb = newTb)
        true
      case _: RawAction => false
    }
    cache.remove(key)
    if (ok) { cache.put((meta.schema, meta.tb), meta); true }
    else { cache.remove((meta.schema, meta.tb)); false }
  }

  def invalidateAll(): Unit = cache.clear()

  def cachedTables: Set[(String, String)] = {
    import scala.jdk.CollectionConverters._
    cache.keySet().asScala.toSet
  }
}
