package graft.transform

import org.apache.spark.sql.Dataset

import graft.model.{ChangeEvent, RowKind}

/** The user-script surface — the reference's only general computation hook
  * is a per-row Lua script with globals (before, after, schema, tb,
  * row_type) that may mutate values/names or drop the row by blanking
  * row_type (/root/reference/dt-pipeline/src/lua_processor.rs:16-57).
  *
  * Spark-native equivalent: a serializable `ChangeEvent => Option[...]`
  * function applied with `flatMap` over a typed Dataset. Row-at-a-time
  * semantics are inherent to the contract, so this is deliberately NOT a
  * Catalyst expression — column-level transforms should use the DataFrame
  * API instead and keep whole-stage codegen.
  */
trait RowTransform extends Serializable {
  /** Return None to drop the event. */
  def apply(e: ChangeEvent): Option[ChangeEvent]
}

object RowTransform {

  /** Build from the reference's mutate-globals contract: the function edits
    * the event; returning rowType == RowKind.Dropped drops it.
    */
  def fromMutator(f: ChangeEvent => ChangeEvent): RowTransform =
    new RowTransform {
      def apply(e: ChangeEvent): Option[ChangeEvent] = {
        val out = f(e)
        if (out.rowType == RowKind.Dropped) None else Some(out)
      }
    }

  /** Rename a column in both images (a common Lua-script use). */
  def renameColumn(from: String, to: String): RowTransform =
    fromMutator { e =>
      def ren(m: Map[String, String]) =
        m.get(from).fold(m)(v => m - from + (to -> v))
      e.copy(before = ren(e.before), after = ren(e.after))
    }

  /** Set/overwrite a column value in the after image. */
  def setValue(colName: String, value: String): RowTransform =
    fromMutator(e => e.copy(after =
      if (e.after.isEmpty) e.after else e.after + (colName -> value)))

  /** Drop events matching a predicate. */
  def dropIf(p: ChangeEvent => Boolean): RowTransform =
    new RowTransform {
      def apply(e: ChangeEvent): Option[ChangeEvent] =
        if (p(e)) None else Some(e)
    }

  /** Chain transforms left-to-right; the first drop short-circuits. */
  def chain(ts: Seq[RowTransform]): RowTransform =
    new RowTransform {
      def apply(e: ChangeEvent): Option[ChangeEvent] =
        ts.foldLeft(Option(e))((acc, t) => acc.flatMap(t.apply))
    }

  /** Apply over a typed stream. */
  def applyAll(ds: Dataset[ChangeEvent], ts: Seq[RowTransform])
      : Dataset[ChangeEvent] = {
    val t = chain(ts)
    ds.flatMap(e => t(e))(ds.encoder)
  }
}
