package graft.struct

/** Conflict-policy execution of rendered DDL — the reference's
  * `base_struct_sinker.rs::execute_ddl_sqls_in_one_query` (lines
  * 24-50) and the `[meta_center] ddl_conflict_policy` contract
  * (`config/meta_center_config.rs`): when executing a DDL statement
  * against the sink fails,
  *
  *  - `interrupt` (the default) aborts the task with that error;
  *  - `ignore` logs it and continues with the next statement (used
  *    when the target already has some of the structures — re-running
  *    a struct migration over a half-created schema).
  *
  * The executor is pluggable (a live engine connection in production,
  * a recording stub in specs) — same seam as DdlAwarePipeline.DdlSink.
  */
object StructApplier {

  sealed trait ConflictPolicy
  case object Interrupt extends ConflictPolicy
  case object Ignore extends ConflictPolicy

  /** INI string → policy; unknown values fall back to the reference's
    * default (`ConflictPolicyEnum::default` = Interrupt).
    */
  def parsePolicy(s: String): ConflictPolicy = s.trim.toLowerCase match {
    case "ignore" => Ignore
    case _ => Interrupt
  }

  /** What one apply pass did: statements that executed, and (under
    * `ignore`) the ones that failed with their error text — the
    * reference's `log_error!` line, surfaced as data.
    */
  final case class ApplyReport(executed: Seq[String],
      ignoredErrors: Seq[(String, String)])

  /** Execute statements in order under the policy. Under `interrupt`
    * the first failure propagates (statements after it never run);
    * under `ignore` every statement is attempted.
    */
  def apply(stmts: Seq[String], policy: ConflictPolicy,
      exec: String => Unit): ApplyReport = {
    val executed = Seq.newBuilder[String]
    val ignored = Seq.newBuilder[(String, String)]
    stmts.foreach { sql =>
      try {
        exec(sql)
        executed += sql
      } catch {
        case e: Exception => policy match {
          case Interrupt => throw e
          case Ignore => ignored += sql -> e.getMessage
        }
      }
    }
    ApplyReport(executed.result(), ignored.result())
  }
}
