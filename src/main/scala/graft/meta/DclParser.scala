package graft.meta

/** DCL parsing/replay — the reference's dcl_parser
  * (/root/reference/dt-common/src/meta/dcl_meta/dcl_parser.rs): CREATE/
  * ALTER/DROP USER, GRANT, REVOKE, SET PASSWORD, modeled at the level the
  * pipeline needs (filter by type, replay verbatim on the target).
  */
object DclParser {

  sealed trait DclStatement { def dclType: String; def render: String }
  final case class CreateUser(user: String, rest: String)
      extends DclStatement {
    val dclType = "create_user"
    def render = s"CREATE USER $user$rest"
  }
  final case class AlterUser(user: String, rest: String)
      extends DclStatement {
    val dclType = "alter_user"
    def render = s"ALTER USER $user$rest"
  }
  final case class DropUser(user: String) extends DclStatement {
    val dclType = "drop_user"
    def render = s"DROP USER $user"
  }
  final case class Grant(privileges: String, on: String, to: String)
      extends DclStatement {
    val dclType = "grant"
    def render = s"GRANT $privileges ON $on TO $to"
  }
  final case class Revoke(privileges: String, on: String, from: String)
      extends DclStatement {
    val dclType = "revoke"
    def render = s"REVOKE $privileges ON $on FROM $from"
  }
  final case class RawDcl(sql: String) extends DclStatement {
    val dclType = "raw"
    def render = sql
  }

  private def re(p: String) = java.util.regex.Pattern
    .compile(p, java.util.regex.Pattern.CASE_INSENSITIVE)

  private val createUserRe =
    re("""^\s*CREATE\s+USER\s+(\S+)(.*)$""")
  private val alterUserRe = re("""^\s*ALTER\s+USER\s+(\S+)(.*)$""")
  private val dropUserRe = re("""^\s*DROP\s+USER\s+(\S+)\s*$""")
  private val grantRe =
    re("""^\s*GRANT\s+(.+?)\s+ON\s+(.+?)\s+TO\s+(.+?)\s*$""")
  private val revokeRe =
    re("""^\s*REVOKE\s+(.+?)\s+ON\s+(.+?)\s+FROM\s+(.+?)\s*$""")

  /** Route a GRANT/REVOKE object target through the table router: the
    * ON clause's `db.tb` / `db.*` rewrites like any replicated table
    * address; `*.*`, routine grants, and user statements pass verbatim.
    * Quoting (backticks/double quotes) survives around the rewritten
    * parts.
    */
  def route(stmt: DclStatement,
      router: graft.operators.Router): DclStatement = stmt match {
    case g: Grant => g.copy(on = routeOn(g.on, router))
    case r: Revoke => r.copy(on = routeOn(r.on, router))
    case other => other
  }

  private val onRe = re(
    """^\s*(TABLE\s+)?([`"]?)([^`".*]+)\2\.(([`"]?)([^`".*]+)\5|\*)\s*$""")

  private def routeOn(on: String,
      router: graft.operators.Router): String = {
    val m = onRe.matcher(on)
    if (!m.matches()) return on // *.*, FUNCTION/PROCEDURE, single name
    val tablePrefix = Option(m.group(1)).getOrElse("")
    val quote = m.group(2)
    val schema = m.group(3)
    if (m.group(4) == "*") {
      val (ds, _) = router.routeTable(schema, "*")
      s"$tablePrefix$quote$ds$quote.*"
    } else {
      val tq = m.group(5)
      val (ds, dt) = router.routeTable(schema, m.group(6))
      s"$tablePrefix$quote$ds$quote.$tq$dt$tq"
    }
  }

  def parse(sql: String): DclStatement = {
    val s = sql.trim.stripSuffix(";")
    var m = createUserRe.matcher(s)
    if (m.matches()) return CreateUser(m.group(1), m.group(2))
    m = alterUserRe.matcher(s)
    if (m.matches()) return AlterUser(m.group(1), m.group(2))
    m = dropUserRe.matcher(s)
    if (m.matches()) return DropUser(m.group(1))
    m = grantRe.matcher(s)
    if (m.matches()) return Grant(m.group(1), m.group(2), m.group(3))
    m = revokeRe.matcher(s)
    if (m.matches()) return Revoke(m.group(1), m.group(2), m.group(3))
    RawDcl(s)
  }
}
