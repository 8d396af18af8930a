package graft.plans

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.functions.{col, expr}

/** SQL authorization: privileges, roles, row filters, and column masks.
  *
  * The privilege/role model is the reference's SQL-standard-based
  * authorization (ref ql/src/java/org/apache/hadoop/hive/ql/security/
  * authorization/plugin/sqlstd/SQLStdHiveAuthorizationValidator.java:
  * GRANT/REVOKE per (principal, object, action), roles as privilege
  * bundles, deny-by-default once enforcement is on). Row filters and
  * column masks are the plugin contract the reference exposes to Ranger
  * (ref ql/.../plugin/HiveAuthorizer.java `getRowFilterExpression` /
  * `getCellValueTransformer`): policies attach to a table and rewrite
  * every read BEFORE user expressions see the rows — filter first, then
  * mask, so filters evaluate over unmasked values, exactly the plugin's
  * ordering.
  *
  * Spark-native enforcement: [[graft.Engine.sql]] is the front door (the
  * HS2 analog — the one place every SQL statement passes). After parsing,
  * [[checkStatement]] validates the required action per referenced table
  * and [[applyPolicies]] substitutes each `UnresolvedRelation` that has
  * policies with a wrapped read plan (filter + mask projection under a
  * `SubqueryAlias`, so qualified column references keep working). The
  * DataFrame API is in-process library access and is deliberately not
  * gated, matching the reference (HDFS-level access bypasses HS2 authz
  * too; enforcement belongs to the SQL service surface).
  *
  * Session contract:
  *   - `spark.graft.authz.enabled=true` turns enforcement on (off =
  *     permissive, policies dormant — existing sessions unaffected);
  *   - `spark.graft.user` names the current user (default `anonymous`);
  *   - `spark.graft.authz.admins` (csv) bypass checks and policies —
  *     the superuser list.
  *
  * State is JVM-global like [[NamedTables]] (the metastore stand-in this
  * library uses throughout); active roles are all granted roles (the
  * reference's default before `SET ROLE` narrows them).
  */
object Authz {

  sealed trait Principal { def key: String }
  final case class User(name: String) extends Principal {
    val key = s"user:${name.toLowerCase(Locale.ROOT)}"
  }
  final case class Role(name: String) extends Principal {
    val key = s"role:${name.toLowerCase(Locale.ROOT)}"
  }
  case object AllUsers extends Principal { val key = "all" }

  val Actions = Set("select", "insert", "update", "delete", "all")

  private val roleMembers =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]] // role -> users
  private val grants =
    scala.collection.concurrent.TrieMap.empty[String, Set[(String, String)]] // table -> (principalKey, action)
  private val rowFilters =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]] // table -> principalKey -> predicate
  private val columnMasks =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Map[String, String]]] // table -> column -> principalKey -> expr

  private def norm(s: String): String = s.toLowerCase(Locale.ROOT)

  // ------------------------------------------------------------ admin API

  def createRole(role: String): Unit = roleMembers.putIfAbsent(norm(role), Set.empty)
  def dropRole(role: String): Unit = roleMembers.remove(norm(role))
  def roles: Seq[String] = roleMembers.keys.toSeq.sorted

  def grantRole(role: String, user: String): Unit = {
    val r = norm(role)
    require(roleMembers.contains(r), s"role not found: $role (CREATE ROLE first)")
    roleMembers.put(r, roleMembers(r) + norm(user))
  }
  def revokeRole(role: String, user: String): Unit = {
    val r = norm(role)
    roleMembers.get(r).foreach(m => roleMembers.put(r, m - norm(user)))
  }
  def rolesOf(user: String): Seq[String] =
    roleMembers.collect { case (r, m) if m.contains(norm(user)) => r }.toSeq.sorted

  def grant(table: String, principal: Principal, actions: Seq[String]): Unit = {
    val bad = actions.map(norm).filterNot(Actions)
    require(bad.isEmpty, s"unknown privilege(s): ${bad.mkString(", ")}")
    val t = norm(table)
    grants.put(t, grants.getOrElse(t, Set.empty) ++
      actions.map(a => principal.key -> norm(a)))
  }
  def revoke(table: String, principal: Principal, actions: Seq[String]): Unit = {
    val t = norm(table)
    val drop = actions.map(norm).toSet
    grants.get(t).foreach { g =>
      grants.put(t, g.filterNot { case (p, a) =>
        p == principal.key && (drop.contains(a) || drop.contains("all")) })
    }
  }
  def grantsOn(table: String): Seq[(String, String)] =
    grants.getOrElse(norm(table), Set.empty).toSeq.sorted

  def setRowFilter(table: String, principal: Principal, predicate: String): Unit = {
    val t = norm(table)
    rowFilters.put(t, rowFilters.getOrElse(t, Map.empty) + (principal.key -> predicate))
  }
  def dropRowFilter(table: String, principal: Principal): Unit = {
    val t = norm(table)
    rowFilters.get(t).foreach(m => rowFilters.put(t, m - principal.key))
  }
  def setColumnMask(table: String, column: String, principal: Principal,
      maskExpr: String): Unit = {
    val t = norm(table); val c = norm(column)
    val perCol = columnMasks.getOrElse(t, Map.empty)
    columnMasks.put(t,
      perCol + (c -> (perCol.getOrElse(c, Map.empty) + (principal.key -> maskExpr))))
  }
  def dropColumnMask(table: String, column: String, principal: Principal): Unit = {
    val t = norm(table); val c = norm(column)
    columnMasks.get(t).foreach { perCol =>
      perCol.get(c).foreach(m =>
        columnMasks.put(t, perCol + (c -> (m - principal.key))))
    }
  }

  /** Test/maintenance reset — authz state is JVM-global. */
  def clearAll(): Unit = {
    roleMembers.clear(); grants.clear(); rowFilters.clear(); columnMasks.clear()
    activeRoles.clear()
  }

  // ------------------------------------------------------- session context

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.authz.enabled").contains("true")
  def currentUser(spark: SparkSession): String =
    norm(spark.conf.getOption("spark.graft.user").getOrElse("anonymous"))
  private def isAdmin(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.authz.admins").toSeq
      .flatMap(_.split(',')).map(norm).contains(currentUser(spark))

  // SET ROLE narrowing: user -> active role subset (None = all granted,
  // the reference's default)
  private val activeRoles =
    scala.collection.concurrent.TrieMap.empty[String, Option[Set[String]]]

  /** Active roles for a user: all granted roles unless SET ROLE narrowed
    * them (ref ql/.../SessionState.java setCurrentRoleNames).
    */
  def currentRoles(user: String): Seq[String] = {
    val granted = rolesOf(user)
    activeRoles.getOrElse(norm(user), None) match {
      case Some(sel) => granted.filter(sel)
      case None => granted
    }
  }

  def setRole(user: String, role: String): Unit = {
    val r = norm(role)
    require(rolesOf(user).contains(r),
      s"user $user has not been granted role $role")
    activeRoles.put(norm(user), Some(Set(r)))
  }
  def setRoleAll(user: String): Unit = activeRoles.remove(norm(user))
  def setRoleNone(user: String): Unit =
    activeRoles.put(norm(user), Some(Set.empty))

  /** Principal keys that match the current user, most specific first. */
  private def principalKeys(user: String): Seq[String] =
    (User(user).key +: currentRoles(user).map(Role(_).key)) :+ AllUsers.key

  // ---------------------------------------------------------- enforcement

  final class AccessDenied(msg: String) extends SecurityException(msg)

  private def requirePrivilege(spark: SparkSession, table: String, action: String): Unit = {
    val user = currentUser(spark)
    val held = grants.getOrElse(norm(table), Set.empty)
    val keys = principalKeys(user).toSet
    val ok = held.exists { case (p, a) =>
      keys.contains(p) && (a == norm(action) || a == "all") }
    if (!ok) throw new AccessDenied(
      s"user $user lacks $action privilege on table $table")
  }

  /** Validate the statement's required privileges: DML targets need their
    * verb's privilege, every other referenced relation needs SELECT.
    * No-op unless enforcement is enabled (or the user is an admin).
    */
  def checkStatement(spark: SparkSession, plan: LogicalPlan): Unit = {
    if (!enabled(spark) || isAdmin(spark)) return
    def nameOf(p: LogicalPlan): Option[String] = p match {
      case u: UnresolvedRelation => Some(u.multipartIdentifier.mkString("."))
      case SubqueryAlias(_, child) => nameOf(child)
      case _ => None
    }
    val (targets, actions) = plan match {
      case d: DeleteFromTable => (nameOf(d.table).toSeq, "delete")
      case u: UpdateTable => (nameOf(u.table).toSeq, "update")
      case m: MergeIntoTable => (nameOf(m.targetTable).toSeq, "update")
      case i: InsertIntoStatement => (nameOf(i.table).toSeq, "insert")
      case _ => (Seq.empty, "select")
    }
    targets.foreach(t => requirePrivilege(spark, t, actions))
    val targetSet = targets.map(norm).toSet
    val reads = scala.collection.mutable.LinkedHashSet.empty[String]
    plan.foreachWithSubqueries {
      case u: UnresolvedRelation =>
        val n = u.multipartIdentifier.mkString(".")
        if (!targetSet.contains(norm(n))) reads += n
      case _ => ()
    }
    reads.foreach(t => requirePrivilege(spark, t, "select"))
  }

  /** Rewrite reads under the active row-filter/column-mask policies.
    * Applies only to SELECT-shaped plans (DML statements route through
    * [[SqlDml]] before this runs). Returns the plan unchanged when no
    * policy matches — callers use reference equality to skip re-planning.
    */
  def applyPolicies(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    if (!enabled(spark) || isAdmin(spark)) return plan
    val user = currentUser(spark)
    val keys = principalKeys(user)
    plan.transformDownWithSubqueries {
      case u: UnresolvedRelation if hasPolicy(u.multipartIdentifier, keys) =>
        securedRead(spark, u.multipartIdentifier, keys)
    }
  }

  private def hasPolicy(parts: Seq[String], keys: Seq[String]): Boolean = {
    val t = norm(parts.mkString("."))
    val keySet = keys.toSet
    rowFilters.getOrElse(t, Map.empty).keys.exists(keySet) ||
      columnMasks.getOrElse(t, Map.empty).values.exists(_.keys.exists(keySet))
  }

  private def securedRead(spark: SparkSession, parts: Seq[String],
      keys: Seq[String]): LogicalPlan = {
    val t = norm(parts.mkString("."))
    val base: DataFrame = NamedTables.readDfIfRegistered(spark, parts)
      .getOrElse(spark.table(parts.mkString(".")))
    val keySet = keys.toSet
    // every applicable filter ANDs (user + each role + all): the effective
    // row set is the intersection — the conservative composition Ranger uses
    // when several policies match one table
    val filtered = rowFilters.getOrElse(t, Map.empty)
      .collect { case (p, pred) if keySet(p) => pred }
      .foldLeft(base)((df, pred) => df.where(expr(pred)))
    // one mask per column: the most specific matching principal wins
    // (user > role > all — `keys` is ordered most-specific-first)
    val masks = columnMasks.getOrElse(t, Map.empty).flatMap { case (c, byP) =>
      keys.collectFirst { case k if byP.contains(k) => c -> byP(k) }
    }
    val projected =
      if (masks.isEmpty) filtered
      else {
        val schema = base.schema
        filtered.select(schema.map { f =>
          masks.get(norm(f.name)) match {
            case Some(m) => expr(m).cast(f.dataType).as(f.name)
            case None => col(f.name)
          }
        }: _*)
      }
    SubqueryAlias(parts.last, projected.queryExecution.logical)
  }

  // ------------------------------------------------------------ SQL verbs

  private val Ident = """(`[^`]+`|[\w.]+)"""
  private val Pcpl = """(?:USER\s+(\w+)|ROLE\s+(\w+)|(ALL)\b)"""
  private val CreateRoleR = ("""(?is)\s*CREATE\s+ROLE\s+(\w+)\s*;?\s*""").r
  private val DropRoleR = ("""(?is)\s*DROP\s+ROLE\s+(\w+)\s*;?\s*""").r
  private val GrantRoleR =
    ("""(?is)\s*GRANT\s+ROLE\s+(\w+)\s+TO\s+USER\s+(\w+)\s*;?\s*""").r
  private val RevokeRoleR =
    ("""(?is)\s*REVOKE\s+ROLE\s+(\w+)\s+FROM\s+USER\s+(\w+)\s*;?\s*""").r
  private val GrantR =
    ("""(?is)\s*GRANT\s+([\w\s,]+?)\s+ON\s+(?:TABLE\s+)?""" + Ident +
      """\s+TO\s+""" + Pcpl + """\s*;?\s*""").r
  private val RevokeR =
    ("""(?is)\s*REVOKE\s+([\w\s,]+?)\s+ON\s+(?:TABLE\s+)?""" + Ident +
      """\s+FROM\s+""" + Pcpl + """\s*;?\s*""").r
  private val ShowGrantR =
    ("""(?is)\s*SHOW\s+GRANT\s+ON\s+(?:TABLE\s+)?""" + Ident + """\s*;?\s*""").r
  private val ShowRolesR = """(?is)\s*SHOW\s+ROLES\s*;?\s*""".r
  private val SetRoleAllR = """(?is)\s*SET\s+ROLE\s+ALL\s*;?\s*""".r
  private val SetRoleNoneR = """(?is)\s*SET\s+ROLE\s+NONE\s*;?\s*""".r
  private val SetRoleR = """(?is)\s*SET\s+ROLE\s+(\w+)\s*;?\s*""".r
  private val ShowCurrentRolesR = """(?is)\s*SHOW\s+CURRENT\s+ROLES\s*;?\s*""".r
  private val SetRowFilterR =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+SET\s+ROW\s+FILTER\s+'((?:[^']|'')*)'\s+FOR\s+""" + Pcpl + """\s*;?\s*""").r
  private val DropRowFilterR =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+ROW\s+FILTER\s+FOR\s+""" + Pcpl + """\s*;?\s*""").r
  private val SetMaskR =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+SET\s+COLUMN\s+MASK\s+(\w+)\s+AS\s+'((?:[^']|'')*)'\s+FOR\s+""" +
      Pcpl + """\s*;?\s*""").r
  private val DropMaskR =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+COLUMN\s+MASK\s+(\w+)\s+FOR\s+""" + Pcpl + """\s*;?\s*""").r

  /** SET ROLE intercepts BEFORE Spark's parser ([[graft.Engine.sql]] calls
    * this first): Spark parses `SET ROLE x` as a conf assignment of the
    * meaningless key "role x", so the reference's verb (HiveParser.g
    * setRole) supersedes it here. `ALL` restores all granted roles, `NONE`
    * deactivates all, a name narrows to that one granted role.
    */
  def maybeSetRole(spark: SparkSession, sqlText: String): Option[DataFrame] = {
    import spark.implicits._
    def done(what: String): DataFrame = Seq(what).toDF("result")
    sqlText match {
      case SetRoleAllR() =>
        setRoleAll(currentUser(spark)); Some(done("set role all"))
      case SetRoleNoneR() =>
        setRoleNone(currentUser(spark)); Some(done("set role none"))
      case SetRoleR(r) =>
        setRole(currentUser(spark), r); Some(done(s"set role $r"))
      case _ => None
    }
  }

  private def principal(u: String, r: String, all: String): Principal =
    if (u != null) User(u) else if (r != null) Role(r) else AllUsers
  private def unquoteIdent(s: String): String =
    if (s.startsWith("`")) s.substring(1, s.length - 1) else s
  private def unquoteSql(s: String): String = s.replace("''", "'")

  /** Execute `sqlText` if it is an authz verb (all are parse errors to
    * Spark, so nothing the session parser understands can be shadowed);
    * None otherwise.
    */
  def maybeSql(spark: SparkSession, sqlText: String): Option[DataFrame] = {
    import spark.implicits._
    def done(what: String): DataFrame = Seq(what).toDF("result")
    sqlText match {
      case CreateRoleR(r) => createRole(r); Some(done(s"created role $r"))
      case DropRoleR(r) => dropRole(r); Some(done(s"dropped role $r"))
      case GrantRoleR(r, u) => grantRole(r, u); Some(done(s"granted role $r to $u"))
      case RevokeRoleR(r, u) => revokeRole(r, u); Some(done(s"revoked role $r from $u"))
      case GrantR(acts, t, u, r, all) =>
        grant(unquoteIdent(t), principal(u, r, all),
          acts.split(',').map(_.trim).toSeq)
        Some(done(s"granted on ${unquoteIdent(t)}"))
      case RevokeR(acts, t, u, r, all) =>
        revoke(unquoteIdent(t), principal(u, r, all),
          acts.split(',').map(_.trim).toSeq)
        Some(done(s"revoked on ${unquoteIdent(t)}"))
      case ShowGrantR(t) =>
        Some(grantsOn(unquoteIdent(t)).toDF("principal", "privilege"))
      case ShowRolesR() => Some(roles.toDF("role"))
      case ShowCurrentRolesR() =>
        Some(currentRoles(currentUser(spark)).toDF("role"))
      case SetRowFilterR(t, pred, u, r, all) =>
        setRowFilter(unquoteIdent(t), principal(u, r, all), unquoteSql(pred))
        Some(done(s"row filter set on ${unquoteIdent(t)}"))
      case DropRowFilterR(t, u, r, all) =>
        dropRowFilter(unquoteIdent(t), principal(u, r, all))
        Some(done(s"row filter dropped on ${unquoteIdent(t)}"))
      case SetMaskR(t, c, m, u, r, all) =>
        setColumnMask(unquoteIdent(t), c, principal(u, r, all), unquoteSql(m))
        Some(done(s"column mask set on ${unquoteIdent(t)}.$c"))
      case DropMaskR(t, c, u, r, all) =>
        dropColumnMask(unquoteIdent(t), c, principal(u, r, all))
        Some(done(s"column mask dropped on ${unquoteIdent(t)}.$c"))
      case _ => None
    }
  }
}
