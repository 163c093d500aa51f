package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.engine.{GrantSpec, UserSpec}

/** Parser for the reference's real input surface: the playbook vars
  * lists `clickhouse_sql_users` / `clickhouse_grants`
  * (playbook_example.yaml:13-36). Applies the playbook task-template
  * semantics when lowering vars to module specs
  * (playbook_example.yaml:39-68):
  *  - the users task always passes a HASH — `user_password_hash` if
  *    given, else sha256(user_password) (yaml:46);
  *  - users `init_roles` defaults TRUE (yaml:49); `user_state` defaults
  *    'present' (yaml:48);
  *  - grants `databases` default ['default'], `tables` ['*'],
  *    `replace_grants`/`revoke_grants` false (yaml:64-67).
  *
  * Hand-rolled minimal YAML subset (zero-egress build: no YAML library
  * on the classpath): two top-level list keys, `- k: v` block items,
  * flow lists `[a, 'b']`, single/double-quoted scalars, booleans,
  * full-line and trailing ` #` comments. That subset covers the entire
  * vars surface the reference documents.
  */
object PlaybookYaml {

  /** Raw vars: (clickhouse_sql_users items, clickhouse_grants items). */
  def parseVars(text: String): (Seq[Map[String, Any]], Seq[Map[String, Any]]) = {
    var users = Vector.empty[Map[String, Any]]
    var grants = Vector.empty[Map[String, Any]]
    var section: String = ""
    var current: Map[String, Any] = null

    def flush(): Unit = if (current != null) {
      if (section == "clickhouse_sql_users") users :+= current
      else if (section == "clickhouse_grants") grants :+= current
      current = null
    }

    for (raw <- text.linesIterator) {
      val noComment = stripComment(raw)
      val t = noComment.trim
      if (t.nonEmpty) {
        if (!raw.startsWith(" ")) {
          // top level: a list header opens a section; a scalar var
          // (clickhouse_user etc., playbook_example.yaml:8-12) closes
          // the current one — it must NOT merge into the last item
          flush()
          section = if (t.endsWith(":")) t.dropRight(1) else ""
        } else if (t.startsWith("- ")) {
          flush()
          val (k, v) = keyValue(t.drop(2))
          current = Map(k -> v)
        } else if (current != null && t.contains(":")) {
          val (k, v) = keyValue(t)
          current += (k -> v)
        }
      }
    }
    flush()
    (users, grants)
  }

  private def stripComment(line: String): String = {
    // a '#' starts a comment at line start or after whitespace, outside
    // quotes (the vars subset never embeds '#' in values)
    var inQ = false; var q = ' '
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) { if (c == q) inQ = false }
      else if (c == '\'' || c == '"') { inQ = true; q = c }
      else if (c == '#' && (i == 0 || line.charAt(i - 1).isWhitespace))
        return line.substring(0, i)
      i += 1
    }
    line
  }

  private def keyValue(s: String): (String, Any) = {
    val idx = s.indexOf(':')
    require(idx > 0, s"not a 'key: value' line: '$s'")
    (s.substring(0, idx).trim, value(s.substring(idx + 1)))
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
        ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else t
  }

  private def value(s: String): Any = {
    val t = s.trim
    if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) Seq.empty[String]
      else inner.split(",").map(unquote).toSeq
    }
    else if (t == "true") true
    else if (t == "false") false
    else unquote(t)
  }

  // ---- lowering to module specs (task-template semantics) -------------

  private def sha256Hex(s: String): String =
    graft.functions.GraftHash.sha256Hex(s)

  private def str(m: Map[String, Any], k: String, dflt: String = ""): String =
    m.get(k).map(_.toString).getOrElse(dflt)
  private def seq(m: Map[String, Any], k: String, dflt: Seq[String] = Nil): Seq[String] =
    m.get(k).map(_.asInstanceOf[Seq[String]]).getOrElse(dflt)
  private def bool(m: Map[String, Any], k: String, dflt: Boolean): Boolean =
    m.get(k).map(_.asInstanceOf[Boolean]).getOrElse(dflt)

  def toUserSpec(m: Map[String, Any]): UserSpec = {
    val givenHash = str(m, "user_password_hash")
    val givenPw = str(m, "user_password")
    val state = str(m, "user_state", "present")
    // the task always passes a hash (playbook_example.yaml:46); a present
    // user with NEITHER credential is the playbook author's error — fail
    // loudly like Ansible's undefined-variable template error would,
    // never silently mint sha256("") as a plausible-looking hash.
    // (absent users are dropped, no credential involved.)
    require(state == "absent" || givenHash.nonEmpty || givenPw.nonEmpty,
      s"user '${str(m, "user_name")}': one of user_password / " +
        "user_password_hash is required when user_state is 'present'")
    UserSpec(
      userName = str(m, "user_name"),
      userPasswordHash =
        if (givenHash.nonEmpty) givenHash else sha256Hex(givenPw),
      userQuota = str(m, "user_quota"),
      userProfile = str(m, "user_profile"),
      userRoles = seq(m, "user_roles"),
      initRoles = bool(m, "init_roles", dflt = true),
      userState = str(m, "user_state", "present"))
  }

  def toGrantSpec(m: Map[String, Any]): GrantSpec =
    GrantSpec(
      granteeName = str(m, "grantee_name"),
      grants = seq(m, "grants"),
      databases = seq(m, "databases", Seq("default")),
      tables = seq(m, "tables", Seq("*")),
      grantRoles = seq(m, "grant_roles"),
      revokeGrants = bool(m, "revoke_grants", dflt = false),
      replaceGrants = bool(m, "replace_grants", dflt = false))

  /** Ordered module specs from playbook vars text. */
  def specs(text: String): (Seq[UserSpec], Seq[GrantSpec]) = {
    val (u, g) = parseVars(text)
    (u.map(toUserSpec), g.map(toGrantSpec))
  }

  /** Dataset views for data-plane composition (joins against catalog
    * probes etc.); replay order stays with the Seq form. */
  def userSpecsDs(spark: SparkSession, text: String): Dataset[UserSpec] = {
    import spark.implicits._
    spark.createDataset(specs(text)._1)
  }
  def grantSpecsDs(spark: SparkSession, text: String): Dataset[GrantSpec] = {
    import spark.implicits._
    spark.createDataset(specs(text)._2)
  }

  /** Load a playbook-vars resource from the classpath. */
  def resourceText(path: String = "/graft/playbook_vars.yaml"): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing classpath resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}
