package graft.operators

/** Guard for strings spliced into GENERATED SQL text (the
  * `annProbeSql` / `nearDupProbeSql` view-name parameters): a plain
  * unquoted identifier, nothing else — the same defense-in-depth posture
  * as the repo's other untrusted-input guards. View names come from the
  * caller's own code, but a generator that concatenates arbitrary text
  * into SQL is one lazy refactor away from an injection bug; failing fast
  * with a named rule keeps the contract self-enforcing. */
object SqlIdent {
  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  def require(name: String): Unit =
    Predef.require(Ident.pattern.matcher(name).matches(),
      s"'$name' is not a plain SQL identifier ([A-Za-z_][A-Za-z0-9_]*): " +
        "the generated-SQL entry points splice names into SQL text and " +
        "accept only unquoted identifiers")
}
