package graft

/** Driver-contract guards over the whole query registry — cheap plan-only
  * checks that run for EVERY registered query, so a contract break in a
  * future query fails the suite instead of a correctness round. */
class ContractSpec extends SparkSpec {

  test("every query key has a distinct registration and every oracle key a query") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    val orphanOracles = os.keySet -- qs.keySet
    assert(orphanOracles.isEmpty, s"oracleSql without a query: $orphanOracles")
  }

  test("no oracle-checked query emits an array/binary/map column (driver comparator contract)") {
    val qs = SparkEntry.queries
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = qs(name)(spark, sf).schema
      SchemaContract.unsortableColumns(schema).map(c => s"$name → $c")
    }
    assert(offenders.isEmpty,
      "oracle-checked queries with comparator-unsortable columns (the r7/r8 bug class):\n  " +
        offenders.mkString("\n  "))
  }

  test("every oracle-checked query's column names are stable plain identifiers") {
    // The driver sorts columns BY NAME before hashing; a name with spaces,
    // parens, or operator characters (Spark's default `sum(x)` style) is a
    // silent mismatch against the oracle's aliased form. Uppercase is fine
    // (q_pivot's segment columns are quoted identically on both sides).
    val qs = SparkEntry.queries
    val bad = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      qs(name)(spark, sf).schema.fieldNames.toSeq
        .filterNot(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
        .map(c => s"$name → '$c'")
    }
    assert(bad.isEmpty, "non-canonical column names:\n  " + bad.mkString("\n  "))
  }
}
