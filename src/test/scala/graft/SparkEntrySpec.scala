package graft

/** The driver contract's three members, pinned: entry() smoke (rows > 0 at
  * sf0.001 — the exact check the driver runs), every oracle key resolving
  * to a catalog query, and name uniqueness. Cheap insurance that a catalog
  * refactor can't silently break the adapter the driver actually calls.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the sf0.001 fixture (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql are consistent with the catalog") {
    val names = queries.QueryCatalog.all.map(_.name)
    assert(names.distinct.size === names.size, "duplicate catalog names")
    assert(SparkEntry.queries.keySet === names.toSet)
    // every oracle key is a real query; every catalog entry ships an oracle
    // (the 100%-oracled bar CORRECTNESS holds us to)
    assert(SparkEntry.oracleSql.keySet === names.toSet)
  }
}
