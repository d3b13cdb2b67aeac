package graft

/** Driver-contract smoke: entry() yields rows, names are unique, every
  * oracle key has a query, every query runs at sf0.001. */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracleSql keys all resolve") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(name)(assert(n >= 0))
    }
  }
}
