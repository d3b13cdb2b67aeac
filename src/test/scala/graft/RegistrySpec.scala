package graft

/** Driver-contract smoke: entry() yields rows, names are unique, every
  * oracle key has a query, every query runs at sf0.001. */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracleSql keys all resolve") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every no-oracle query declares a green-oracled companion") {
    // the VERDICT/COVERAGE prose mapping, encoded: "no oracle" must
    // mean "checked through a named SQL-expressible invariant twin",
    // never "unchecked" — and the twin must itself be oracle-backed
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    SparkEntry.registry.filter(_.oracle.isEmpty).foreach { q =>
      assert(q.companion.isDefined,
        s"${q.name} has no oracle and no companion — declare its invariant twin")
      val c = q.companion.get
      assert(byName.contains(c), s"${q.name}'s companion $c is not registered")
      assert(byName(c).oracle.isDefined,
        s"${q.name}'s companion $c has no oracle — the chain must end oracle-checked")
    }
    // and companions are only meaningful where the oracle is missing
    SparkEntry.registry.filter(_.oracle.isDefined).foreach { q =>
      assert(q.companion.isEmpty,
        s"${q.name} is oracle-checked; companion is for no-oracle queries only")
    }
  }

  test("README's registry counts match the actual registry (no doc drift)") {
    // README.md line "(N registered queries, M with DuckDB oracles)" —
    // the first numbers any reader checks; pin them to the code so they
    // can't drift again (they did in rounds 12-13)
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val m = """\((\d+) registered queries, (\d+)\s""".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README.md no longer states the registry counts")
    assert(m.get.group(1).toInt == SparkEntry.registry.size,
      s"README says ${m.get.group(1)} registered; registry has ${SparkEntry.registry.size}")
    assert(m.get.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.get.group(2)} oracled; registry has ${SparkEntry.oracleSql.size}")
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
