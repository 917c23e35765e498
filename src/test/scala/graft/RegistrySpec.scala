package graft

/** Driver-contract integrity: `SparkEntry.queries` is a toMap over
  * the module registries — a duplicate name would silently shadow an
  * operator (the driver would verify one and never see the other),
  * and an oracle without its query (or a blank oracle) would score
  * as an error. Pure metadata checks, no Spark session needed.
  */
class RegistrySpec extends org.scalatest.funsuite.AnyFunSuite {

  test("query names are unique across all module registries") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    assert(dups.isEmpty, s"shadowed queries: ${dups.mkString(", ")}")
  }

  test("every oracle belongs to a registered query and is non-blank") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty, s"$n: blank oracle")
      assert(sql.toUpperCase.contains("SELECT"), s"$n: not a query")
    }
  }

  test("names follow the family naming scheme") {
    val pat = "^[a-z][a-z0-9]*(_[a-z0-9]+)*$".r
    SparkEntry.all.foreach(q =>
      assert(pat.findFirstIn(q.name).isDefined, s"odd name: ${q.name}"))
  }
}
