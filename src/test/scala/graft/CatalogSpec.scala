package graft

/** Session-catalog surface: `saveAsTable` registers a managed table
  * that SHOW TABLES / DESCRIBE / the Catalog API all see, and reading
  * it back BY NAME is lossless (the `catalog_table` registered query
  * pins the values against the path-read oracle).
  */
class CatalogSpec extends SparkTestBase {

  test("saveAsTable table is visible to SHOW TABLES, DESCRIBE, Catalog API") {
    // Runs the registered query, which creates graft_nation_cat.
    val result =
      SparkEntry.queries("catalog_table")(spark, sfDir).collect()
    assert(result.nonEmpty)

    val shown = spark.sql("SHOW TABLES").collect().map(_.getString(1))
    assert(shown.contains("graft_nation_cat"), shown.mkString(","))

    val described = spark
      .sql("DESCRIBE TABLE graft_nation_cat")
      .collect()
      .map(_.getString(0))
    assert(described.contains("n_name"), described.mkString(","))

    assert(spark.catalog.tableExists("graft_nation_cat"))
    assert(
      spark.catalog.listTables().collect().map(_.name)
        .contains("graft_nation_cat"))

    // By-name read equals the by-path read, row for row.
    val byName = spark.table("graft_nation_cat").count()
    val byPath = Tables.nation(spark, sfDir).count()
    assert(byName == byPath)
  }
}
