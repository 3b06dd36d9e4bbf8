package graft

import java.nio.file.Files
import graft.registry.{Lineage, Registry, RegistryNormalize}

/** End-to-end registry pipeline: FAA-shaped CSV → typed parquet →
  * decoded views → search/fleet/FTS — the reference's whole
  * fetch-normalize-publish-query loop minus the network fetch. */
class RegistrySpec extends SparkSuite {

  private lazy val dirs = {
    val raw = Files.createTempDirectory("graft_raw").toString
    val pub = Files.createTempDirectory("graft_pub").toString
    Files.writeString(java.nio.file.Paths.get(s"$raw/MASTER.txt"),
      """N-NUMBER ,SERIAL NUMBER,MFR MDL CODE,ENG MFR MDL,YEAR MFR,TYPE AIRCRAFT,STATUS CODE,LAST ACTION DATE,EXPIRATION DATE,CERT ISSUE DATE,CERTIFICATION,MODE S CODE,MODE S CODE HEX,NAME,STREET,STREET2,CITY,STATE,ZIP CODE,TYPE REGISTRANT
        |221LA,SN001,C172,ENG1,2015,4,V,20240101,20270101,20150601,1,50000001,A00001,LOS ANGELES POLICE DEPT , 100 W 1ST ST ,SUITE 2,LOS ANGELES,California,90012-1234,5
        |757AF,SN002,B757,ENG2,1995,1,V,20230315,20260315,19950815,1,50000002,A00002,UNITED AIRLINES INC,233 S WACKER DR,,CHICAGO,IL,60606,3
        |100XY,SN003,C172,ENG1,bad_year,4,E,20220230,20250101,20100101,1,50000003,A00003,JOHN  DOE,1 MAIN ST,,AUSTIN,TX,787,1
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$raw/ACFTREF.txt"),
      """CODE,MFR,MODEL,TYPE-ACFT,TYPE-ENG,AC-CAT,BUILD-CERT-IND,NO-ENG,NO-SEATS,AC-WEIGHT,SPEED
        |C172,CESSNA,172S,4,1,1,0,1,4,CLASS 1,120
        |B757,BOEING,757-200,5,5,1,0,2,200,CLASS 3,500
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$raw/ENGINE.txt"),
      """CODE,MFR,MODEL,TYPE,HORSEPOWER,THRUST
        |ENG1,LYCOMING,IO-360,1,180,0
        |ENG2,PRATT & WHITNEY,PW2037,5,0,38250
        |""".stripMargin)
    RegistryNormalize.normalize(spark, raw, pub)
    (raw, pub)
  }

  private lazy val registry = new Registry(spark, dirs._2)

  test("normalize produces typed tables with coerced invalids") {
    val a = registry.table("aircraft").orderBy("n_number").collect()
    assert(a.length == 3)
    val bad = a.find(_.getString(0) == "100XY").get
    assert(bad.isNullAt(bad.fieldIndex("year_mfr"))) // bad_year -> null
    assert(bad.isNullAt(bad.fieldIndex("status_date"))) // 20220230 invalid
  }

  test("owners get standardized fields and stable ids") {
    val o = registry.table("owners").orderBy("n_number").collect()
    val lapd = o.find(_.getAs[String]("n_number") == "221LA").get
    assert(lapd.getAs[String]("owner_name_std") == "LOS ANGELES POLICE DEPT")
    assert(lapd.getAs[String]("address_all_std") == "100 W 1ST ST SUITE 2")
    assert(lapd.getAs[String]("state_std") == "CA") // California -> CA
    assert(lapd.getAs[String]("zip5") == "90012")
    val doe = o.find(_.getAs[String]("n_number") == "100XY").get
    assert(doe.getAs[String]("owner_name_std") == "JOHN DOE") // collapsed ws
    assert(doe.getAs[String]("zip5") == "00787") // padded
  }

  test("aircraftDecoded joins make/model and decodes codes") {
    val d = registry.aircraftDecoded.collect()
    val b757 = d.find(_.getAs[String]("n_number") == "757AF").get
    assert(b757.getAs[String]("maker") == "BOEING")
    // decoded descriptions carry the reference view's column names
    // (publish.py:166-171): reg_status / airworthiness_class
    assert(b757.getAs[String]("reg_status") == "Valid")
    assert(b757.getAs[String]("airworthiness_class") == "Standard")
    assert(b757.getAs[String]("status_code") == "V")
    val bad = d.find(_.getAs[String]("n_number") == "100XY").get
    assert(bad.getAs[String]("reg_status") == "Revoked by Enforcement")
  }

  test("unknown codes decode to NULL like the reference LEFT JOIN") {
    import org.apache.spark.sql.functions.col
    val d = operators.Relational.decode(spark,
      registry.table("aircraft"), "reg_status",
      Seq("V" -> "Valid"), "reg_status_descr")
    assert(d.filter(col("reg_status") === "E")
      .collect().forall(_.isNullAt(d.columns.indexOf("reg_status_descr"))))
  }

  test("search normalizes the N prefix and enriches with owner") {
    val hit = registry.search("N221LA").collect()
    assert(hit.length == 1)
    assert(hit.head.getAs[String]("owner_name") == "LOS ANGELES POLICE DEPT")
    assert(registry.search("221la").count() == 1)
  }

  test("fleet does multi-term OR search with state filter") {
    val lapd = registry.fleet("LAPD|LOS ANGELES POLICE", Some("CA")).collect()
    assert(lapd.length == 1 && lapd.head.getAs[String]("n_number") == "221LA")
    assert(registry.fleet("UNITED").count() == 1)
    assert(registry.fleet("UNITED", Some("CA")).count() == 0)
  }

  test("FTS inverted index finds owners by all-terms match") {
    val hits = registry.searchOwnersFts(Seq("POLICE", "ANGELES")).collect()
    assert(hits.length == 1)
    assert(hits.head.getAs[String]("n_number") == "221LA")
    assert(registry.searchOwnersFts(Seq("POLICE", "CHICAGO")).count() == 0)
  }

  test("materialized FTS index: probe matches lazy form, prunes buckets") {
    registry.writeFtsIndex(numBuckets = 8)
    try {
      // written-index probe returns the same owners as the lazy form
      val written = registry
        .searchOwnersFts(Seq("POLICE", "ANGELES"),
          indexTable = Some(graft.registry.Registry.FtsTable))
        .collect().map(_.getAs[String]("n_number")).toSet
      assert(written == Set("221LA"))
      // with the table present, the default path auto-probes it: the
      // plan scans the bucketed table (no explode/Generate of owners)
      val df = registry.searchOwnersFts(Seq("POLICE"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"),
        s"expected the written index (no explode) in:\n$plan")
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning for the single-term probe in:\n$plan")
      assert(df.collect().map(_.getAs[String]("n_number")).toSet ==
        Set("221LA"))
    } finally
      spark.sql(s"DROP TABLE IF EXISTS ${graft.registry.Registry.FtsTable}")
  }

  test("layout probes never mutate session conf (autoBucketedScan)") {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prior = spark.conf.get(key)
    try {
      // sentinel differing from the engine default: a probe that still
      // carried the old conf.set would flip it back to false
      spark.conf.set(key, "true")
      registry.writeFtsIndex(numBuckets = 4)
      registry.searchOwnersFts(Seq("POLICE")).collect()
      assert(spark.conf.get(key) == "true",
        "FTS probe mutated shared session conf")
    } finally {
      spark.conf.set(key, prior)
      spark.sql(s"DROP TABLE IF EXISTS ${graft.registry.Registry.FtsTable}")
      ()
    }
  }

  test("schema hashes: deterministic, distinct per table, drift-sensitive") {
    import org.apache.spark.sql.types._
    val h = graft.registry.Schemas.allSchemaHashes
    assert(h.keySet == Set("aircraft", "registrations", "owners",
      "aircraft_make_model", "engines"))
    assert(h.values.forall(_.matches("[0-9a-f]{32}")))
    assert(h.values.toSet.size == h.size, "hash collision across tables")
    // deterministic across invocations
    assert(graft.registry.Schemas.allSchemaHashes == h)
    // sensitive to any field change (type, name, order)
    val base = graft.registry.Schemas.engines
    val retyped = StructType(base.fields.map(f =>
      if (f.name == "horsepower") f.copy(dataType = LongType) else f))
    val reordered = StructType(base.fields.reverse)
    assert(graft.registry.Schemas.schemaHash(retyped) !=
      graft.registry.Schemas.schemaHash(base))
    assert(graft.registry.Schemas.schemaHash(reordered) !=
      graft.registry.Schemas.schemaHash(base))
  }

  test("query runs ad-hoc SQL over registered views") {
    val df = registry.query(
      "SELECT maker, count(*) AS n FROM aircraft_decoded GROUP BY maker ORDER BY maker")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("BOEING", 1L), ("CESSNA", 2L)))
  }

  test("ownersSummary rolls up with trust flag") {
    val s = registry.ownersSummary.collect()
    assert(s.length == 3)
    val lapd = s.find(_.getAs[String]("n_number") == "221LA").get
    assert(lapd.getAs[Boolean]("any_trust_flag")) // type 5 = Government
  }

  test("status and schema introspection") {
    assert(registry.status.collect().map(_.getLong(1)).sum == 3 + 3 + 3 + 2 + 2)
    assert(registry.listTables.contains("aircraft_decoded"))
    assert(registry.schemaOf("engines").count() == 6)
  }

  test("freshnessReport folds manifest counts, age and staleness into one table") {
    // isolated publish dir: the shared fixture must stay manifest-free
    // (warnIfStale tests depend on the absent-manifest path)
    val pub = java.nio.file.Files
      .createTempDirectory("graft_fresh_pub").toString
    RegistryNormalize.normalize(spark, dirs._1, pub)
    val reg = new Registry(spark, pub)
    // no manifest yet: the report flags it instead of throwing
    val bare = reg.freshnessReport().collect()
    assert(bare.forall(r => r.getAs[Long]("manifest_rows") == -1L &&
      r.getAs[Long]("age_days") == -1L && r.getAs[Long]("stale") == 0L))
    Lineage.writeManifest(spark, pub, Registry.tableNames,
      "2026-08-01")
    val fresh = reg
      .freshnessReport(java.time.LocalDate.parse("2026-08-13"))
      .collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("rows_match"), r.getAs[Long]("age_days"),
          r.getAs[Long]("stale"))).toMap
    assert(fresh.keySet == Registry.tableNames.toSet)
    assert(fresh.values.forall(_ == (1L, 12L, 0L)),
      s"expected all matched/12-days/fresh: $fresh")
    val stale = reg
      .freshnessReport(java.time.LocalDate.parse("2026-09-13"))
      .collect()
    assert(stale.forall(r => r.getAs[Long]("stale") == 1L),
      "43-day-old snapshot must flag stale")
  }

  test("normalizeIncremental refreshes only tables whose raw source changed") {
    val (raw, _) = dirs
    val pub2 = Files.createTempDirectory("graft_pub_inc").toString
    // cold start: no checksum record — everything refreshes
    val first = RegistryNormalize.normalizeIncremental(spark, raw, pub2)
    assert(first.toSet == RegistryNormalize.tableSources.keySet)
    // unchanged inputs: nothing refreshes
    assert(RegistryNormalize.normalizeIncremental(spark, raw, pub2).isEmpty)
    // touch only the engine dump → exactly the engines table refreshes
    val enginePath = java.nio.file.Paths.get(s"$raw/ENGINE.txt")
    Files.writeString(enginePath,
      Files.readString(enginePath) + "ENG3,GE,CF6,5,0,50000\n")
    val marker = new java.io.File(s"$pub2/aircraft.parquet").lastModified()
    assert(RegistryNormalize.normalizeIncremental(spark, raw, pub2) ==
      Seq("engines"))
    assert(new java.io.File(s"$pub2/aircraft.parquet").lastModified() ==
      marker, "untouched table was rewritten")
    assert(spark.read.parquet(s"$pub2/engines.parquet").count() == 3)
    // and the record advanced: a repeat run is again a no-op
    assert(RegistryNormalize.normalizeIncremental(spark, raw, pub2).isEmpty)
  }

  test("normalizeIncremental fails fast when a raw dump disappears") {
    val (raw, _) = dirs
    // copy the raw snapshot so we can delete from it safely
    val raw2 = Files.createTempDirectory("graft_raw_del").toString
    for (f <- Seq("MASTER.txt", "ACFTREF.txt", "ENGINE.txt"))
      Files.copy(java.nio.file.Paths.get(s"$raw/$f"),
        java.nio.file.Paths.get(s"$raw2/$f"))
    val pub3 = Files.createTempDirectory("graft_pub_del").toString
    assert(RegistryNormalize.normalizeIncremental(spark, raw2, pub3).nonEmpty)
    Files.delete(java.nio.file.Paths.get(s"$raw2/ENGINE.txt"))
    val ex = intercept[IllegalStateException] {
      RegistryNormalize.normalizeIncremental(spark, raw2, pub3)
    }
    // names both the missing dump and the table that would go stale
    assert(ex.getMessage.contains("ENGINE.txt"))
    assert(ex.getMessage.contains("engines"))
    // the checksum record was NOT rewritten: restoring the dump and
    // re-running refreshes nothing (content unchanged) but succeeds
    Files.copy(java.nio.file.Paths.get(s"$raw/ENGINE.txt"),
      java.nio.file.Paths.get(s"$raw2/ENGINE.txt"))
    assert(RegistryNormalize.normalizeIncremental(spark, raw2, pub3).isEmpty)
  }
}
