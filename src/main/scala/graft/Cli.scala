package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.registry.{HttpIngest, Ingest, Registry}

/** Runnable registry CLI — the reference's primary user surface
  * (`hangar` subcommands, hangarbay/cli.py:66-671) re-expressed over
  * the Spark registry:
  *
  *   hangar update        -> update <zip> [snapshotDate]  (fetch.py
  *                           unzip → normalize → manifest, one call)
  *   hangar status        -> status   (snapshot date / age / rows)
  *   hangar sql "..."     -> sql <query>
  *   hangar search N123   -> search <n-number>
  *   hangar fleet OWNER   -> fleet <owner> [--state ST] [--limit N]
  *   hangar (list tables) -> tables | schema <table>
  *
  * Layout matches the reference: `<dataRoot>/raw/<date>/` holds
  * unpacked snapshots, `<dataRoot>/publish/` the typed parquet the
  * Registry reads. Query commands surface the staleness warning
  * (30-day threshold from the publish manifest) exactly where the
  * reference does (cli.py show_age_warning / api.py _warn_if_stale).
  *
  * `run` is the testable core; `main` only builds the session and
  * prints.
  */
object Cli {

  val usage: String =
    """usage: graft.Cli <dataRoot> <command> [args]
      |  fetch <url|zip> [snapshotDate] [--sha256 HEX]
      |                                download (http/https/file URL;
      |                                retry + backoff + streaming
      |                                sha256) or take a local zip,
      |                                verify, then ingest
      |  update <zip> [snapshotDate]   unzip + normalize + manifest
      |  normalize <rawDir> [snapshotDate]   normalize an unpacked
      |                                snapshot dir + manifest
      |  refresh <rawDir>              incremental normalize: only
      |                                tables whose raw dump changed
      |  status                        snapshot date, age, row counts
      |  sql <query> [-i]              ad-hoc SQL over registry views
      |                                (-i / --case-insensitive:
      |                                LIKE matches become ILIKE)
      |  --format table|json|csv       output format for any tabular
      |                                command (default table)
      |  --skip-age-check              suppress the 30-day staleness
      |                                warning on query commands
      |  search <n-number>             N-number lookup w/ owner
      |  index-fts                     materialize the owner FTS index
      |                                (bucketed on token) for fast fts
      |  fts [--ranked] <term> [term...]  owner full-text search, all
      |                                terms must match (probes the
      |                                written index when present);
      |                                --ranked orders by a bm25-style
      |                                tf·idf relevance score
      |  fleet <owner> [--state ST] [--limit N] [--export FILE.csv]
      |  diff <otherDataRoot> [table]  what changed vs another
      |                                snapshot's publish (default
      |                                aircraft): added/removed/changed
      |  audit                         data-quality report (uniqueness,
      |                                nulls, referential integrity)
      |  tables                        list queryable tables/views
      |  schema <table>                column names/types
      |  state <foldBase>              inspect a streaming fold's
      |                                durable state (pointers, parts,
      |                                snapshots, band generations) —
      |                                control files only, safe
      |                                against a live fold
      |  version                       library version
      |""".stripMargin

  /** Dispatch one subcommand. Returns the result frame, or None for
    * commands with no tabular result. Throws IllegalArgumentException
    * on bad usage. */
  def run(
      spark: SparkSession,
      dataRoot: String,
      args: Seq[String],
      warningSink: String => Unit = Console.err.println(_)): Option[DataFrame] = {
    import spark.implicits._
    lazy val reg = new Registry(spark, s"$dataRoot/publish", warningSink)
    args.toList match {
      case "fetch" :: src :: rest =>
        // the reference's fetch stage (pipelines/fetch.py:19-148):
        // download with retry/backoff + streaming checksum
        // (graft.registry.HttpIngest), then unzip -> normalize ->
        // manifest, the same tail as `update`. A local zip path skips
        // the download but keeps the integrity check.
        val (dates, flags) = rest.span(_ != "--sha256")
        val expected = flags match {
          case "--sha256" :: hex :: Nil => Some(hex)
          case Nil => None
          case bad => throw new IllegalArgumentException(
            s"bad fetch arguments: ${bad.mkString(" ")}\n$usage")
        }
        val date = dates.headOption.getOrElse(
          java.time.LocalDate.now.toString)
        val zipPath =
          if (HttpIngest.isUrl(src)) {
            val dest = s"$dataRoot/downloads/" +
              src.split('/').last.split('?').head
            val f = try HttpIngest.download(src, dest,
                expectedSha256 = expected,
                progress = bytes => if (bytes % (64L << 20) < (1 << 16))
                  warningSink(s"fetch: ${bytes >> 20} MiB..."))
              catch { case e: java.io.IOException =>
                // zero-egress deployments land here after the retries:
                // surface the out-of-band fallback the old contract
                // documented, with the real cause attached
                throw new IllegalArgumentException(
                  s"fetch: download failed (${e.getMessage}) — if this " +
                    "environment has no egress, download the snapshot " +
                    s"out of band and pass the local zip path\n$usage")
              }
            warningSink(
              s"fetch: downloaded ${f.bytes} bytes in ${f.attempts} " +
                s"attempt(s), sha256 ${f.sha256}")
            f.path
          } else {
            expected.foreach { hex =>
              val got = sha256Of(src)
              if (!got.equalsIgnoreCase(hex))
                throw new IllegalArgumentException(
                  s"fetch: checksum mismatch for $src\n  expected $hex\n  got      $got")
            }
            src
          }
        val pub = Ingest.fromZip(spark, zipPath, dataRoot, date)
        warningSink(s"fetch complete: $pub (snapshot $date)")
        None

      case "update" :: zip :: rest =>
        val date = rest.headOption.getOrElse(
          java.time.LocalDate.now.toString)
        val pub = Ingest.fromZip(spark, zip, dataRoot, date)
        warningSink(s"update complete: $pub (snapshot $date)")
        None

      case "normalize" :: raw :: rest =>
        val date = rest.headOption.getOrElse(
          java.time.LocalDate.now.toString)
        val pub = s"$dataRoot/publish"
        graft.registry.RegistryNormalize.normalize(spark, raw, pub)
        graft.registry.Lineage.writeManifest(spark, pub,
          Registry.tableNames, date)
        warningSink(s"normalize complete: $pub (snapshot $date)")
        None

      case "refresh" :: raw :: Nil =>
        // incremental normalize: only tables whose raw dump changed
        val refreshed = graft.registry.RegistryNormalize
          .normalizeIncremental(spark, raw, s"$dataRoot/publish")
        val rows = if (refreshed.isEmpty) Seq("(none)" -> "current")
          else refreshed.map(_ -> "refreshed")
        Some(rows.toDF("table_name", "status"))

      case "version" :: Nil =>
        Some(Seq(("graft", "0.4.0"),
          ("spark", spark.version)).toDF("component", "version"))

      case "state" :: b :: Nil =>
        Some(graft.streaming.Streams.foldState(spark, b))

      case "status" :: Nil =>
        val age = reg.dataAgeDays
        val ageRows = Seq(
          "snapshot_age_days" -> age.map(_.toString).getOrElse("no manifest"),
          "staleness" -> age.map(d => if (d >= 30) "STALE (30+ days)"
            else "current").getOrElse("unknown"))
        val counts = reg.status.collect()
          .map(r => s"rows.${r.getString(0)}" -> r.getLong(1).toString)
        Some((ageRows ++ counts).toDF("field", "value"))

      case "sql" :: rest if rest.nonEmpty =>
        // cli.py:185-210 parity: --case-insensitive / -i rewrites
        // LIKE → ILIKE (word-boundary, case-blind, NOT LIKE → NOT
        // ILIKE falls out of the same rewrite) — Spark SQL has ILIKE
        // as a first-class operator, same as DuckDB
        val (flags, qs) = rest.partition(a =>
          a == "--case-insensitive" || a == "-i")
        qs match {
          case q :: Nil =>
            val sql =
              if (flags.nonEmpty) {
                warningSink("case-insensitive matching (LIKE -> ILIKE)")
                q.replaceAll("(?i)\\bLIKE\\b", "ILIKE")
              } else q
            Some(reg.query(sql))
          case bad => throw new IllegalArgumentException(
            s"sql takes one query: ${bad.mkString(" ")}\n$usage")
        }

      case "search" :: n :: Nil => Some(reg.search(n))

      case "index-fts" :: Nil =>
        reg.writeFtsIndex()
        warningSink(s"fts index written: ${Registry.FtsTable}")
        None

      case "fts" :: rest if rest.exists(_ != "--ranked") =>
        val (flags, terms) = rest.partition(_ == "--ranked")
        if (flags.nonEmpty) Some(reg.searchOwnersFtsRanked(terms))
        else Some(reg.searchOwnersFts(terms))

      case "fleet" :: owner :: rest =>
        // strict flag parse: a flag without a value, a non-numeric
        // --limit, or an unknown token is a usage error (the sliding
        // collectFirst form silently dropped all three)
        def parse(xs: List[String], state: Option[String],
            limit: Option[Int], export: Option[String]): (
            Option[String], Option[Int], Option[String]) = xs match {
          case Nil => (state, limit, export)
          case "--state" :: v :: t if !v.startsWith("--") =>
            parse(t, Some(v), limit, export)
          case "--limit" :: v :: t if v.nonEmpty && v.forall(_.isDigit) =>
            parse(t, state, Some(v.toInt), export)
          case "--export" :: v :: t if !v.startsWith("--") =>
            parse(t, state, limit, Some(v))
          case bad => throw new IllegalArgumentException(
            s"bad fleet arguments: ${bad.mkString(" ")}\n$usage")
        }
        val (state, limit, export) = parse(rest, None, None, None)
        val result = reg.fleet(owner, state, limit.getOrElse(0))
        // cli.py:655-660 parity: --export writes the FULL result as
        // CSV, n_number re-prefixed with the registration 'N' the
        // registry strips at normalize time
        export.foreach { path =>
          val frame =
            if (result.columns.contains("n_number"))
              result.withColumn("n_number",
                org.apache.spark.sql.functions.concat(
                  org.apache.spark.sql.functions.lit("N"),
                  org.apache.spark.sql.functions.col("n_number")))
            else result
          writeCsv(frame, path)
          warningSink(s"exported to $path")
        }
        Some(result)

      case "diff" :: otherRoot :: rest =>
        // what changed between another snapshot's publish and ours —
        // keyed on n_number, every shared non-key aircraft column
        // compared (Relational.snapshotDiff)
        val table = rest.headOption.getOrElse("aircraft")
        val mine = reg.table(table)
        val theirs = spark.read.parquet(
          s"$otherRoot/publish/$table.parquet")
        val key = "n_number"
        require(mine.columns.contains(key) && theirs.columns.contains(key),
          s"diff supports n_number-keyed tables, not $table\n$usage")
        val compared = mine.columns.filter(_ != key)
          .filter(theirs.columns.contains)
        Some(graft.operators.Relational.snapshotDiff(
          theirs, mine, Seq(key), compared.toSeq).orderBy(key))

      case "audit" :: Nil =>
        // publish-time data-quality gate over the registry tables
        import graft.operators.Quality
        Some(Quality.audit(Seq(
          Quality.expectUnique(reg.table("aircraft"),
            "aircraft_n_number_unique", Seq("n_number")),
          Quality.expectAll(reg.table("aircraft"), Seq(
            "aircraft_n_number_not_null" ->
              org.apache.spark.sql.functions.col("n_number").isNull)),
          Quality.expectReferential(reg.table("aircraft"),
            reg.table("aircraft_make_model"),
            "aircraft_make_model_referential", "mfr_mdl_code",
            "mfr_mdl_code"),
          Quality.expectReferential(reg.table("owners"),
            reg.table("aircraft"),
            "owners_n_number_referential", "n_number", "n_number"),
          Quality.expectReferential(reg.table("aircraft"),
            reg.table("engines"),
            "aircraft_engine_referential", "engine_code", "engine_code")))
          .orderBy("check_name"))

      case "tables" :: Nil =>
        Some(reg.listTables.toDF("table_name"))

      case "schema" :: t :: Nil => Some(reg.schemaOf(t))

      case other =>
        throw new IllegalArgumentException(
          s"unknown command: ${other.mkString(" ")}\n$usage")
    }
  }

  private def sha256Of(path: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Human-formatted table rendering — the cli.py:225-257
    * `format_cell_value` + cli.py:427 `format_date` conventions:
    * nulls render empty, midnight timestamps shed their ' 00:00:00',
    * dates render as 'Mon dd, yyyy', columns align, output caps at
    * `maxRows`. ONE execution: `take(maxRows + 1)` both fills the
    * page and detects truncation — unlike cli.py (whose DuckDB
    * result is already materialized, so counting is free), a
    * distributed query must not run twice just to print an exact
    * total in the footer; a truncated render says "more exist"
    * instead. */
  def formatTable(df: org.apache.spark.sql.DataFrame,
      maxRows: Int = 100): String = {
    val fetched = df.take(maxRows + 1)
    val truncated = fetched.length > maxRows
    val rows = fetched.take(maxRows)
    val dateFmt = java.time.format.DateTimeFormatter
      .ofPattern("MMM dd, yyyy", java.util.Locale.ROOT)
    def cell(v: Any): String = v match {
      case null => ""
      case d: java.sql.Date => d.toLocalDate.format(dateFmt)
      case t: java.sql.Timestamp =>
        val s = t.toString
        if (s.endsWith(" 00:00:00.0")) s.dropRight(11)
        else s.stripSuffix(".0")
      case other => other.toString
    }
    val header = df.columns.toSeq
    val body = rows.map(r => header.indices.map(i => cell(r.get(i))))
    val widths = header.indices.map(i =>
      (header(i).length +: body.map(_(i).length)).max)
    def line(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("  ").stripTrailing()
    val sep = line(widths.map("-" * _))
    val out = new StringBuilder
    out ++= line(header) += '\n'
    out ++= sep += '\n'
    body.foreach(b => { out ++= line(b) += '\n' })
    if (truncated)
      out ++= s"showing first $maxRows rows (more exist)\n"
    else
      out ++= s"${rows.length} rows\n"
    out.result()
  }

  /** One CSV-escaped cell: RFC-4180 minimal quoting (quote only when
    * the value carries a comma, quote, or line break; embedded quotes
    * doubled), nulls empty — the same conventions pandas' `to_csv`
    * uses in the reference (cli.py:217-220). Dates/timestamps render
    * ISO (`java.sql` toString), not the human table format. */
  private def csvCell(v: Any): String = {
    val s = v match {
      case null => ""
      case other => other.toString
    }
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
  }

  /** CSV render of the whole frame — the scripting output the
    * reference's `sql --output-format csv` dumps (cli.py:217-220).
    * Streams partition-at-a-time via `toLocalIterator`: the full
    * result is the contract here (unlike the human table's 100-row
    * page), but the driver never holds more than one partition of
    * rows plus the text being built. */
  def formatCsv(df: org.apache.spark.sql.DataFrame): String = {
    val sb = new StringBuilder
    sb ++= df.columns.map(csvCell).mkString(",") += '\n'
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      sb ++= df.columns.indices.map(i => csvCell(r.get(i))).mkString(",")
      sb += '\n'
    }
    sb.result()
  }

  /** Write [[formatCsv]]-formatted rows to a file without building
    * the whole document in memory — the `fleet --export` path. */
  def writeCsv(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val w = java.nio.file.Files.newBufferedWriter(
      java.nio.file.Paths.get(path))
    try {
      w.write(df.columns.map(csvCell).mkString(","))
      w.newLine()
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        w.write(df.columns.indices.map(i => csvCell(r.get(i))).mkString(","))
        w.newLine()
      }
    } finally w.close()
  }

  /** JSON render: an array of records, one object per row — the
    * reference's `sql --output-format json` (cli.py:215 `to_json(
    * orient="records")`). Numbers and booleans unquoted, nulls
    * literal, strings escaped; dates/timestamps as ISO strings
    * (deliberately NOT pandas' epoch-millis default — a scripted
    * consumer wants the value, not a pandas serialization quirk).
    * Streams via `toLocalIterator` like [[formatCsv]]. */
  def formatJson(df: org.apache.spark.sql.DataFrame): String = {
    def jsonString(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      (sb += '"').result()
    }
    def jsonValue(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case n: Byte => n.toString
      case n: Short => n.toString
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Float => if (n.isNaN || n.isInfinite) "null" else n.toString
      case n: Double => if (n.isNaN || n.isInfinite) "null" else n.toString
      case n: java.math.BigDecimal => n.toPlainString
      case other => jsonString(other.toString)
    }
    val cols = df.columns
    val sb = new StringBuilder("[")
    val it = df.toLocalIterator()
    var first = true
    while (it.hasNext) {
      val r = it.next()
      sb ++= (if (first) "\n" else ",\n")
      first = false
      sb ++= cols.indices.map(i =>
          "    " + jsonString(cols(i)) + ": " + jsonValue(r.get(i)))
        .mkString("  {\n", ",\n", "\n  }")
    }
    (sb ++= (if (first) "]" else "\n]")).result()
  }

  /** Render `df` in the requested format — the `--format` surface of
    * every tabular subcommand (reference: sql's `--output-format`,
    * cli.py:185). */
  def render(df: org.apache.spark.sql.DataFrame, format: String): String =
    format match {
      case "table" => formatTable(df)
      case "json" => formatJson(df)
      case "csv" => formatCsv(df)
      case other => throw new IllegalArgumentException(
        s"unknown format: $other (expected table, json, or csv)\n$usage")
    }

  /** Strip a `--format X` flag (anywhere in the args) and return
    * (format, remaining args). Default "table". */
  private[graft] def parseFormat(args: Seq[String]): (String, Seq[String]) = {
    val i = args.indexOf("--format")
    if (i < 0) ("table", args)
    else if (i + 1 >= args.length)
      throw new IllegalArgumentException(s"--format needs a value\n$usage")
    else (args(i + 1), args.patch(i, Nil, 2))
  }

  /** Strip `--skip-age-check` (reference parity: every query command
    * takes it, cli.py show_age_warning) and return (skip, rest). The
    * flag suppresses ONLY the staleness warning — other sink traffic
    * (export confirmations, rewrite notices) still flows. */
  private[graft] def parseSkipAgeCheck(
      args: Seq[String]): (Boolean, Seq[String]) = {
    val i = args.indexOf("--skip-age-check")
    if (i < 0) (false, args) else (true, args.patch(i, Nil, 1))
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) { System.err.println(usage); sys.exit(2) }
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      // see graft.operators.Layouts: layout probes rely on this
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (format, rest0) = parseFormat(args.tail.toSeq)
      val (skipAge, rest) = parseSkipAgeCheck(rest0)
      val sink: String => Unit =
        if (skipAge) { (m: String) =>
          if (!m.startsWith(graft.registry.Registry.StaleWarningPrefix))
            Console.err.println(m)
        } else { (m: String) => Console.err.println(m) }
      run(spark, args.head, rest, sink)
        .foreach(df => println(render(df, format)))
    } finally spark.stop()
  }
}
