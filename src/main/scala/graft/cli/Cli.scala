package graft.cli

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.operators.{Manifest, Mover, Partitioner, Splitter, WxSql}
import graft.sources.FormatRegistry

/** Thin CLI front-ends for the four façades, mirroring the reference tools'
  * flag surfaces and validation errors (weather_mv/loader_pipeline/
  * pipeline.py:92-190, weather_sp/splitter_pipeline/pipeline.py:94-171,
  * weather_dl/download_pipeline/pipeline.py:141-180). Validation messages
  * reuse the reference's texts so migrating scripts see familiar errors;
  * execution drives the Spark operators instead of a Beam graph.
  */
final case class CliError(msg: String) extends IllegalArgumentException(msg)

/** Tiny argv parser: `--flag v [v2 ...]` value flags (greedy for nargs+
  * flags), boolean flags, aliases, positionals. A '-'-prefixed token is a
  * flag only when it names a KNOWN flag, so negative numbers pass through
  * as values (`--area 10 -10 ...`). Unknown flags error like argparse. */
object Flags {
  final case class Schema(
      value: Map[String, String] = Map.empty,   // alias -> canonical
      greedy: Set[String] = Set.empty,          // canonical names taking nargs+
      bool: Map[String, String] = Map.empty) {  // alias -> canonical
    def canonical(tok: String): Option[String] = value.get(tok).orElse(bool.get(tok))
  }

  final case class Parsed(positional: Seq[String], flags: Map[String, Seq[String]]) {
    def get(name: String): Option[String] = flags.get(name).flatMap(_.headOption)
    def all(name: String): Seq[String] = flags.getOrElse(name, Nil)
    def has(name: String): Boolean = flags.contains(name)
  }

  def parse(argv: Seq[String], schema: Schema): Parsed = {
    val flags = mutable.Map.empty[String, Seq[String]]
    val pos = mutable.ArrayBuffer.empty[String]
    var i = 0
    def isFlag(t: String): Boolean = t.startsWith("-") && schema.canonical(t).isDefined
    while (i < argv.length) {
      val tok = argv(i)
      schema.bool.get(tok) match {
        case Some(name) => flags(name) = flags.getOrElse(name, Nil) :+ "true"; i += 1
        case None => schema.value.get(tok) match {
          case Some(name) =>
            val vals = mutable.ArrayBuffer.empty[String]
            i += 1
            if (i < argv.length && !isFlag(argv(i))) { vals += argv(i); i += 1 }
            if (schema.greedy.contains(name))
              while (i < argv.length && !isFlag(argv(i))) { vals += argv(i); i += 1 }
            if (vals.isEmpty) throw CliError(s"argument $tok: expected a value")
            flags(name) = flags.getOrElse(name, Nil) ++ vals
          case None =>
            if (tok.startsWith("--")) throw CliError(s"unrecognized arguments: $tok")
            pos += tok
            i += 1
        }
      }
    }
    Parsed(pos.toSeq, flags.toMap)
  }
}

/** `weather-mv <bq|rg|ee> -i URIS ...` (pipeline.py:92-190, bq.py:119-193). */
object WeatherMv {
  final case class Config(
      subcommand: String, uris: String, outputTable: String,
      variables: Seq[String], area: Seq[Double], importTime: Option[String],
      topic: Option[String], subscription: Option[String],
      zarr: Boolean, dryRun: Boolean,
      tifStartMeta: Option[String], tifEndMeta: Option[String],
      outputPath: String = "", assetLocation: String = "",
      regridLatRes: Double = 1.0, regridLonRes: Double = 1.0)

  private val schema = Flags.Schema(
    value = Map("-i" -> "uris", "--uris" -> "uris",
      "-o" -> "output_table", "--output_table" -> "output_table",
      "-v" -> "variables", "--variables" -> "variables",
      "-a" -> "area", "--area" -> "area",
      "--import_time" -> "import_time",
      "--topic" -> "topic", "--subscription" -> "subscription",
      "--window_size" -> "window_size", "--num_shards" -> "num_shards",
      "--tif_metadata_for_start_time" -> "tif_start",
      "--tif_metadata_for_end_time" -> "tif_end",
      "--output_path" -> "output_path", "--regrid_kwargs" -> "regrid_kwargs",
      "--asset_location" -> "asset_location", "--ee_asset" -> "ee_asset"),
    greedy = Set("variables", "area"),
    bool = Map("--zarr" -> "zarr", "-d" -> "dry_run", "--dry-run" -> "dry_run",
      "--infer_schema" -> "infer_schema"))

  def parse(argv: Seq[String]): Config = {
    val sub = argv.headOption.getOrElse(throw CliError(
      "a subcommand is required: bigquery (bq), regrid (rg), earthengine (ee)"))
    val canon = Map("bigquery" -> "bq", "bq" -> "bq", "regrid" -> "rg", "rg" -> "rg",
      "earthengine" -> "ee", "ee" -> "ee").getOrElse(sub,
      throw CliError(s"invalid choice: '$sub' (choose from bigquery, bq, regrid, rg, earthengine, ee)"))
    val p = Flags.parse(argv.tail, schema)
    val uris = p.get("uris").getOrElse(throw CliError(
      "the following arguments are required: -i/--uris"))
    val area = p.all("area").map(a => a.toDoubleOption.getOrElse(
      throw CliError(s"argument -a/--area: invalid float value: '$a'")))
    if (area.nonEmpty && area.size != 4)
      throw CliError("Must specify exactly 4 lat/long values for area: N, W, S, E boundaries.")
    val topic = p.get("topic")
    val subscription = p.get("subscription")
    if (topic.isDefined && subscription.isDefined)
      throw CliError("only one argument can be provided at a time: `topic` or `subscription`.")
    val zarr = p.has("zarr") || uris.endsWith(".zarr")
    if (zarr && (topic.isDefined || subscription.isDefined))
      throw CliError("streaming updates to a Zarr file is not (yet) supported.")
    val ext = FormatRegistry.extensionOf(uris)
    val tifStart = p.get("tif_start")
    if (Set("tif", "tiff").contains(ext) && tifStart.isEmpty)
      throw CliError("'--tif_metadata_for_start_time' is required for tif files.")
    if (!Set("tif", "tiff").contains(ext) && (tifStart.isDefined || p.has("tif_end")))
      throw CliError("'--tif_metadata_for_start_time' and '--tif_metadata_for_end_time' " +
        "can be specified only for tif files.")
    val out = p.get("output_table").getOrElse {
      if (canon == "bq") throw CliError(
        "the following arguments are required: -o/--output_table") else ""
    }
    val outputPath = p.get("output_path").getOrElse {
      if (canon == "rg") throw CliError(
        "the following arguments are required: --output_path") else ""
    }
    val assetLocation = p.get("asset_location").getOrElse {
      if (canon == "ee") throw CliError(
        "the following arguments are required: --asset_location") else ""
    }
    // reference: --regrid_kwargs '{"grid": [dy, dx]}' (regrid.py) — both
    // axis resolutions; a present-but-unparsable value is an error, not a
    // silent 1-degree fallback
    val (latRes, lonRes) = p.get("regrid_kwargs") match {
      case None => (1.0, 1.0)
      case Some(j) =>
        """"grid"\s*:\s*\[\s*([0-9.eE+-]+)\s*,\s*([0-9.eE+-]+)""".r
          .findFirstMatchIn(j)
          .flatMap(m => for {
            dy <- m.group(1).toDoubleOption
            dx <- m.group(2).toDoubleOption
          } yield (dy, dx))
          .getOrElse(throw CliError(
            s"""argument --regrid_kwargs: expected {"grid": [dy, dx]}, got '$j'"""))
    }
    Config(canon, uris, out, p.all("variables"), area, p.get("import_time"),
      topic, subscription, zarr, p.has("dry_run"), tifStart, p.get("tif_end"),
      outputPath, assetLocation, latRes, lonRes)
  }

  def run(spark: SparkSession, cfg: Config): Unit = {
    val ds = FormatRegistry.open(spark, cfg.uris)
    val opts = Mover.Options(
      variables = cfg.variables,
      area = cfg.area match {
        case Seq(n, w, s, e) => Some(Mover.Area(n, w, s, e))
        case _ => None
      },
      importTime = cfg.importTime)
    if (cfg.topic.isDefined || cfg.subscription.isDefined)
      throw CliError(
        "streaming ingestion needs a Pub/Sub connector (external service); " +
          "drive the same pipeline with graft.streaming.FileEvents over any " +
          "streaming DataFrame of OBJECT_FINALIZE JSON bodies instead.")
    cfg.subcommand match {
      case "bq" =>
        if (cfg.dryRun) {
          println(s"[dry-run] would extract ${ds.columns.length} columns from ${cfg.uris} " +
            s"into ${cfg.outputTable}; sink schema: ${Mover.sinkSchema(ds, cfg.variables, opts).simpleString}")
        } else {
          Mover.extractRows(ds, cfg.uris, opts)
            .write.mode("append").parquet(cfg.outputTable)
        }
      case "rg" =>
        // reference: copy + regrid (regrid.py) — conservative pool onto the
        // requested grid, written as a partitioned sink
        val dataCols = ds.columns.filterNot(
          Seq("time", "latitude", "longitude").contains).toSeq
        val pooled = graft.operators.Regrid.conservativeXY(
          ds, "latitude", "longitude", cfg.regridLatRes, cfg.regridLonRes, dataCols,
          extraKeys = Seq("time").filter(ds.columns.contains))
        if (cfg.dryRun) println(
          s"[dry-run] regrid to ${cfg.regridLatRes}x${cfg.regridLonRes}°: " +
          s"${pooled.columns.mkString(",")} -> ${cfg.outputPath}")
        else pooled.write.mode("append").parquet(cfg.outputPath)
      case "ee" =>
        // reference: ToEarthEngine — asset extract + ingestion ledger; the
        // REST client is external, so the asset lands as parquet and the
        // transition ledger records the attempt (manifest.py semantics)
        val rows = Mover.extractRows(ds, cfg.uris, opts)
        if (cfg.dryRun) { println(s"[dry-run] would stage ${rows.columns.length} columns"); return }
        Manifest.transact(spark, s"${cfg.assetLocation}/manifest", "weather-mv-ee",
          cfg.uris, sys.props.getOrElse("user.name", "graft"), "{}") {
          rows.write.mode("append").parquet(s"${cfg.assetLocation}/asset")
        } match {
          // a failed staging is recorded in the ledger AND surfaced —
          // swallowing it would exit 0 on a botched ingest
          case Left(e) => throw new RuntimeException(
            s"earthengine asset staging failed for ${cfg.uris}: ${e.getMessage}", e)
          case Right(_) => ()
        }
    }
  }

  def main(args: Array[String]): Unit = run(GraftSession.local(), parse(args.toSeq))
}

/** `weather-dl CONFIG [...]` (download_pipeline/pipeline.py:141-180). The
  * .cfg parser follows the reference's config.py INI layout: a `[parameters]`
  * section (client, target_path, partition keys list) and one or more
  * selection sections whose values are MARS-expanded. */
object WeatherDl {
  final case class Config(
      configs: Seq[String], force: Boolean, dryRun: Boolean,
      numRequests: Int, schedule: String, manifestLocation: String,
      localRun: Boolean)

  private val schema = Flags.Schema(
    value = Map("-m" -> "manifest-location", "--manifest-location" -> "manifest-location",
      "-n" -> "num-requests-per-key", "--num-requests-per-key" -> "num-requests-per-key",
      "-p" -> "partition-chunks", "--partition-chunks" -> "partition-chunks",
      "-s" -> "schedule", "--schedule" -> "schedule"),
    bool = Map("-f" -> "force-download", "--force-download" -> "force-download",
      "-d" -> "dry-run", "--dry-run" -> "dry-run",
      "-l" -> "local-run", "--local-run" -> "local-run",
      "-u" -> "update-manifest", "--update-manifest" -> "update-manifest"))

  def parse(argv: Seq[String]): Config = {
    val p = Flags.parse(argv, schema)
    if (p.positional.isEmpty)
      throw CliError("the following arguments are required: config")
    val schedule = p.get("schedule").getOrElse("in-order")
    if (!Set("in-order", "fair").contains(schedule))
      throw CliError(s"argument -s/--schedule: invalid choice: '$schedule' " +
        "(choose from 'in-order', 'fair')")
    val n = p.get("num-requests-per-key").map(_.toIntOption.getOrElse(
      throw CliError("argument -n/--num-requests-per-key: invalid int value"))).getOrElse(-1)
    Config(p.positional, p.has("force-download"), p.has("dry-run"), n,
      schedule, p.get("manifest-location").getOrElse("cli://manifest"),
      p.has("local-run"))
  }

  /** Reference-layout .cfg -> DlConfig (config.py:23-77): `[parameters]`
    * holds client/target_path/partition_keys; other sections are the
    * selection, values MARS-expanded ('a/b/c', 'x/to/y[/by/z]'). */
  def parseCfg(name: String, text: String): Partitioner.DlConfig = {
    var section = ""
    val params = mutable.Map.empty[String, String]
    val selection = mutable.Map.empty[String, Seq[String]]
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith(";"))
      .foreach {
        case l if l.startsWith("[") && l.endsWith("]") => section = l.substring(1, l.length - 1)
        case l if l.contains('=') =>
          val Array(k, v) = l.split("=", 2).map(_.trim)
          if (section == "parameters") params(k) = v
          else selection(k) = graft.functions.ConfigParsers.parseMarsSyntax(v, k)
        case other => throw CliError(s"unparseable config line: '$other'")
      }
    val partitionKeys = params.get("partition_keys")
      .map(_.split("[,\\s]+").toSeq.filter(_.nonEmpty))
      .getOrElse(Nil)
    partitionKeys.foreach(k => if (!selection.contains(k))
      throw CliError(s"partition key '$k' is not in the selection"))
    Partitioner.DlConfig(
      name = name,
      client = params.getOrElse("client", "fake"),
      selection = selection.toMap,
      partitionKeys = partitionKeys,
      targetPath = params.getOrElse("target_path", ""),
      subsections = params.get("subsections").map(_.split(",").toSeq).getOrElse(Seq("default")))
  }

  def run(spark: SparkSession, cfg: Config): Unit = {
    cfg.configs.foreach { path =>
      val text = {
        val src = scala.io.Source.fromFile(path)
        try src.mkString finally src.close()
      }
      val dl = parseCfg(new java.io.File(path).getName.stripSuffix(".cfg"), text)
      var parts = Partitioner.fanout(spark, dl)
      if (!cfg.force && cfg.manifestLocation.startsWith("file:")) {
        val ledger = cfg.manifestLocation.stripPrefix("file:")
        if (new java.io.File(ledger).exists)
          parts = Partitioner.skipExisting(parts,
            Manifest.succeeded(Manifest.read(spark, ledger)))
      }
      if (cfg.schedule == "fair") parts = Partitioner.fairOrder(parts)
      if (cfg.dryRun) println(s"[dry-run] ${dl.name}: ${parts.count()} partitions")
      else if (cfg.localRun && cfg.manifestLocation.startsWith("file:")) {
        // full download lifecycle with the fake local client (the
        // reference's -l mode): per partition, transact in-progress ->
        // fetch (stubbed write) -> success into the manifest ledger
        val ledger = cfg.manifestLocation.stripPrefix("file:")
        val targets = parts.select("target").collect().map(_.getString(0))
        val results = targets.map { t =>
          t -> Manifest.transact(spark, ledger, dl.name, t,
            sys.props.getOrElse("user.name", "graft"), "{}") {
            val p = new org.apache.hadoop.fs.Path(t)
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val out = fs.create(p, true)
            try out.write(Array[Byte]()) finally out.close()
          }
        }
        val failed = results.collect { case (t, Left(e)) => s"$t: ${e.getMessage}" }
        println(s"${dl.name}: ${targets.length - failed.length} partitions " +
          s"downloaded, ${failed.length} failed (local fake client)")
        if (failed.nonEmpty) throw new RuntimeException(
          s"${failed.length} download(s) failed; first: ${failed.head} " +
            "(failures are recorded in the manifest ledger)")
      } else println(s"${dl.name}: ${parts.count()} partitions ready " +
        "(HTTP download clients are external; partitions materialized)")
    }
  }

  def main(args: Array[String]): Unit = run(GraftSession.local(), parse(args.toSeq))
}

/** `weather-sp --input-pattern P (--output-template T | --output-dir D)`
  * (splitter_pipeline/pipeline.py:94-171). */
object WeatherSp {
  final case class Config(
      inputPattern: String, outputTemplate: Option[String], outputDir: Option[String],
      formatting: String, dryRun: Boolean, force: Boolean)

  private val schema = Flags.Schema(
    value = Map("-i" -> "input-pattern", "--input-pattern" -> "input-pattern",
      "--output-template" -> "output-template", "--output-dir" -> "output-dir",
      "--formatting" -> "formatting", "-w" -> "where", "--where" -> "where",
      "--topic" -> "topic", "--subscription" -> "subscription",
      "--window-size" -> "window-size", "--num-shards" -> "num-shards",
      "--log-level" -> "log-level"),
    bool = Map("-d" -> "dry-run", "--dry-run" -> "dry-run",
      "-f" -> "force", "--force" -> "force"))

  def parse(argv: Seq[String]): Config = {
    val p = Flags.parse(argv, schema)
    val input = p.get("input-pattern").getOrElse(throw CliError(
      "the following arguments are required: -i/--input-pattern"))
    if (p.has("topic") && p.has("subscription"))
      throw CliError("only one argument can be provided at a time: `topic` or `subscription`.")
    val tmpl = p.get("output-template")
    val dir = p.get("output-dir")
    if (tmpl.isEmpty && dir.isEmpty) throw CliError("No output specified")
    val formatting = p.get("formatting").getOrElse("")
    val base = tmpl.map(t => new java.io.File(t).getName).getOrElse("")
    if (base.contains('[') || base.contains(']') ||
        formatting.contains('[') || formatting.contains(']'))
      throw CliError("Tokens `[]` are disallowed in the file output.")
    Config(input, tmpl, dir, formatting, p.has("dry-run"), p.has("force"))
  }

  def run(spark: SparkSession, cfg: Config): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pat = new org.apache.hadoop.fs.Path(cfg.inputPattern)
    val fs = pat.getFileSystem(conf)
    val files = Option(fs.globStatus(pat)).map(_.toSeq).getOrElse(Nil).map(_.getPath.toString)
    if (cfg.dryRun) { println(s"[dry-run] would split ${files.size} file(s)"); return }
    val outRoot = cfg.outputDir.getOrElse(
      cfg.outputTemplate.get.takeWhile(_ != '{'))
    files.foreach { f =>
      if (Set("grib", "grb", "grib1", "grb1", "grib2", "grb2")
          .contains(FormatRegistry.extensionOf(f))) {
        // the reference's GribSplitter writes REAL per-key GRIB files —
        // verbatim message byte spans, grouped by shortName (either edition)
        graft.sources.grib.GribSplitter.split(spark, f, outRoot)
      } else {
        // NetCDF/Zarr path: unpivot the wide frame on its data columns,
        // then one partitioned write per variable
        val df = FormatRegistry.open(spark, f)
        val coords = Seq("time", "latitude", "longitude").filter(df.columns.contains)
        val dataCols = df.columns.filterNot(coords.contains)
        if (dataCols.isEmpty)
          throw CliError(s"'$f' has no data variables to split (only ${df.columns.mkString(", ")})")
        val stacked = df.selectExpr(coords ++ Seq(
          s"stack(${dataCols.length}, ${dataCols.map(c => s"'$c', `$c`").mkString(", ")}) " +
            "AS (variable, value)"): _*)
        Splitter.split(stacked, Seq("variable"), outRoot, cfg.force)
      }
    }
  }

  def main(args: Array[String]): Unit = run(GraftSession.local(), parse(args.toSeq))
}

/** `graft-xql [--set alias=uri ...] [-q QUERY]` — the xql surface
  * (xql/README.md): alias catalog + sugar SQL. With -q it runs one query;
  * without, it enters the reference's REPL loop (`.set alias uri`, `.show`,
  * `.exit`, bare SQL). */
object Xql {
  final case class Config(sets: Seq[(String, String)], query: Option[String],
      xqlCompat: Boolean, numRows: Int)

  private val schema = Flags.Schema(
    value = Map("--set" -> "set", "-q" -> "query", "--query" -> "query",
      "-n" -> "num-rows", "--num-rows" -> "num-rows"),
    bool = Map("--xql-compat" -> "xql-compat"))

  def parse(argv: Seq[String]): Config = {
    val p = Flags.parse(argv, schema)
    val sets = p.all("set").map { s =>
      s.split("=", 2) match {
        case Array(a, u) if a.nonEmpty && u.nonEmpty => (a, u)
        case _ => throw CliError(s"argument --set: expected alias=uri, got '$s'")
      }
    }
    val n = p.get("num-rows").map(_.toIntOption.getOrElse(
      throw CliError("argument -n/--num-rows: invalid int value"))).getOrElse(20)
    Config(sets, p.get("query").orElse(p.positional.headOption),
      p.has("xql-compat"), n)
  }

  def run(spark: SparkSession, cfg: Config): Unit = cfg.query match {
    case Some(q) =>
      val wx = WxSql(spark, cfg.xqlCompat)
      cfg.sets.foreach { case (a, u) => wx.set(a, u) }
      wx.sql(q).show(cfg.numRows, truncate = false)
    case None =>
      repl(spark, cfg, scala.io.Source.stdin.getLines())
  }

  /** The REPL loop (apply.py:367-386 meta-commands + SQL): injectable line
    * source and printer so it's testable headlessly. Query errors print and
    * keep the session alive, like the reference. */
  def repl(spark: SparkSession, cfg: Config,
      lines: Iterator[String], out: String => Unit = println): Unit = {
    val wx = WxSql(spark, cfg.xqlCompat)
    cfg.sets.foreach { case (a, u) => wx.set(a, u) }
    lines.map(_.trim).filter(_.nonEmpty)
      .takeWhile(l => l != ".exit" && l != ".quit")
      .foreach {
        case l if l.startsWith(".set") =>
          l.split("\\s+") match {
            case Array(_, a, u) => wx.set(a, u); out(s"$a -> $u")
            case _ => out("usage: .set alias uri")
          }
        case ".show" =>
          wx.show.toSeq.sortBy(_._1).foreach { case (a, u) => out(s"$a -> $u") }
        case sql =>
          try {
            val df = wx.sql(sql).limit(cfg.numRows)
            out(df.columns.mkString("\t"))
            df.collect().foreach(r => out(r.toSeq.map(v =>
              if (v == null) "NULL" else v.toString).mkString("\t")))
          } catch {
            case e: Exception => out(s"error: ${e.getMessage}")
          }
      }
  }

  def main(args: Array[String]): Unit = run(GraftSession.local(), parse(args.toSeq))
}
