package graft.operators

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plans.GeoConstants

/** xql-equivalent SQL front-end: a thin sugar layer over `spark.sql`.
  *
  * The reference xql (xql/src/xql/apply.py) parses a small SELECT dialect with
  * sqlglot, applies its own projection/filter/group-by over xarray, and
  * post-processes in pandas. Spark SQL already covers that whole surface, so
  * this layer only re-expresses xql's three *extensions*:
  *
  *  1. a session alias catalog (`.set alias uri`, apply.py:37, 367-386) —
  *     [[WxSql.set]] registers a parquet path as a temp view;
  *  2. custom geo predicates `city = 'x'` / `country = 'y'` rewritten to
  *     bounding-box conjunctions (where.py:140-171, constant.py:16-34);
  *  3. `GROUP BY time_date | time_month | time_year` bucketing sugar and
  *     `{func}_{variable}` aggregate naming (apply.py:56-60, 132-155).
  *
  * Divergences from the reference, by design (SURVEY §7.4): WHERE handles OR
  * correctly (xql evaluates only the first DNF term, where.py:229-238), and
  * ORDER BY/LIMIT/OFFSET follow standard SQL semantics and stay distributed
  * instead of running in pandas on the driver.
  */
class WxSql(spark: SparkSession) {
  private val aliases = mutable.Map.empty[String, String]

  /** `.set alias uri` — alias a store path (parquet, zarr, csv, …; format
    * sniffed like the reference's engine dispatch); registers a temp view. */
  def set(alias: String, path: String): Unit = {
    aliases(alias) = path
    graft.sources.FormatRegistry.open(spark, path).createOrReplaceTempView(alias)
  }

  /** `.show` meta-command analog. */
  def show: Map[String, String] = aliases.toMap

  def sql(query: String): DataFrame = spark.sql(WxSql.rewrite(query))
}

object WxSql {
  def apply(spark: SparkSession): WxSql = new WxSql(spark)

  private val GeoPred: Regex = """(?i)\b(city|country)\s*=\s*'([^']+)'""".r
  private val TimeBucket: Regex = """(?i)\btime_(date|month|year)\b""".r
  // AVG(x)/SUM(x)/MIN(x)/MAX(x) in the SELECT list without an explicit alias
  // don't rewrite when the user aliased it (AS) or when the aggregate is a
  // sub-expression (followed by an arithmetic operator)
  private val AggNoAlias: Regex =
    """(?i)\b(AVG|SUM|MIN|MAX)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)(?!\s*AS\b)(?!\s*[+\-*/%])""".r

  /** Apply all sugar rewrites; the result is plain Spark SQL. */
  def rewrite(query: String): String =
    rewriteAggNaming(rewriteTimeBuckets(rewriteGeoPredicates(query)))

  /** `city='new york'` -> bounding-box conjunction over latitude/longitude
    * (where.py:140-171). Unknown names raise, mirroring the reference. */
  def rewriteGeoPredicates(query: String): String =
    GeoPred.replaceAllIn(query, m => {
      val kind = m.group(1).toLowerCase
      val name = m.group(2)
      val box = GeoConstants.lookup(kind, name).getOrElse(
        throw new IllegalArgumentException(s"Unsupported $kind: '$name'"))
      s"(latitude >= ${box.latMin} AND latitude <= ${box.latMax} " +
        s"AND longitude >= ${box.lonMin} AND longitude <= ${box.lonMax})"
    })

  /** `time_date|time_month|time_year` -> `date_trunc` over the `time`
    * coordinate (apply.py:56-60: strftime %Y-%m-%d / %Y-%m / %Y). */
  def rewriteTimeBuckets(query: String): String =
    TimeBucket.replaceAllIn(query, m => m.group(1).toLowerCase match {
      case "date" => "date_trunc('DAY', time)"
      case "month" => "date_trunc('MONTH', time)"
      case "year" => "date_trunc('YEAR', time)"
    })

  /** Unaliased aggregates get the reference's `{func}_{variable}` output
    * name (apply.py:155). */
  def rewriteAggNaming(query: String): String =
    AggNoAlias.replaceAllIn(query, m => {
      val f = m.group(1).toUpperCase
      val v = m.group(2)
      s"$f($v) AS ${f.toLowerCase}_$v"
    })
}
