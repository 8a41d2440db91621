package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, lit, regexp_replace, when}

/** Path-string canonicalization shared by the row-level-delete read paths
  * (Iceberg positional deletes, Delta deletion vectors).
  *
  * Both formats key deleted rows by the DATA FILE's path string, but the
  * same local file legitimately appears as `/x`, `file:/x`, or `file:///x`
  * depending on which writer produced the manifest and which Hadoop
  * `FileStatus` Spark's `_metadata.file_path` reflects. Joining on raw
  * strings would silently resurrect deleted rows on a representation
  * mismatch, so both join sides are normalized to the `file:///x` form
  * here — once as a driver/executor string function, once as the identical
  * Catalyst [[Column]] pipeline (codegen'd, no UDF). Non-`file` schemes
  * (s3a, gs, hdfs) pass through untouched: object-store URIs are written
  * and listed in one canonical spelling.
  */
object PathUris {

  /** `/x` | `file:/x` | `file:///x` | `file://localhost/x` → `file:///x`.
    * A non-local authority (`file://host/x`) is PRESERVED verbatim rather
    * than folded into the path — host and first path segment are different
    * things, and conflating them would silently mismatch the delete
    * anti-join's other side. Both [[canon]] and [[canonCol]] apply the
    * same rule, so two authority-bearing spellings of the same file still
    * match each other. */
  def canon(s: String): String = {
    val withScheme = if (s.startsWith("/")) "file:" + s else s
    if (!withScheme.startsWith("file:")) withScheme
    else {
      val rest = withScheme.drop(5) // after "file:"
      if (rest.startsWith("//") && !rest.startsWith("///")) {
        // authority form: file://<authority>/<path>
        val authority = rest.drop(2).takeWhile(_ != '/')
        if (authority.isEmpty || authority == "localhost")
          "file:///" + rest.drop(2 + authority.length).dropWhile(_ == '/')
        else withScheme // foreign authority: a different location — keep
      } else "file:///" + rest.dropWhile(_ == '/')
    }
  }

  /** The same normalization as [[canon]], as a Catalyst expression. */
  def canonCol(c: Column): Column = {
    val withScheme =
      when(c.startsWith("/"), concat(lit("file:"), c)).otherwise(c)
    // file://localhost/x → file:///x; then file:/x | file:///+x →
    // file:///x, but NOT file://host/x (the lookahead keeps a non-empty
    // authority untouched, mirroring canon)
    regexp_replace(
      regexp_replace(withScheme, "^file://localhost/", "file:///"),
      "^file:(/(?!/)|///+)", "file:///")
  }

  /** Normalization for Spark's `_metadata.file_path`, which is a
    * percent-ENCODED URI string (`Path.toUri.toString` — a space in a
    * partition directory arrives as `%20`), while manifest/log paths are
    * raw strings: decode first, then normalize, or the delete anti-join
    * silently matches nothing on any URI-escapable character. `+` is
    * protected before `url_decode` because that function implements the
    * form-encoding variant (`+` → space), and `+` is a legal raw path
    * byte that `Path.toUri` leaves unescaped. */
  def canonMetaCol(c: Column): Column =
    canonCol(org.apache.spark.sql.functions.url_decode(
      regexp_replace(c, "\\+", "%2B")))

  /** Strict RFC 3986 percent-decoding: `%41` → `A`, multi-byte UTF-8
    * sequences reassembled, `+` left ALONE (it is a legal path byte —
    * `java.net.URLDecoder` is the form-encoding variant and would corrupt
    * it to a space). Malformed escapes pass through verbatim rather than
    * throwing: a literal `%` in a legacy path should not kill the read. */
  def pctDecode(s: String): String = {
    if (!s.contains('%')) return s
    val out = new java.lang.StringBuilder(s.length)
    val pending = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (pending.size() > 0) {
      out.append(new String(pending.toByteArray, "UTF-8")); pending.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val hex = c == '%' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))
      if (hex) {
        pending.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { flush(); out.append(c); i += 1 }
    }
    flush()
    out.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
}
