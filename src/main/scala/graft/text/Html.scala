package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * HTML-to-text extraction for web-corpus curation — the C4-style front step
 * that turns crawled markup into trainable text. Deliberately defined AS a
 * deterministic regex chain (not a DOM parse): every pattern is RE2-safe
 * (no backreferences/lookaround, inline `(?is)` flags only), so the exact
 * same patterns behave identically under Spark's Java regex and RE2-based
 * engines — the DuckDB oracle replays the chain verbatim with the 'g' flag.
 *
 * Steps, in order (order is load-bearing — entities decode AFTER tag
 * stripping so `&lt;b&gt;` stays literal text):
 *  1. drop `<script>`/`<style>` elements INCLUDING their content;
 *  2. drop HTML comments;
 *  3. every remaining tag becomes one space (block/inline distinction is
 *     deliberately not modeled — the whitespace collapse folds either way);
 *  4. decode the five named entities + `&nbsp;`; numeric character
 *     references become one space (decoding arbitrary code points is not
 *     expressible as an engine-portable regex — documented loss);
 *  5. collapse whitespace runs, trim.
 *
 * All five steps are codegen'd `regexp_replace` projections — narrow, no
 * UDF, no shuffle, streaming-legal.
 */
object Html {

  val ScriptStylePattern: String =
    "(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>"
  val CommentPattern: String = "(?s)<!--.*?-->"
  val TagPattern: String = "<[^>]*>"
  val NumericEntityPattern: String = "&#[0-9]{1,8};|&#[xX][0-9A-Fa-f]{1,6};"
  val WhitespacePattern: String = "[ \\t\\r\\n]+"

  /** Extract visible text from HTML markup; plain text passes through
    * unchanged (modulo whitespace collapse). */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, ScriptStylePattern, " ")
    val noComment = regexp_replace(noScript, CommentPattern, " ")
    val noTags = regexp_replace(noComment, TagPattern, " ")
    val named = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&nbsp;", " "),
              "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      NumericEntityPattern, " ")
    // &amp; LAST so double-escaped entities don't decode twice
    val decoded = regexp_replace(named, "&amp;", "&")
    trim(regexp_replace(decoded, WhitespacePattern, " "))
  }
}
