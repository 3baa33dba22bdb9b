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
 *     references either become one space (the default, engine-portable
 *     regex step any SQL engine replays verbatim) or decode to their
 *     actual code points via the codegen'd
 *     [[graft.functions.DecodeNumericEntities]] kernel
 *     (`decodeNumericEntities = true` — the curation-quality mode; its
 *     oracle is a planted golden fixture, since computing a character
 *     from digits is not expressible as a portable regex);
 *  5. collapse whitespace runs, trim.
 *
 * Every step is a codegen'd projection — narrow, no UDF, no shuffle,
 * streaming-legal — in both modes.
 */
object Html {

  val ScriptStylePattern: String =
    "(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>"
  val CommentPattern: String = "(?s)<!--.*?-->"
  val TagPattern: String = "<[^>]*>"
  val NumericEntityPattern: String = "&#[0-9]{1,8};|&#[xX][0-9A-Fa-f]{1,6};"
  val WhitespacePattern: String = "[ \\t\\r\\n]+"

  /** Extract visible text from HTML markup; plain text passes through
    * unchanged (modulo whitespace collapse). `decodeNumericEntities = true`
    * decodes `&#...;` references to their code points (kernel step) instead
    * of collapsing them to a space (portable regex step).
    * `decodeNamedEntities = true` replaces the whole entity step with the
    * one-pass [[graft.functions.DecodeHtmlEntities]] kernel: the full
    * HTML 4.01 named set (+ `apos`) AND numeric references decode together,
    * left-to-right, so double-escapes (`&amp;eacute;`) drop exactly one
    * level with no `&amp;`-last ordering trick — this mode subsumes
    * `decodeNumericEntities`. */
  def stripHtml(c: Column, decodeNumericEntities: Boolean = false,
                decodeNamedEntities: Boolean = false): Column = {
    val noScript = regexp_replace(c, ScriptStylePattern, " ")
    val noComment = regexp_replace(noScript, CommentPattern, " ")
    val noTags = regexp_replace(noComment, TagPattern, " ")
    if (decodeNamedEntities)
      return trim(regexp_replace(
        graft.functions.vectors.decode_html_entities(noTags), WhitespacePattern, " "))
    val namedDone = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&nbsp;", " "),
            "&lt;", "<"),
          "&gt;", ">"),
        "&quot;", "\""),
      "&apos;", "'")
    val numericDone =
      if (decodeNumericEntities)
        graft.functions.vectors.decode_numeric_entities(namedDone)
      else regexp_replace(namedDone, NumericEntityPattern, " ")
    // &amp; LAST so double-escaped entities don't decode twice
    val decoded = regexp_replace(numericDone, "&amp;", "&")
    trim(regexp_replace(decoded, WhitespacePattern, " "))
  }
}
