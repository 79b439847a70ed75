package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → plain-text extraction — the WET-generation step of a web-crawl
  * training pipeline (reference pipeline's scraper consumes immoweb HTML via
  * regex extraction, scraper.py:200-236; this is the corpus-scale general
  * form). Pure codegen'd regexp/replace Column chain: no parser library, no
  * UDF, runs inside whole-stage codegen. Patterns are RE2-compatible
  * (inline (?is) flags, non-greedy, no lookarounds) so external engines
  * reproduce extraction bit-for-bit.
  *
  * Pipeline: drop script/style subtrees and comments → block-level tags
  * become newlines → remaining tags vanish → minimal entity decode
  * (&amp; LAST, single-pass semantics) → whitespace normalization.
  */
object HtmlText {

  def stripScripts(html: Column): Column =
    regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")

  def stripComments(html: Column): Column =
    regexp_replace(html, "(?s)<!--.*?-->", " ")

  /** Block-level closers/br → newline so paragraph structure survives. */
  def blockBreaks(html: Column): Column =
    regexp_replace(html, "(?i)<br[^>]*>|</p>|</div>|</h[1-6]>|</li>|</tr>", "\n")

  def stripTags(html: Column): Column =
    regexp_replace(html, "<[^>]+>", " ")

  /** Single-pass entity decode for the common five; &amp; decoded last so
    * "&amp;lt;" yields the literal "&lt;" (correct single-pass semantics).
    */
  def decodeEntities(c: Column): Column = {
    val step = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ").foldLeft(c) {
      case (acc, (e, ch)) => replace(acc, lit(e), lit(ch))
    }
    replace(step, lit("&amp;"), lit("&"))
  }

  /** Collapse runs of spaces/tabs to one space, whitespace runs containing a
    * newline to one newline, and trim. */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[ \t]+", " "), " *\n[ \n]*", "\n"))

  def htmlToText(html: Column): Column =
    normalizeWs(decodeEntities(stripTags(blockBreaks(stripComments(stripScripts(html))))))

  def htmlTitle(html: Column): Column =
    trim(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))
}
