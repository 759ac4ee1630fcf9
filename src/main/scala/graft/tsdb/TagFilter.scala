package graft.tsdb

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OpenTSDB tag-filter types → Catalyst Column predicates. Translation
  * happens at plan-construction time (plain Scala), so Catalyst sees only
  * built-in predicates it can push down to the parquet scan.
  */
object TagFilters {

  /** Glob → SQL LIKE pattern: escape LIKE metachars, then `*`→`%`, `?`→`_`. */
  def glob2like(glob: String): String =
    glob.flatMap {
      case '%'  => "\\%"
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case '*'  => "%"
      case '?'  => "_"
      case c    => c.toString
    }

  /** Compile one filter spec against the column holding the tag value. */
  def toPredicate(tagValue: Column, f: TagFilterSpec): Column = f.ftype match {
    case "literal_or"     => tagValue.isin(f.filter.split('|').toIndexedSeq: _*)
    case "not_literal_or" =>
      // null-safe: a null tag value is "not in the list" for OpenTSDB
      !coalesce(tagValue.isin(f.filter.split('|').toIndexedSeq: _*), lit(false))
    case "iliteral_or"    =>
      lower(tagValue).isin(f.filter.toLowerCase.split('|').toIndexedSeq: _*)
    case "not_iliteral_or" =>
      !coalesce(lower(tagValue).isin(
        f.filter.toLowerCase.split('|').toIndexedSeq: _*), lit(false))
    case "wildcard"       => tagValue.like(glob2like(f.filter))
    case "iwildcard"      => lower(tagValue).like(glob2like(f.filter.toLowerCase))
    case "regexp"         => tagValue.rlike(f.filter)
    // (?i) is the Java∩RE2 case-insensitivity prefix, so the SAME
    // pattern string works verbatim in the DuckDB oracle
    case "regexp_ci"      => tagValue.rlike("(?i)" + f.filter)
    case other => throw new IllegalArgumentException(s"unknown filter type: $other")
  }

  /** OpenTSDB `explicitTags`: the point's tag KEY SET is exactly the
    * queried set — no extra tags allowed. Sorted-array equality over
    * map_keys (canonical order on both sides, so it is a plain
    * comparison, not a subset test). */
  def explicitTags(tags: Column, keys: Seq[String]): Column =
    array_sort(map_keys(tags)) === typedLit(keys.sorted)

  /** Same, addressing a tag inside a MAP<STRING,STRING> tags column. */
  def toMapPredicate(tags: Column, f: TagFilterSpec): Column =
    toPredicate(element_at(tags, f.tagk), f)
}
