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
    case "wildcard"       => tagValue.like(glob2like(f.filter))
    case "iwildcard"      => lower(tagValue).like(glob2like(f.filter.toLowerCase))
    case "regexp"         => tagValue.rlike(f.filter)
    case other => throw new IllegalArgumentException(s"unknown filter type: $other")
  }

  /** Same, addressing a tag inside a MAP<STRING,STRING> tags column. */
  def toMapPredicate(tags: Column, f: TagFilterSpec): Column =
    toPredicate(element_at(tags, f.tagk), f)
}
