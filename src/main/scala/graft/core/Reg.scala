package graft.core

/** Query-registry construction guards.
  *
  * The operator surface lives in 1000-line `Map(...)` literals, and
  * Scala's Map.apply silently keeps the LAST entry for a duplicated
  * key — a re-registered query name shadows the original with no
  * warning anywhere (r13 nearly shipped a second `llm_embed_sq8` whose
  * oracle landed on one copy and whose plan on the other). These
  * builders fail construction loudly instead, at class-init — i.e. the
  * very first `sbt test` / Verify run, never in production.
  */
object Reg {
  /** `Map(...)` that REFUSES duplicate keys. */
  def uniqueMap[V](pairs: (String, V)*): Map[String, V] = {
    val dups = pairs.groupBy(_._1).collect { case (k, vs) if vs.sizeIs > 1 => k }
    require(dups.isEmpty,
      s"duplicate query registrations: ${dups.toSeq.sorted.mkString(", ")}")
    pairs.toMap
  }

  /** `++` over module maps that REFUSES cross-module key collisions. */
  def disjointUnion[V](maps: Map[String, V]*): Map[String, V] = {
    val merged = maps.reduce(_ ++ _)
    if (merged.size != maps.map(_.size).sum) {
      val dups = maps.flatMap(_.keys).groupBy(identity)
        .collect { case (k, ks) if ks.sizeIs > 1 => k }
      throw new IllegalArgumentException(
        s"query name registered by more than one module: ${dups.toSeq.sorted.mkString(", ")}")
    }
    merged
  }
}
