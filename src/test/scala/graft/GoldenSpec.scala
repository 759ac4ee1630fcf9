package graft

/** Regression gate for the no-oracle queries: outputs must match the
  * committed golden checksums (regenerate deliberately with
  * `tools/run.sh graft.Golden`). */
class GoldenSpec extends SparkSpec {

  private lazy val golden: Map[String, (Long, String)] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Golden.GoldenPath)), "UTF-8")
    """"([a-z0-9_]+)": \{"rows": (\d+), "md5": "([0-9a-f]+)"\}""".r
      .findAllMatchIn(txt)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3))).toMap
  }

  Golden.Tracked.foreach { q =>
    test(s"golden: $q") {
      val (rows, md5) = Golden.checksum(SparkEntry.queries(q)(spark, sf))
      val (gRows, gMd5) = golden(q)
      assert(rows == gRows, s"$q row count drifted: $rows vs golden $gRows")
      assert(md5 == gMd5, s"$q content drifted (rows match: $rows)")
    }
  }
}
