package graft

import org.apache.spark.sql.functions.col

/** Pins the rag_pipeline composite's OUTPUT, not just its row count: the
  * flagship is built from individually hash-gated components, but the
  * composition itself (graph build → seed KNN → degree-1 expansion → relation
  * KNN → assembly) could drift silently under refactors — this golden hash is
  * the driver-oracle-equivalent check for the one board row DuckDB can't
  * express in one query (HashEmbedder's md5 feature hash + the iterative
  * traversal). Canonicalization mirrors the driver's comparer: column names
  * sorted, every value stringified, rows sorted, md5 over the joined lines.
  *
  * If a DELIBERATE semantic change moves the hash, re-pin it from the
  * failure message (which prints the full 5/10-row canonical form).
  */
class RagPipelineGoldenSpec extends SparkSpec {

  private def canonical(dir: String): (String, Seq[String]) = {
    val df = SparkEntry.queries("rag_pipeline")(spark, dir)
    val cols = df.columns.sorted.toIndexedSeq
    val rows = df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("\u0001")).sorted.toSeq
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (md5, rows.map(r => r.replace('\u0001', '|')))
  }

  test("rag_pipeline output is pinned at sf0.001") {
    val (md5, rows) = canonical("/root/testdata/sf0.001")
    assert(md5 == "2c65209f337d0a86b38cf0395ea85d0a",
      s"rag_pipeline sf0.001 canonical output changed (md5=$md5):\n${rows.mkString("\n")}")
  }

  test("rag_pipeline output is pinned at sf0.01 (the driver's verify dir)") {
    val (md5, rows) = canonical("/root/testdata/sf0.01")
    assert(md5 == "99011bb5648c23a5421d6240d6dcbfcb",
      s"rag_pipeline sf0.01 canonical output changed (md5=$md5):\n${rows.mkString("\n")}")
  }
}
