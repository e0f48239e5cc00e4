package graft

import org.apache.spark.sql.functions._

import graft.operators.{VectorIndex, VectorOps}

class VectorIndexSpec extends SparkSpec {

  private def dump(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("qid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("persisted index search is identical to the in-memory search") {
    val embs = sources.Tables.embeddings(spark, sf)
    val queryIds = (0L until 10L).toSeq
    val path = tmpDir("ivfpq-index")

    // both paths share every trained artifact's seed, so results must
    // be IDENTICAL rows, not merely similar recall
    val written = VectorIndex.writeIvfPq(embs, path)
    val queries = VectorOps.collectQueries(embs, queryIds).toSeq

    val inMem = dump(VectorOps.ivfPqTopK(embs, queryIds))
    val viaWritten = dump(VectorOps.ivfPqSearch(written, queries, k = 10))
    val viaDisk = dump(VectorIndex.searchIvfPq(spark, path, queries))
    assert(viaWritten.sameElements(inMem),
      "search over the just-written model diverged from ivfPqTopK")
    assert(viaDisk.sameElements(inMem),
      "search over the re-loaded parquet index diverged from ivfPqTopK")
  }

  test("meta round-trips bit-exact and search plan prunes partitions") {
    val embs = sources.Tables.embeddings(spark, sf)
    val path = tmpDir("ivfpq-meta")
    val written = VectorIndex.writeIvfPq(embs, path)
    val loaded = VectorIndex.loadIvfPq(spark, path)

    assert(loaded.dim == written.dim && loaded.dsub == written.dsub &&
      loaded.m == written.m && loaded.kCent == written.kCent &&
      loaded.nprobe == written.nprobe)
    // doubles through parquet must be bit-exact, not approximately equal
    assert(loaded.centers.map(_.toSeq).toSeq == written.centers.map(_.toSeq).toSeq)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq) ==
      written.codebooks.map(_.map(_.toSeq).toSeq))

    // the search's cell filter must reach the parquet scan as a
    // PARTITION filter (pruned directories), not a post-scan Filter:
    // that is the index's entire read-cost contract
    val queries = VectorOps.collectQueries(embs, Seq(0L)).toSeq
    val plan = VectorOps.ivfPqSearch(loaded, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") ||
      plan.matches("(?s).*PartitionFilters: \\[.*cell.*"),
      s"cell filter did not become a partition filter:\n$plan")
    // and the pruned scan reads fewer partition dirs than nlist at
    // nprobe < nlist: count the probed cells from the model
    assert(loaded.nprobe < loaded.centers.length,
      "fixture must probe a strict subset for the pruning test to bite")
  }

  test("loading a non-index path fails loudly") {
    val path = tmpDir("ivfpq-bad")
    // meta with two rows — a partial/duplicated write must not load
    import spark.implicits._
    Seq(1, 2).toDF("x").write.parquet(s"$path/meta")
    val e = intercept[Exception](VectorIndex.loadIvfPq(spark, path))
    assert(e.getMessage.contains("meta") ||
      e.isInstanceOf[org.apache.spark.sql.AnalysisException])
  }
}
