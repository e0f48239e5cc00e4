package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextOps, VectorOps}

/** ANN-fidelity + shared-index measurement main (methodology recorded
  * in PLANS.md; re-runnable any time):
  *
  *  1. recall@10 of the IVF and IVF-PQ search paths against brute-force
  *     cosine ground truth, across nprobe ∈ {1, nlist/4 (auto), nlist}
  *     — the empirical leg of the recall/cost dial both operators
  *     document;
  *  2. wall time of the self-contained Jaccard + containment gate
  *     queries vs [[TextOps.setSimilarityPairs]]' shared materialised
  *     overlap index — the production cost model when both projections
  *     are consumed.
  *
  * Env: `SPARK_GRAFT_SF_DIR` (default sf0.1).
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.sources.Tables.readTable(spark, sfDir, "embeddings")
    val total = emb.count()
    val nlist = math.min(4096L, math.max(16L,
      math.round(math.sqrt(total.toDouble)))).toInt
    val queryIds = (0L until 50L).toSeq
    val k = 10

    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }

    val truth = topSet(VectorOps.cosineTopK(emb, queryIds, k))
    require(queryIds.forall(truth.contains),
      s"ground truth missing query vec_ids ${queryIds.filterNot(truth.contains)} — " +
        s"does $sfDir/embeddings contain them?")
    def recall(got: Map[Long, Set[Long]]): Double =
      queryIds.map(q => (truth(q) & got.getOrElse(q, Set.empty)).size.toDouble / k)
        .sum / queryIds.size

    println(f"[annrecall] sf=$sfDir corpus=$total nlist=$nlist queries=${queryIds.size} k=$k")
    for (nprobe <- Seq(1, math.max(1, nlist / 4), nlist)) {
      val rIvf = recall(topSet(
        VectorOps.ivfTopK(emb, queryIds, k, nlist = nlist, nprobe = nprobe)))
      val rIvfPq = recall(topSet(
        VectorOps.ivfPqTopK(emb, queryIds, k, nlist = nlist, nprobe = nprobe)))
      println(f"[annrecall] nprobe=$nprobe%4d ivf_recall@10=$rIvf%.3f ivfpq_recall@10=$rIvfPq%.3f")
    }
    // PQ-only ADC (no routing loss): isolates quantization error across
    // the bits-per-vector dial (m sub-spaces × log2(kCent) bits each)
    for ((m, kc) <- Seq((8, 16), (16, 16), (16, 64), (32, 16))) {
      val rPq = recall(topSet(
        VectorOps.pqTopK(emb, queryIds, k, m = m, kCent = kc)))
      val bits = m * (math.log(kc) / math.log(2)).round
      println(f"[annrecall] adc-only m=$m%2d kCent=$kc%3d bits=$bits%3d pq_recall@10=$rPq%.3f")
    }

    // shared-index timing: 3 passes each, min (same protocol as Bench)
    val docs = graft.sources.Tables.readTable(spark, sfDir, "documents")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val separate = (1 to 3).map(_ => time {
      sink(TextOps.jaccardPairs(docs, threshold = 0.5))
      sink(TextOps.containmentPairs(docs, threshold = 0.8))
    }).min
    val shared = (1 to 3).map(_ => time {
      val (j, c) = TextOps.setSimilarityPairs(docs)
      sink(j); sink(c)
    }).min
    println(f"[annrecall] set-similarity separate=$separate%.2fs sharedIndex=$shared%.2fs ratio=${shared / separate}%.2f")
    spark.stop()
  }
}
