package graft

import org.apache.spark.sql.DataFrame

import graft.operators.TextOps

/** Checkpoint-artifact scale probe (methodology + results recorded in
  * PLANS.md; re-runnable any time):
  *
  *  1. rows + materialised bytes of the three O(total tokens)
  *     `localCheckpoint` artifacts the text operators persist — the
  *     langId tf table, the IDF-weighted posting index, the substring
  *     window table — at every SF dir given (default sf0.01 and
  *     sf0.1), pinning the linear-growth claim a 100 TB capacity plan
  *     rests on;
  *  2. wall time of the md5 vs rolling-polynomial substring-dedup
  *     profiles (same plan, different window hash — the O(n·k) vs
  *     O(n) bytes-hashed trade documented on the kernels);
  *  3. decontamination Bloom-prefilter selectivity: corpus shingles
  *     vs truly-shared vs sketch candidates — the fraction of the
  *     corpus the confirmation join never sees.
  *
  * Args: SF dirs (defaults to /root/testdata/sf0.01 /root/testdata/sf0.1).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    def probe(sf: String, name: String, df: DataFrame): Unit = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val cp = df.localCheckpoint()
      val rows = cp.count()
      val info = sc.getRDDStorageInfo.filterNot(i => before(i.id))
      val mb = info.map(i => i.memSize + i.diskSize).sum / 1e6
      println(f"[scaleprobe] $sf $name rows=$rows bytesMB=$mb%.1f")
      // RDD-level release — Dataset.unpersist would be a no-op here
      BenchUtil.releaseNewRdds(sc, before)
    }

    for (dir <- dirs) {
      val sf = dir.split('/').last
      val docs = graft.sources.Tables.documents(spark, dir)
      probe(sf, "langid_tf", TextOps.langIdTf(docs))
      probe(sf, "cosine_weighted_index", TextOps.cosineWeightedIndex(docs))
      probe(sf, "substring_window_table", TextOps.substringWindowTable(docs))
      // profile timing: 3 passes each, min (the Bench protocol); the
      // six window-table checkpoints the passes create are released
      // before moving on so later dirs measure on a clean BlockManager
      val before = sc.getPersistentRDDs.keySet.toSet
      val md5T = BenchUtil.minOf(3)(BenchUtil.sink(TextOps.substringDedup(docs)))
      val rollT = BenchUtil.minOf(3)(BenchUtil.sink(TextOps.substringDedupRolling(docs)))
      BenchUtil.releaseNewRdds(sc, before)
      println(f"[scaleprobe] $sf substring md5=$md5T%.2fs rolling=$rollT%.2fs ratio=${rollT / md5T}%.2f")
      // bloom-prefilter selectivity over the gate's corpus/bench
      // split. The prefilter in decontaminate runs on RAW shingles
      // (before the stop-shingle cap — the reorder that keeps
      // non-candidates out of every exchange), so raw distinct grams
      // IS the denominator the sketch actually filters.
      import org.apache.spark.sql.functions.col
      val beforeBloom = sc.getPersistentRDDs.keySet.toSet
      val corpusGrams = TextOps.shingles(docs.filter(col("doc_id") % 100 =!= 0))
        .select("s").distinct().localCheckpoint()
      val benchGrams = TextOps.shingles(docs.filter(col("doc_id") % 100 === 0))
        .select("s").distinct().localCheckpoint()
      val (total, truth, cand) = BenchUtil.bloomStats(corpusGrams, benchGrams, 16)
      BenchUtil.releaseNewRdds(sc, beforeBloom)
      println(f"[scaleprobe] $sf bloom grams=$total shared=$truth candidates=$cand " +
        f"joinInputFrac=${cand.toDouble / total}%.5f fp=${cand - truth}")
    }
    spark.stop()
  }
}
