package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** The shared converged-clustering cache ([[ClusterOps.clusterPrep]]):
  * all six cluster entries read one persisted (membership, centroids)
  * pair per (session, sf dir) instead of re-running the k-means CTE
  * chain per entry. These tests pin the cache's CORRECTNESS contract:
  * repeat invocations serve identical results, a dir change invalidates
  * (results follow the new dir's data, stale caches don't leak through
  * the shared view names), and a drop forces a clean rebuild.
  */
class ClusterPrepSpec extends SparkTestBase {

  private def rows(name: String, d: String): Seq[String] =
    SparkEntry.queries(name)(spark, d).collect().map(_.toString).toSeq

  /** A second dir whose embeddings DIFFER from sfDir's (vectors negated
    * on odd dims — norms preserved, assignments changed), built once.
    */
  private lazy val altDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_clusterprep").toString
    Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id",
        "transform(embedding, (x, i) -> CASE WHEN i % 2 = 1 THEN -x ELSE x END) AS embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("repeat invocations on one dir serve identical results from the cache") {
    val first = rows("embed_kmeans", sfDir)
    assert(first.nonEmpty)
    assert(rows("embed_kmeans", sfDir) == first)
    // a sibling entry reads the same converged assignment — its cid set
    // must be consistent with the membership entry's
    val statsCids = SparkEntry.queries("embed_cluster_stats")(spark, sfDir)
      .select("cid").collect().map(_.getInt(0)).toSet
    val memberCids = SparkEntry.queries("embed_kmeans")(spark, sfDir)
      .select("cid").collect().map(_.getInt(0)).toSet
    assert(statsCids == memberCids)
  }

  test("a dir change invalidates the cached clustering") {
    val base = rows("embed_kmeans", sfDir)
    val alt = rows("embed_kmeans", altDir)
    assert(alt.nonEmpty)
    assert(alt != base, "altered embeddings must change the clustering — stale cache served")
    // switching BACK re-derives the original (the alt-dir prep was
    // evicted, not merely shadowed)
    assert(rows("embed_kmeans", sfDir) == base)
  }

  test("dropCaches forces a clean rebuild with identical results") {
    val before = rows("embed_silhouette", sfDir)
    ClusterOps.dropCaches(spark)
    assert(rows("embed_silhouette", sfDir) == before)
  }
}
