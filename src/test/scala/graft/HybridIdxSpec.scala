package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** search_hybrid_rrf_idx (round-16 verdict #7): the served-ANN dense
  * leg must fuse to essentially the same ranking as the brute leg —
  * fused top-10 overlap ≥ 0.9 per the recall-floor precedent — and the
  * second call must serve the cached index, not rebuild.
  */
class HybridIdxSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fused top-10 overlap vs the brute dense leg >= 0.9; index reused") {
    val s = spark.newSession()
    def fusedPairs(q: String): Set[(Long, Long)] =
      SparkEntry.queries(q)(s, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = fusedPairs("search_hybrid_rrf")
    val b0 = graft.operators.SimIndexes.builds
    val served = fusedPairs("search_hybrid_rrf_idx")
    // memo → artifact → build: the first call builds at most once (and
    // not at all when a committed artifact from a previous run serves)
    val b1 = graft.operators.SimIndexes.builds
    assert(b1 <= b0 + 1, "first call must install the index at most once")
    val servedAgain = fusedPairs("search_hybrid_rrf_idx")
    assert(graft.operators.SimIndexes.builds == b1,
      "second call must reuse the cached index")
    assert(servedAgain === served, "served form unstable across cached calls")
    val overlap = (brute intersect served).size.toDouble / brute.size
    assert(overlap >= 0.9,
      f"fused-rank overlap $overlap%.3f < 0.9 (brute=${brute.size}, served=${served.size})")
    // the lexical leg is shared code — a fused pair missing from the
    // brute form can only come from the dense leg's approximation
    graft.operators.SimIndexes.clear(s)
  }
}
