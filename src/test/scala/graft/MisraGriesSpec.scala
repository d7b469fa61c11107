package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesAggregator

/** The two properties the `heavy_hitters` query leans on:
  * bounded summary size, and retention of every item whose true
  * frequency exceeds the n/(K+1) error bound — including across a
  * partial-summary MERGE, which is how the distributed form runs.
  */
class MisraGriesSpec extends AnyFunSuite {

  test("MG summary: size ≤ K, heavy items survive reduce+merge, counts undercount-bounded") {
    val k = 8
    val agg = new MisraGriesAggregator(k)
    val stream: Seq[String] =
      Seq.fill(500)("hot") ++
        (1 to 400).map(i => s"unique$i") ++
        Seq.fill(300)("warm")
    val n = stream.size

    // Two partitions reduced independently, then merged — the
    // distributed execution shape.
    val (s1, s2) = stream.splitAt(stream.length / 2)
    val b1 = s1.foldLeft(agg.zero)(agg.reduce)
    val b2 = s2.foldLeft(agg.zero)(agg.reduce)
    assert(b1.size <= k && b2.size <= k)
    val m = agg.finish(agg.merge(b1, b2))

    assert(m.size <= k, s"summary exceeded capacity: ${m.size}")
    val bound = n / (k + 1)
    assert(m.contains("hot"), "item with freq 500 > n/9 must survive")
    assert(m.contains("warm"), "item with freq 300 > n/9 must survive")
    // Counts never overcount and undercount by at most the bound.
    assert(m("hot") <= 500 && m("hot") >= 500 - bound)
    assert(m("warm") <= 300 && m("warm") >= 300 - bound)

    // Merge order must not break the guarantee (associativity up to
    // the retention property, not exact counts).
    val chunks = stream.grouped(100).toSeq
    val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.finish(bufs.reduce(agg.merge))
    assert(merged.size <= k)
    assert(merged.contains("hot") && merged.contains("warm"))
  }
}
