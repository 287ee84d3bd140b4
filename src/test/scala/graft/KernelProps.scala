package graft

import graft.functions.{Scored, TopKAggregator, TopKBuf}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM property checks for the aggregation kernels — no Spark jobs,
  * so these run at full ScalaCheck breadth (unlike StoreProps).
  */
object KernelProps extends Properties("Kernels") {

  private val kGen = Gen.choose(1, 8)
  private val itemsGen = Gen.listOf(
    for {
      score <- Gen.choose(0, 50).map(_ / 10.0) // coarse scores force ties
      id <- Gen.choose(0L, 10000L)
    } yield (score, id)
  )

  /** Reference semantics: sort by (score DESC, vecId ASC), take k. */
  private def refTopK(items: Seq[Scored], k: Int): Seq[Scored] =
    items.sortBy(s => (-s.score, s.vecId)).take(k)

  property("TopKAggregator == sort-take under any partitioning and order") =
    forAll(itemsGen, kGen, Gen.choose(0, 1000), Gen.choose(1, 7)) { (raw, k, seed, parts) =>
      // unique ids: duplicates would make the reference order ambiguous
      val items = raw.distinctBy(_._2).map { case (s, id) => Scored(1L, s, id) }
      val agg = new TopKAggregator(k)
      val shuffled = new scala.util.Random(seed).shuffle(items)
      val bufs = if (shuffled.isEmpty) Seq(agg.zero)
        else shuffled.grouped(math.max(1, shuffled.size / parts)).toSeq
          .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(TopKBuf(Vector.empty))(agg.merge)
      val bounded = bufs.forall(_.items.size <= k)
      bounded && agg.finish(merged).items == refTopK(items, k)
    }

  property("TopKAggregator merge is associative on random buffers") =
    forAll(itemsGen, itemsGen, itemsGen, kGen) { (ra, rb, rc, k) =>
      // disjoint id spaces so cross-buffer duplicates cannot arise
      val a = ra.distinctBy(_._2).map { case (s, id) => Scored(1L, s, id * 3) }
      val b = rb.distinctBy(_._2).map { case (s, id) => Scored(1L, s, id * 3 + 1) }
      val c = rc.distinctBy(_._2).map { case (s, id) => Scored(1L, s, id * 3 + 2) }
      val agg = new TopKAggregator(k)
      def buf(xs: Seq[Scored]) = xs.foldLeft(agg.zero)(agg.reduce)
      val left = agg.merge(agg.merge(buf(a), buf(b)), buf(c))
      val right = agg.merge(buf(a), agg.merge(buf(b), buf(c)))
      left.items == right.items
    }

  property("shingleHashes: sorted, and |hashes| == |distinct shingles|") =
    forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "dog", "cat")), Gen.choose(1, 4)) { (toks, k) =>
      import graft.functions.TextKernels
      val text = toks.mkString(" ")
      val hs = TextKernels.shingleHashes(text, k)
      val sorted = hs.sameElements(hs.sorted)
      val expected = TextKernels.distinctShingles(text, k).length
      sorted && hs.length == expected
    }
}
