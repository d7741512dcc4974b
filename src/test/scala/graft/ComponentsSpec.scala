package graft

import graft.dedup.{Components, MinHash}

/** Connected-components near-dup clustering (round-3 replacement for the
  * single-link keep-first approximation). The hub case is the one
  * single-link gets WRONG: edges (a,c) and (b,c) with a≁b form one
  * component, so exactly one doc survives — single-link kept two. */
class ComponentsSpec extends SparkSuiteBase {
  import spark.implicits._

  test("Components.of: chain merges transitively to the min root") {
    val pairs = Seq(("b", "c"), ("a", "b"), ("d", "e"), ("c", "d"))
      .toDF("id_a", "id_b") // chain a-b-c-d-e presented out of order
    val comps = Components.of(pairs)
      .as[(String, String)].collect().toMap
    assert(comps == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a", "e" -> "a"))
  }

  test("Components.of: 50-hop chain converges within default maxIter (pointer jumping)") {
    // driverEdgeLimit = 0 forces the DISTRIBUTED loop. Diameter 49 >
    // maxIter 20: plain label propagation would split this chain; pointer
    // jumping doubles reach per iteration (~log2(49) ≈ 6)
    val ids = (0 until 50).map(i => f"n$i%02d")
    val pairs = ids.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("id_a", "id_b")
    val comps = Components.of(pairs, driverEdgeLimit = 0).as[(String, String)].collect().toMap
    assert(comps.size == 50)
    assert(comps.values.forall(_ == "n00"), comps.filterNot(_._2 == "n00").take(3).toString)
  }

  test("Components.of: driver union-find and distributed loop agree") {
    // mixed shapes: chain, hub, disjoint pair, isolated edge
    val pairs = Seq(("b", "c"), ("a", "b"), ("h1", "hub"), ("h2", "hub"),
      ("p1", "p2"), ("q9", "q1")).toDF("id_a", "id_b")
    val small = Components.of(pairs).as[(String, String)].collect().toMap
    val dist = Components.of(pairs, driverEdgeLimit = 0).as[(String, String)].collect().toMap
    assert(small == dist)
    assert(small("c") == "a" && small("h2") == "h1" && small("q9") == "q1")
  }

  test("Components.of: disjoint clusters keep separate roots") {
    val pairs = Seq(("x2", "x1"), ("y1", "y2"), ("y2", "y3")).toDF("id_a", "id_b")
    val comps = Components.of(pairs).as[(String, String)].collect().toMap
    assert(comps == Map("x1" -> "x1", "x2" -> "x1", "y1" -> "y1", "y2" -> "y1", "y3" -> "y1"))
  }

  test("chain corpus A~B~C with A≁C keeps exactly one doc") {
    val a = corpus.PageGen.prose(29, 1, 100, 1)
    val extra1 = (1 to 12).map(i => s"zzalpha$i").mkString(" ")
    val extra2 = (1 to 12).map(i => s"zzbeta$i").mkString(" ")
    val b = a + " " + extra1
    val c = b + " " + extra2
    val t = 0.85
    // self-validating preconditions: a~b, b~c above threshold; a≁c below
    assert(MinHash.jaccard(MinHash.shingles(a), MinHash.shingles(b)) >= t)
    assert(MinHash.jaccard(MinHash.shingles(b), MinHash.shingles(c)) >= t)
    assert(MinHash.jaccard(MinHash.shingles(a), MinHash.shingles(c)) < t)

    val others = (0 until 10).map(i => (s"o$i", corpus.PageGen.prose(31, i.toLong, 90, i)))
    val df = (others ++ Seq(("na", a), ("nb", b), ("nc", c))).toDF("id", "text")
    val out = MinHash.dropNearDups(df, "id", "text", t)
      .select("id").as[String].collect().toSet
    assert(out.intersect(Set("na", "nb", "nc")) == Set("na"),
      s"chain survivors: ${out.intersect(Set("na", "nb", "nc"))}")
    assert(others.map(_._1).toSet.subsetOf(out))
  }

  test("hub corpus a~c, b~c with a≁b keeps exactly one doc (true CC, not single-link)") {
    // two distinct mutants of a shared base: each ~0.89-similar to the base
    // but only ~0.8-similar to each other — at threshold 0.85 the base "nc"
    // (largest id) is the hub of edges (na,nc) and (nb,nc) with NO (na,nb)
    // edge. Single-link keep-first dropped only id_b's (= nc) and kept BOTH
    // mutants; true CC keeps exactly the component root.
    val base = corpus.PageGen.prose(37, 1, 100, 1)
    val a = base + " " + (1 to 12).map(i => s"qqleft$i").mkString(" ")
    val b = base + " " + (1 to 12).map(i => s"qqright$i").mkString(" ")
    val t = 0.85
    assert(MinHash.jaccard(MinHash.shingles(a), MinHash.shingles(base)) >= t)
    assert(MinHash.jaccard(MinHash.shingles(b), MinHash.shingles(base)) >= t)
    assert(MinHash.jaccard(MinHash.shingles(a), MinHash.shingles(b)) < t)

    val df = Seq(("na", a), ("nb", b), ("nc", base)).toDF("id", "text")
    val out = MinHash.dropNearDups(df, "id", "text", t)
      .select("id").as[String].collect().toSet
    // one component {na, nb, nc} -> only the min id survives
    assert(out == Set("na"), s"hub survivors: $out")
  }
}
