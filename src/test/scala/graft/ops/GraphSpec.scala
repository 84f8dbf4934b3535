package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("assocRules: hand-computed support/conf/lift on a 4-basket fixture") {
    initQuiet()
    // baskets: {x,y}, {x,y}, {x,z}, {y} → N=4, s(x)=3, s(y)=3, s(z)=1
    // co(x,y)=2: conf x→y = 2/3, lift = 2*4/(3*3) = 0.888889
    val df = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (2L, "y"), // in-basket dup
      (3L, "x"), (3L, "z"), (4L, "y"))
      .toDF("b", "i")
    val out = Graph.assocRules(df, "b", "i").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(("x", "y")) == ((2L, 0.666667, 0.888889)))
    assert(out(("y", "x")) == ((2L, 0.666667, 0.888889)))
    assert(out(("x", "z")) == ((1L, 0.333333, 1.333333)))
    assert(out(("z", "x")) == ((1L, 1.0, 1.333333)))
    assert(!out.contains(("y", "z"))) // never co-occur
  }

  test("assocRules: apriori pruning is lossless at minCo > 1; basket cap truncates deterministically") {
    initQuiet()
    // x,y frequent (3 baskets each); z,w infrequent (1 each). At
    // minCo=2 only (x,y) qualifies, and pruning z/w before the pair
    // join must not change any output value (co ≤ min-support bound).
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (2L, "w"),
      (3L, "x"), (3L, "y"), (4L, "x"), (5L, "y"))
      .toDF("b", "i")
    val out = Graph.assocRules(df, "b", "i", minCo = 2L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // N=5 (basket 4,5 single-item but still counted), s(x)=4, s(y)=4, co=3
    assert(out.keySet == Set(("x", "y"), ("y", "x")))
    assert(out(("x", "y")) == ((3L, 0.75, 0.9375)))
    // reference: the unpruned semantics via minCo=1, filtered to co>=2
    val ref = Graph.assocRules(df, "b", "i").collect()
      .filter(_.getLong(2) >= 2L)
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out == ref, "apriori pruning changed the output")
    // cap=2 keeps the 2 smallest frequent items per basket — here the
    // frequent items ARE {x,y}, so the cap changes nothing
    val capped = Graph.assocRules(df, "b", "i", minCo = 2L,
        maxBasketSize = Some(2)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(capped(("x", "y")) == 3L)
  }

  test("triangles: 4-clique has 4 triangles, 3 per node; a path has none") {
    initQuiet()
    val clique = (for {
      a <- 1 to 4; b <- (a + 1) to 4
    } yield (a, b)).toDF("s", "d")
    val tri = Graph.triangles(clique, "s", "d").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(tri == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L))
    val path = Seq((1, 2), (2, 3), (3, 4)).toDF("s", "d")
    assert(Graph.triangles(path, "s", "d").count() == 0)
  }

  test("kHopDistances: min hop on a directed path with a shortcut, bounded") {
    initQuiet()
    // 1→2→3→4→5 plus shortcut 1→3: dist(3)=1, dist(4)=2, dist(5)=3
    val e = Seq((1, 2), (2, 3), (3, 4), (4, 5), (1, 3)).toDF("s", "d")
    val d3 = Graph.kHopDistances(e, "s", "d", lit(1), maxHops = 3).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(d3 == Map(1 -> 0, 2 -> 1, 3 -> 1, 4 -> 2, 5 -> 3))
    val d2 = Graph.kHopDistances(e, "s", "d", lit(1), maxHops = 2).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(!d2.contains(5) && d2(4) == 2)
  }

  test("mutualInfo: independent columns → 0; identical columns → ln(k)") {
    initQuiet()
    // independent 2×2 uniform
    val ind = (for { x <- Seq("a", "b"); y <- Seq("u", "v"); _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val ri = Graph.mutualInfo(ind, "x", "y").collect()(0)
    assert(ri.getLong(0) == 20L)
    assert(ri.getDouble(1) == 0.0 && ri.getDouble(2) == 0.0 && ri.getDouble(3) == 0.0)
    // perfectly dependent: y = x over 2 symbols → MI = ln 2, V = 1
    val dep = (for { x <- Seq("a", "b"); _ <- 1 to 7 } yield (x, x)).toDF("x", "y")
    val rd = Graph.mutualInfo(dep, "x", "y").collect()(0)
    assert(math.abs(rd.getDouble(1) - math.log(2)) < 1e-6)
    assert(rd.getDouble(3) == 1.0)
  }

  test("winnowing guarantee: docs sharing a substring of length >= w+k-1 share a fingerprint") {
    initQuiet()
    val rnd = new scala.util.Random(7)
    def s(n: Int) = rnd.alphanumeric.take(n).mkString
    val common = s(11) // w+k-1 = 8+4-1
    val docs = Seq(
      (1L, s(40) + common + s(40)),
      (2L, common + s(60)),
      (3L, s(80))) // no shared block
      .toDF("id", "txt")
    val fps = Graph.winnowFingerprints(docs, "id", "txt", k = 4, w = 8)
    val byDoc = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty) // the winnowing guarantee
    // density sanity: selected ≈ 2/(w+1) of positions, not all of them
    assert(byDoc(1L).size < 40 && byDoc(1L).size > 5)
    val pairs = Graph.sharedFingerprints(fps, minShared = 1L, maxDfFrac = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("winnowing: rightmost-min tie rule selects one fingerprint for a constant doc") {
    initQuiet()
    // all k-grams hash identically; each window's rightmost min is its
    // last position → selected set = {h} (one distinct hash)
    val docs = Seq((1L, "aaaaaaaaaaaaaaaa")).toDF("id", "txt")
    val fps = Graph.winnowFingerprints(docs, "id", "txt", k = 4, w = 8).collect()
    assert(fps.length == 1)
    val a = 'a'.toInt.toLong
    assert(fps(0).getLong(1) == ((a * 31 + a) * 31 + a) * 31 + a)
  }

  test("pageRank: 2-cycle is uniform; star center accumulates; ranks bounded") {
    initQuiet()
    val cyc = Seq(("a", "b", 1.0), ("b", "a", 1.0)).toDF("s", "d", "w")
    val nodes = Seq("a", "b").toDF("n")
    val rc = Graph.pageRank(cyc, "s", "d", "w", nodes, "n").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rc("a") - 0.5) < 1e-12 && math.abs(rc("b") - 0.5) < 1e-12)
    // star: 3 leaves all point at hub; hub dangles (leaks, documented)
    val star = Seq(("l1", "hub", 1.0), ("l2", "hub", 1.0), ("l3", "hub", 1.0))
      .toDF("s", "d", "w")
    val vs = Seq("hub", "l1", "l2", "l3").toDF("n")
    val rs = Graph.pageRank(star, "s", "d", "w", vs, "n", iters = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val base = 0.15 / 4 // (1-d)/N: leaves get exactly the teleport mass
    assert(math.abs(rs("l1") - (1.0 - 0.85) / 4) < 1e-12)
    assert(rs("hub") > 3 * base) // hub collects the leaves' rank
    assert(rs.values.forall(r => r > 0 && r < 1))
  }

  test("pmi: closed form on a hand basket set; npmi null when co = n") {
    initQuiet()
    // baskets 1:(a,b) 2:(a,b) 3:(a) 4:(c): n=4, c_a=3, c_b=2, co=2
    // pmi = ln(2·4/(3·2)) = ln(4/3); npmi = ln(4/3)/−ln(2/4)
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"))
      .toDF("bid", "item")
    val r = Graph.pmiPairs(df, "bid", "item").collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "b" && r.getLong(2) == 2)
    assert(math.abs(r.getDouble(5) - math.log(4.0 / 3)) < 1e-6)
    assert(math.abs(r.getDouble(6) -
      math.log(4.0 / 3) / -math.log(0.5)) < 2e-6)
    // a pair present in EVERY basket: normalizer −ln(1) = 0 → npmi null
    val full = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b")).toDF("bid", "item")
    val f = Graph.pmiPairs(full, "bid", "item").collect().head
    assert(f.getDouble(5) == 0.0 && f.isNullAt(6))
  }

  test("corpus queries return sane shapes at sf0.001") {
    initQuiet()
    val tri = Graph.triangleQuery(spark, sf).collect()
    assert(tri.nonEmpty && tri.forall(_.getLong(1) > 0))
    val bfs = Graph.bfsQuery(spark, sf).collect()
    assert(bfs.exists(r => r.getString(0) == "Brand#1" && r.getInt(1) == 0))
    assert(bfs.forall(_.getInt(1) <= 3))
    val pr = Graph.pageRankQuery(spark, sf).collect()
    assert(pr.length == 5) // five event types
    val total = pr.map(_.getDouble(1)).sum
    assert(total > 0.8 && total <= 1.000001) // dangling leak ≤ teleport bound
  }

  test("hits: pure star a->c, b->c makes c the sole authority") {
    initQuiet()
    val edges = Seq(("a", "c", 1L), ("b", "c", 1L)).toDF("s", "d", "w")
    val nodes = Seq("a", "b", "c").toDF("n")
    val out = Graph.hits(edges, "s", "d", "w", nodes, "n", iters = 3)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(math.abs(out("c")._1 - 1.0) < 1e-9) // all authority mass
    assert(math.abs(out("a")._2 - 0.5) < 1e-9) // hubs split evenly
    assert(math.abs(out("b")._2 - 0.5) < 1e-9)
    assert(out("c")._2 == 0.0) // c points at nothing
  }

  test("hitsQuery: auth and hub are L1-normalized shares") {
    initQuiet()
    val rows = Graph.hitsQuery(spark, sf).collect()
    assert(rows.length == 5)
    assert(math.abs(rows.map(_.getDouble(1)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }

  test("triangles+clustering: K3 gives cc=1, a path gives cc=null") {
    initQuiet()
    // K3 on {1,2,3} plus a pendant 3-4: deg(3)=3 with 1 triangle
    val edges = Seq((1, 2), (1, 3), (2, 3), (3, 4)).toDF("a", "b")
    val deg = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(deg == Map(1 -> 2L, 2 -> 2L, 3 -> 3L, 4 -> 1L))
    val tri = Graph.triangles(edges, "a", "b").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(tri == Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
    // cc: nodes 1,2 fully connected (2*1/(2*1)=1); node 3: 2*1/(3*2)=1/3
    assert(math.abs(2.0 * tri(3) / (deg(3) * (deg(3) - 1)) - 1.0 / 3) < 1e-9)
  }

  test("assortativityQuery: r bounded; edge-end degree sane") {
    initQuiet()
    val r = Graph.assortativityQuery(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val a = row.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    assert(row.getAs[Long]("n_edges") > 0)
    // mean degree over edge ENDS >= mean over nodes (size-biased)
    assert(row.getAs[Double]("avg_edge_end_deg") >= 1.0)
    assert(row.getAs[Long]("max_deg") >= 1L)
  }

  test("clusteringQuery: cc in [0,1]; null only when degree < 2") {
    initQuiet()
    val rows = Graph.clusteringQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getLong(1)
      if (r.isNullAt(3)) assert(deg < 2)
      else {
        val cc = r.getDouble(3)
        assert(cc >= 0.0 && cc <= 1.0 + 1e-9)
      }
    }
  }
}
