package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by ALTERNATING LARGE-STAR /
  * SMALL-STAR (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the 100 TB-shape CC used by the MinHash-LSH dedup
  * pipeline (TextQueries.q48/q51).
  *
  * Why not plain min-label propagation: propagation needs O(component
  * diameter) rounds — an adversarial near-dup CHAIN (doc₁~doc₂~…~docₙ)
  * takes n rounds. Star operations contract whole neighborhoods onto
  * their minimum each round, converging in O(log n) rounds on chains
  * (TextDedupSpec asserts ≤ 12 rounds on a 500-link chain) and leaving
  * every component as a star centered at its minimum vertex.
  *
  *   large-star: ∀u, ∀v ∈ Γ(u) with v > u: emit (v, min(Γ(u) ∪ {u}))
  *   small-star: orient edges to (max, min); ∀u: emit
  *               (v, m) for v ∈ Γ₋(u) ∪ {u} \ {m}, m = min(Γ₋(u) ∪ {u})
  *
  * Both are one groupBy(min) + one join each — every step shards by
  * vertex id, nothing is driver-side, and edge sets shrink monotonically
  * toward the star fixpoint. Convergence is tested exactly: an iteration
  * that leaves the canonical (max,min) edge set unchanged is the
  * fixpoint (stars are invariant under both operations).
  */
object ConnectedComponents {

  /** Labels every vertex with its component minimum.
    *
    * ADAPTIVE: the star rounds are driver-latency-bound (each is a
    * handful of jobs), which swamps small graphs — and the edge set an
    * LSH-verify stage emits is usually tiny relative to the corpus. So
    * a graph at or below `smallGraphThreshold` edges (counted first;
    * the bound makes the driver memory O(threshold), never O(input))
    * short-circuits to an in-driver union-find whose labels broadcast
    * back — the same small-side adaptivity Spark applies to broadcast
    * joins. Larger graphs take the distributed star rounds unchanged.
    * Both paths produce the identical component-minimum labeling
    * (DedupScaleGuardSpec pins equality).
    *
    * @param edges    undirected edge list, two LONG columns (u, v);
    *                 self-loops and duplicates tolerated
    * @param vertices one LONG id column — vertices with no edges become
    *                 singleton components
    * @return (labels DataFrame (id, comp), rounds run; 0 rounds on the
    *         small-graph path). The labels are CACHED AND MATERIALIZED
    *         (round edge sets live in per-round reliable checkpoints,
    *         not executor storage); the caller owns the unpersist.
    */
  def label(edges: DataFrame, vertices: DataFrame, maxRounds: Int = 50,
            smallGraphThreshold: Long = 100000L): (DataFrame, Int) = {
    val spark = edges.sparkSession
    // each round composes `cur` into itself ~12× (unions + self-joins),
    // so an uncheckpointed lineage grows EXPONENTIALLY — truncate it
    // every round with a reliable checkpoint (edge sets are tiny: two
    // longs per non-root vertex and shrinking)
    graft.util.Ckpt.ensureDir(spark.sparkContext)
    val vcol = vertices.columns.head
    val Seq(uc, vc) = edges.columns.take(2).toSeq
    // canonical form: (u, v) with u > v, no self-loops, distinct
    var cur = edges
      .select(greatest(col(uc), col(vc)).as("u"), least(col(uc), col(vc)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .checkpoint()

    if (smallGraphThreshold > 0 && cur.count() <= smallGraphThreshold) {
      // ---- small-graph fast path: bounded driver union-find ----
      val es = cur.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        // union-by-min ⇒ every root is its component's minimum
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val comp = es.iterator.flatMap { case (a, b) => Iterator(a, b) }
        .toSet[Long].toSeq.map(v => (v, find(v)))
      val sess = spark
      import sess.implicits._
      val compDf = comp.toDF(vcol, "comp")
      val labels = vertices.select(col(vcol))
        .join(broadcast(compDf), Seq(vcol), "left")
        .select(col(vcol), coalesce(col("comp"), col(vcol)).as("comp"))
        .cache()
      labels.count()
      return (labels, 0)
    }

    var rounds = 0
    var done = cur.isEmpty
    while (!done && rounds < maxRounds) {
      val next = canonical(smallStar(largeStar(cur))).checkpoint()
      // exact fixpoint test (star edge sets are invariant under both ops):
      // symmetric difference empty ⟺ set equality, probed in ONE action —
      // rounds are driver-latency-bound on small edge sets, so every
      // saved job round-trip counts
      done = next.withColumn("side", lit(1))
        .unionByName(cur.withColumn("side", lit(2)))
        .groupBy("u", "v").agg(sum("side").as("s"))
        .filter(col("s") =!= 3).isEmpty
      cur = next
      rounds += 1
    }
    // at the fixpoint every component is a star centered at its min:
    // each non-center u carries exactly the edge (u, center)
    val roots = cur.groupBy(col("u").as(vcol)).agg(min("v").as("comp"))
    val labels = vertices.select(col(vcol))
      .join(roots, Seq(vcol), "left")
      .select(col(vcol), coalesce(col("comp"), col(vcol)).as("comp"))
      .cache()
    labels.count() // materialize while the final edge checkpoint exists
    (labels, rounds)
  }

  private def canonical(e: DataFrame): DataFrame =
    e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** (v, min(Γ(u) ∪ {u})) for every v ∈ Γ(u), v > u — on the symmetrized
    * neighbor list.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Orient to (u = max, v = min); connect u and all its smaller
    * neighbors to m = min(Γ₋(u) ∪ {u}) (= min neighbor, since all < u).
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = canonical(e)
    val withM = or.join(or.groupBy("u").agg(min("v").as("m")), "u")
    withM.filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(withM.select(col("u"), col("m").as("v")))
  }
}
