"""Distributed connected components — the transitive-closure stage of
dedup clustering (family-level keep decisions need one keeper per
CONNECTED COMPONENT of the verified near-dup pair graph, not per pair).

Algorithm: the alternating large-star / small-star iteration of Kiveris
et al., "Connected Components in MapReduce and Beyond" (SoCC'14) — the
standard shared-nothing CC algorithm (Spark GraphFrames and Dataflow use
the same shape). Both operations are expressed as ONE whole-partition
window min plus a distinct per half-round — no collect, no driver-side
graph, shuffle volume bounded by the (shrinking) edge-set size — and the
edge set provably converges to a star forest (every node → its component
minimum) in O(log^2 n) rounds; near-dup families (template-shaped, tiny
diameter) converge in 2-3.

Why not label-propagation (hash-min)? Its round count is the graph
DIAMETER — fine for star-shaped dup families, pathological on chains.
The alternating algorithm's round bound is data-independent, which is
the property a 100 TB job needs to promise a finish time.

Each round localCheckpoints its edge set: iterative lineage otherwise
compounds (round k would replay rounds 0..k-1) and the convergence-check
action would re-run the whole history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    m = F.least(F.col("a"), F.min("b").over(Window.partitionBy("a")))
    return (sym.withColumn("m", m)
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Point every smaller-or-equal neighbor of u at min(N⁻(u) ∪ {u})."""
    d = (e.select(F.greatest("a", "b").alias("a"),
                  F.least("a", "b").alias("b"))
         .filter(F.col("a") != F.col("b"))
         .withColumn("m", F.min("b").over(Window.partitionBy("a"))))
    return (d.filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(d.select("a", F.col("m").alias("b")))
            .distinct())


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 30) -> DataFrame:
    """(id, component) for every node of the undirected pair graph;
    ``component`` is the MINIMUM node id of the component (deterministic
    canonical label, directly usable as the dedup keeper id).

    Ids may be any orderable type (long doc ids, string hashes). Nodes
    appear only if they touch an edge — callers union isolated rows
    themselves. Raises after ``max_iter`` rounds without convergence
    (the alternating algorithm's O(log² n) bound makes 30 rounds ≈ 2^5.5
    billion nodes; hitting the cap means the input, not the budget)."""
    e = (pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct()
         .localCheckpoint(eager=True))

    def _sig(df: DataFrame) -> tuple:
        # ANSI mode: sum(xxhash64) overflows — bit_xor is the stable
        # order-free set fingerprint (CLAUDE.md)
        row = df.agg(F.count("*").alias("n"),
                     F.bit_xor(F.xxhash64("a", "b")).alias("h")).first()
        return (row["n"], row["h"])

    prev = _sig(e)
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = _sig(nxt)
        if sig == prev:
            e = nxt
            break
        prev, e = sig, nxt
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # converged edge set is a star forest: (member, component-min) edges
    return (e.select(F.col("a").alias("id"), F.col("b").alias("component"))
            .union(e.select(F.col("b").alias("id"),
                            F.col("b").alias("component")))
            .distinct())


def sssp_khop(edges: DataFrame, sources: DataFrame, k: int) -> DataFrame:
    """Bounded-hop (multi-source) weighted shortest paths — the
    Bellman-Ford relaxation as k map-reduce rounds: dist_{i+1}(v) =
    min(dist_i(v), min over edges (u,v) of dist_i(u) + w). Returns
    (id, distq) = the EXACT minimum path weight over paths of ≤ k
    edges from any source — a well-defined operator in its own right
    (k-hop reachability cost), and equal to the true SSSP whenever
    k ≥ the weighted-path hop diameter.

    ``edges``: (src, dst, wq) directed, int64 weights (callers quantize
    distances first — all arithmetic is exact integer min-plus, so
    Spark, Python, and the unrolled-round SQL oracle agree bit for
    bit). ``sources``: (id) — multi-source gives closest-facility
    semantics. Each round is ONE equi-join + ONE min aggregation
    (shuffle keyed by node id, map-side combinable); localCheckpoint
    per round caps the iterative lineage exactly like the CC rounds."""
    e = edges.select(F.col("src").alias("__s"), F.col("dst").alias("__d"),
                     F.col("wq").alias("__w"))
    dist = sources.select(F.col("id"), F.lit(0).cast("long").alias("distq"))
    for _ in range(int(k)):
        relaxed = (dist.join(e, dist["id"] == e["__s"])
                   .select(F.col("__d").alias("id"),
                           (F.col("distq") + F.col("__w")).alias("distq")))
        dist = (dist.unionByName(relaxed)
                .groupBy("id").agg(F.min("distq").alias("distq"))
                .localCheckpoint(eager=True))
    return dist
