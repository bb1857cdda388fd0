"""Connected components over candidate-pair edges — the step that turns
near-duplicate PAIRS into dedup DECISIONS (one representative per
cluster, drop the rest). The reference has no graph surface (SURVEY.md
§2.7); this is a beyond-parity training-data operator, the standard
final stage of MinHash/SimHash dedup pipelines.

Scale design: min-label propagation. Each iteration is one distributed
join + partial-aggregated min — label traffic is O(edges), keys are doc
ids (uniform). Convergence needs O(graph diameter) iterations; LSH dedup
graphs are star/clique-shaped (diameter ≤ ~2 per bucket, short chains
across buckets), so 3-5 iterations are typical regardless of corpus
size. Lineage is truncated with localCheckpoint per iteration (the
standard iterative-Spark pattern — without it the plan doubles each
round), and the per-iteration driver action is a single scalar
convergence count, not a collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min
    node id in the node's connected component.

    Raises after ``max_iter`` non-converged iterations rather than
    returning wrong labels — LSH dedup graphs converge in a handful of
    rounds, so hitting the cap means the input is not the expected
    pair-graph shape (e.g. a long path graph) and the caller should
    raise the cap explicitly.
    """
    # Symmetrize once; both directions are needed so min labels flow both
    # ways along every edge.
    a, b = F.col(id_a), F.col(id_b)
    edges = (
        pairs.select(a.alias("src"), b.alias("dst"))
        .unionByName(pairs.select(b.alias("src"), a.alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # label(node) = min(node, min neighbor) to start
    labels = edges.groupBy("src").agg(F.least(F.min("dst"), F.col("src")).alias("lab"))
    labels = labels.select(F.col("src").alias("node"), "lab").localCheckpoint(
        eager=False
    )
    for _ in range(max_iter):
        # candidate label for dst = label(src); take min over incoming
        # candidates, then min with own label
        incoming = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("lab").alias("nlab"))
        )
        merged = (
            labels.join(incoming, labels["node"] == incoming["dst"], "left")
            .select(
                "node",
                "lab",
                F.least(F.col("lab"), F.coalesce("nlab", F.col("lab"))).alias("new_lab"),
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.filter(F.col("new_lab") < F.col("lab")).limit(1).count()
        labels = merged.select("node", F.col("new_lab").alias("lab"))
        if changed == 0:
            return labels.select("node", F.col("lab").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations; "
        "raise max_iter for high-diameter graphs"
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected graph in INTEGER
    fixed-point (ranks scaled by ``scale``): every step is integer
    floor-division and bigint sums, so the result is bit-identical on
    any engine and any partitioning — no float summation order to
    drift. Output: (node, pr) after ``iters`` rounds from a uniform
    start; ranks are comparable, not normalized to 1.

    Scale shape per iteration: one contributions join (edges ⋈ ranks,
    keyed by node id) + one partial-aggregated sum — O(edges) traffic,
    same as connected_components. Fixed ``iters`` (TextRank-style usage
    converges in a handful) keeps the plan finite; lineage is truncated
    per round."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1 (got {iters})")
    a, b = F.col(src), F.col(dst)
    fwd = edges.select(a.alias("e_src"), b.alias("e_dst")).filter(
        F.col("e_src") != F.col("e_dst")  # drop self-loops BEFORE symmetrizing
    )
    und = (
        fwd.unionByName(
            fwd.select(F.col("e_dst").alias("e_src"), F.col("e_src").alias("e_dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = und.groupBy("e_src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("e_src").alias("node"), "deg")
    base = ((100 - damping_pct) * scale) // 100
    pr = nodes.select("node", "deg", F.lit(scale).alias("pr"))
    for _ in range(iters):
        contrib = und.join(
            pr, und["e_src"] == pr["node"]
        ).select(
            F.col("e_dst").alias("to_node"),
            # `div`, not `/`: exact bigint floor-division (a double quotient
            # cast back to long can round across an integer boundary)
            F.expr("pr div deg").alias("c"),
        )
        summed = contrib.groupBy("to_node").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(summed, nodes["node"] == summed["to_node"], "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr.select("node", "pr")
