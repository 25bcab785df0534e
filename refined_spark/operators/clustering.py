"""A9 — transitive clustering: large-star/small-star connected components.

The reference links each mention independently, so its "clusters" are
implicit groupBy(entity) classes. The north_rule requires explicit
transitive closure over the accepted-link edge list; we run the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond") as iterative DataFrame self-aggregations:

- large-star: for every node u, connect its LARGER neighbors to
  m(u) = min(N(u) ∪ {u})
- small-star: connect its smaller-or-equal neighbors to m(u)

Both are one groupBy per round (min + explode) — no joins — and converge
in O(log n) rounds; on the ER graph (mention-entity stars) 2-3 rounds.
Each round ``localCheckpoint``s to truncate lineage (north_rule:
checkpointed iterations); convergence is detected with an order-insensitive
edge-set signature (sum of xxhash64) computed in the SAME action that
materializes the checkpoint — one pass per round.

Node ids are int64 (xxhash64 of the string key): windows/aggregations on
longs shuffle ~5x less than on url-length strings at 10^12-edge scale.
A final join maps components back to string keys and picks the canonical
cluster id = min mention_key per component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Symmetric edge list (u,v) as undirected (big, small) pairs, distinct."""
    e = edges.selectExpr("u", "v").where(F.col("u") != F.col("v"))
    return (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Emit (larger-neighbor v, m) for m = min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
    grouped = sym.groupBy("u").agg(
        F.min("v").alias("minv"), F.collect_set("v").alias("nbrs")
    )
    m = F.least(F.col("u"), F.col("minv"))
    return (
        grouped.select(m.alias("m"), F.col("u"),
                       F.explode("nbrs").alias("v"))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Edges oriented (u > v); connect all small neighbors + u to the min."""
    grouped = edges.groupBy("u").agg(
        F.min("v").alias("m"), F.collect_set("v").alias("nbrs")
    )
    out_nbrs = (
        grouped.select("u", "m", F.explode("nbrs").alias("v"))
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    out_self = grouped.select(F.col("u"), F.col("m").alias("v"))
    return out_nbrs.union(out_self)


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges: (u BIGINT, v BIGINT). Returns (node BIGINT, component BIGINT)
    with component = min node id of the component."""
    cur = _canonical_edges(edges).localCheckpoint()
    prev_sig = None
    for _i in range(max_iter):
        cur = _canonical_edges(_small_star(_large_star(cur)))
        cur = cur.localCheckpoint()
        sig = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: every edge is (node, root)
    roots = cur.select(F.col("v").alias("node"),
                       F.col("v").alias("component")).distinct()
    members = cur.select(F.col("u").alias("node"),
                         F.col("v").alias("component"))
    return members.union(roots).distinct()


def cluster_mentions(links: DataFrame) -> DataFrame:
    """links: (url, start, mention_key, pred_qcode NULLABLE).

    Returns (url, start, cluster_id STRING) where cluster_id is the min
    mention_key of the transitive cluster; unlinked mentions are singletons.
    """
    nodes = links.select(
        "url", "start", "mention_key",
        F.xxhash64("mention_key").alias("nid"),
        F.when(F.col("pred_qcode").isNotNull(),
               F.xxhash64(F.concat(F.lit("e:"), F.col("pred_qcode"))))
        .alias("eid"),
    )
    edges = (
        nodes.where(F.col("eid").isNotNull())
        .select(F.col("nid").alias("u"), F.col("eid").alias("v"))
    )
    comp = connected_components(edges)
    with_comp = nodes.join(comp, nodes.nid == comp.node, "left").select(
        "url", "start", "mention_key",
        F.coalesce("component", "nid").alias("component"),
    )
    cluster_ids = with_comp.groupBy("component").agg(
        F.min("mention_key").alias("cluster_id")
    )
    return with_comp.join(cluster_ids, "component").select(
        "url", "start", "cluster_id"
    )
