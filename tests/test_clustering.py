"""A9 — connected components on seeded graphs (chain, star, cliques,
disjoint singletons) + convergence behavior."""

import pyspark.sql.functions as F

from refined_spark.operators.clustering import (
    cluster_mentions,
    connected_components,
)


def _cc_sets(spark, edges):
    df = spark.createDataFrame(edges, "u: long, v: long")
    comp = connected_components(df)
    groups = {}
    for r in comp.collect():
        groups.setdefault(r["component"], set()).add(r["node"])
    return sorted((sorted(g) for g in groups.values()))


def test_cc_chain(spark):
    # long chain exercises the log-round convergence
    edges = [(i, i + 1) for i in range(1, 30)]
    got = _cc_sets(spark, edges)
    assert got == [list(range(1, 31))]


def test_cc_star_and_clique(spark):
    edges = [(100, i) for i in range(101, 110)]          # star
    edges += [(a, b) for a in range(200, 205)            # clique
              for b in range(a + 1, 205)]
    edges += [(300, 301)]                                # pair
    got = _cc_sets(spark, edges)
    assert got == [list(range(100, 110)), list(range(200, 205)), [300, 301]]


def test_cc_two_chains_merged(spark):
    edges = [(i, i + 1) for i in range(1, 10)] + \
            [(i, i + 1) for i in range(20, 30)] + [(5, 25)]
    got = _cc_sets(spark, edges)
    assert got == [list(range(1, 11)) + list(range(20, 31))]


def test_cluster_mentions_singletons_and_transitivity(spark):
    links = spark.createDataFrame(
        [
            ("u1", 0, "u1:00000000", "Q1"),
            ("u2", 0, "u2:00000000", "Q1"),   # same entity -> same cluster
            ("u3", 0, "u3:00000000", "Q2"),
            ("u4", 0, "u4:00000000", None),   # unlinked -> singleton
            ("u5", 0, "u5:00000000", None),
        ],
        "url: string, start: int, mention_key: string, pred_qcode: string",
    )
    out = {(r["url"], r["cluster_id"]) for r in
           cluster_mentions(links).collect()}
    by_url = dict((u, c) for u, c in out)
    assert by_url["u1"] == by_url["u2"] == "u1:00000000"
    assert by_url["u3"] == "u3:00000000"
    assert by_url["u4"] == "u4:00000000"
    assert by_url["u5"] == "u5:00000000"
    assert len(out) == 5

def test_pair_edges_merge_clusters(spark):
    """Accepted mention-mention pair edges must merge entity clusters
    through the contracted CC path."""
    links = spark.createDataFrame(
        [("u1", 10, "u1:00000010", "Q1"), ("u2", 20, "u2:00000020", "Q2"),
         ("u3", 30, "u3:00000030", "Q2"), ("u4", 40, "u4:00000040", None)],
        "url: string, start: int, mention_key: string, pred_qcode: string")
    pairs = spark.createDataFrame([("u1:00000010", "u2:00000020")],
                                  "key_a: string, key_b: string")
    no_pairs = {r["url"]: r["cluster_id"]
                for r in cluster_mentions(links).collect()}
    # Q1 and Q2 clusters separate; u4 singleton
    assert no_pairs["u2"] == no_pairs["u3"] != no_pairs["u1"]
    assert no_pairs["u4"] not in (no_pairs["u1"], no_pairs["u2"])

    merged = {r["url"]: r["cluster_id"]
              for r in cluster_mentions(links, pair_edges=pairs).collect()}
    # the pair edge bridges Q1 and Q2 transitively: u1,u2,u3 one cluster
    assert merged["u1"] == merged["u2"] == merged["u3"] == "u1:00000010"
    assert merged["u4"] != merged["u1"]


def test_cluster_refresh_incremental_equals_full(spark):
    """Periodic-refresh identity: closing over (previous components as
    edges) + (new pair edges only) equals the from-scratch closure over
    the full pair-edge history — and the previous components are
    provably load-bearing (dropping them gives a different answer)."""
    from refined_spark.operators.clustering import cluster_refresh

    def mk_links(rows):
        return spark.createDataFrame(
            rows,
            "url: string, start: int, mention_key: string,"
            " pred_qcode: string")

    # period 1: three entity clusters + a singleton
    links1 = [("u1", 10, "u1:00000010", "Q1"),
              ("u2", 20, "u2:00000020", "Q2"),
              ("u3", 30, "u3:00000030", "Q3"),
              ("u4", 40, "u4:00000040", None)]
    # period 2: new documents stream in
    links2 = [("u5", 50, "u5:00000050", "Q3"),
              ("u6", 60, "u6:00000060", "Q4")]
    pairs1 = spark.createDataFrame(
        [("u1:00000010", "u2:00000020")],        # bridges Q1-Q2
        "key_a: string, key_b: string")
    pairs2 = spark.createDataFrame(
        [("u2:00000020", "u3:00000030"),         # bridges Q2-Q3
         ("u5:00000050", "u6:00000060")],        # bridges Q3-Q4 (redundant
        "key_a: string, key_b: string")          # once Q2-Q3 lands)

    r1 = cluster_refresh(mk_links(links1), pair_edges=pairs1)
    prev = r1["components"].localCheckpoint()

    all_links = mk_links(links1 + links2)
    inc = {(r["url"], r["cluster_id"]) for r in cluster_refresh(
        all_links, pair_edges=pairs2,
        prev_components=prev)["clusters"].collect()}
    full = {(r["url"], r["cluster_id"]) for r in cluster_refresh(
        all_links, pair_edges=pairs1.union(pairs2))["clusters"].collect()}
    assert inc == full
    # everything but u4 merged transitively into one cluster
    by_url = dict(inc)
    assert len({by_url[u] for u in ("u1", "u2", "u3", "u5", "u6")}) == 1
    assert by_url["u4"] != by_url["u1"]

    # non-vacuous: without prev components the Q1-Q2 bridge is lost
    no_prev = {(r["url"], r["cluster_id"]) for r in cluster_refresh(
        all_links, pair_edges=pairs2)["clusters"].collect()}
    assert no_prev != full
    assert dict(no_prev)["u1"] != dict(no_prev)["u2"]


def test_cluster_refresh_no_edges_identity(spark):
    """No pair edges and no previous state: refresh degenerates to the
    assignment map (and returns an EMPTY component frame, so the first
    period of a no-pair deployment carries zero state forward)."""
    from refined_spark.operators.clustering import cluster_refresh

    links = spark.createDataFrame(
        [("u1", 0, "u1:00000000", "Q1"), ("u2", 0, "u2:00000000", "Q1")],
        "url: string, start: int, mention_key: string, pred_qcode: string")
    res = cluster_refresh(links)
    assert res["components"].count() == 0
    got = {(r["url"], r["cluster_id"])
           for r in res["clusters"].collect()}
    assert got == {("u1", "u1:00000000"), ("u2", "u1:00000000")}
