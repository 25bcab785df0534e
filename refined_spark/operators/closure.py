"""F8 precompute — transitive closure of the subclass DAG.

The reference memoizes implied-class recursion per call
(/root/reference/src/refined/doc_preprocessing/class_handler.py:22-102);
we precompute the closure offline as an iterative DataFrame self-join —
turning recursion into a broadcast-able lookup table, per SURVEY.md §4.

The class DAG is small (~1.4k classes in the reference), so the iterative
join is driver-cheap; the iteration count is bounded by DAG depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def class_closure(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges: (child_class, parent_class) → (child_class, ancestor_class)
    reflexive-transitive closure (includes child itself). Raises if the
    DAG is deeper than ``max_iter`` hops — a silently truncated closure
    would propagate into entity class arrays and minimal-set pruning
    with everything green (r5 review); real Wikidata P279 chains can
    exceed small caps, so the failure must be loud."""
    nodes = (
        edges.select(F.col("child_class").alias("c"))
        .union(edges.select(F.col("parent_class").alias("c")))
        .distinct()
    )
    closure = nodes.select(F.col("c").alias("child_class"),
                           F.col("c").alias("ancestor_class"))
    step = edges.select(F.col("child_class"),
                        F.col("parent_class").alias("ancestor_class"))
    frontier = step
    converged = False
    for _ in range(max_iter):
        new = closure.unionByName(frontier).distinct().localCheckpoint()
        if new.count() == closure.count():
            closure = new
            converged = True
            break
        closure = new
        # extend frontier one hop: frontier ⋈ edges
        frontier = (
            frontier.alias("f")
            .join(edges.alias("e"),
                  F.col("f.ancestor_class") == F.col("e.child_class"))
            .select(F.col("f.child_class"),
                    F.col("e.parent_class").alias("ancestor_class"))
            .distinct()
        )
    if not converged:
        raise RuntimeError(
            f"class_closure did not converge within max_iter={max_iter} "
            "hops — the subclass DAG is deeper than the cap; raise "
            "max_iter rather than returning a truncated closure")
    return closure


def minimal_classes(closure: DataFrame, labeled: DataFrame) -> DataFrame:
    """F8 type pruning: drop classes implied by other predicted classes
    (reference _get_implied_classes / prune_classes,
    inference/processor.py:413-452).

    labeled: (key, class_name) predicted class sets. Returns rows where
    class_name is NOT an ancestor of another predicted class of the same
    key (a minimal set over the subclass DAG).
    """
    implied = (
        labeled.alias("l")
        .join(closure.alias("c"),
              (F.col("l.class_name") == F.col("c.child_class"))
              & (F.col("l.class_name") != F.col("c.ancestor_class")))
        .select(F.col("l.key").alias("key"),
                F.col("c.ancestor_class").alias("class_name"))
        .distinct()
    )
    return labeled.join(implied, ["key", "class_name"], "left_anti")
