"""S9/S10 — job-result sink with pagination + metrics sink.

S9 re-creates the fork API's result flow (api/app/services/
job_service.py:181-230 Koala-format rows; api/app/endpoints/
refined_api.py:208-264 paginated read-back) Spark-first: results are a
parquet/Iceberg table with a deterministic order key; a "page" is a
LIMIT/OFFSET window over that order — no in-memory job store.

S10 re-creates the per-run metrics CSV (my_tests/utility/
test_utils.py:104-140) as a metrics DATAFRAME derived from the
checkpoint manifests (stage, rows, wall, partition lineage) — writable
to any sink and queryable like any other table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def koala_result_rows(topk: DataFrame, target_col_idx: int = 1,
                      entity: DataFrame | None = None) -> DataFrame:
    """A8 top-k per cell -> Koala-shaped nested result rows
    (job_service.py:181-193): one row per (table_id, row) with the
    candidate list nested, ready for the results sink. With ``entity``,
    each candidate also carries its human-readable ``wiki_title`` (the
    reference row's "name" field, job_service.py:184-188) via one
    broadcast left join — qcodes absent from the dimension keep NULL."""
    if entity is not None:
        from .scoring import with_wiki_titles

        topk = with_wiki_titles(topk, entity, qcode_col="qcode")
    cand_fields = (["cand_rank", "qcode", "wiki_title", "match"]
                   if entity is not None else
                   ["cand_rank", "qcode", "match"])
    return (
        topk.groupBy("table_id", "row")
        .agg(F.sort_array(F.collect_list(F.struct(
            *cand_fields))).alias("cands"))
        .select(
            "table_id",
            F.concat(F.lit("row_"), F.col("row")).alias("idRow"),
            "row",
            F.struct(
                F.lit(target_col_idx).alias("idColumn"),
                F.col("cands").alias("candidates"),
            ).alias("linked_entities"),
        )
    )


def write_job_results(results: DataFrame, path: str) -> str:
    results.write.mode("overwrite").parquet(path)
    return path


def read_results_page(spark: SparkSession, path: str, page: int,
                      page_size: int) -> DataFrame:
    """Deterministic pagination over the persisted results: a rank window
    over the stable (table_id, row) order — the reference slices its
    in-memory list (refined_api.py:249-256); at engine scale the same
    contract is an order-key range read."""
    df = spark.read.parquet(path)
    # offset+limit, not an unpartitioned row_number window: the window
    # funneled the WHOLE results table through one task per page
    # request; offset/limit plans as a global-sort + take (Spark pushes
    # the combined bound down), which is the order-key range read the
    # contract describes
    return (df.orderBy("table_id", "row")
            .offset(page * page_size).limit(page_size))


def stage_metrics(spark: SparkSession, run_dir: str) -> DataFrame:
    """S10: checkpoint manifests -> metrics DataFrame
    (stage, rows, wall_sec, n_partitions, status)."""
    rows = []
    for name in sorted(os.listdir(run_dir)):
        mpath = os.path.join(run_dir, name, "manifest.json")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            m = json.load(f)
        # a cancelled-stage manifest (checkpoint.py cancel path) has no
        # 'rows' — surface it with rows=-1 rather than crashing the
        # metrics view, which exists precisely to show such stages
        n_rows = int(m["rows"]) if "rows" in m else -1
        rows.append((m["stage"], n_rows, float(m["wall_sec"]),
                     len(m.get("partitions", [])), m["status"]))
    return spark.createDataFrame(
        rows, "stage string, rows long, wall_sec double, "
              "n_partitions int, status string")
