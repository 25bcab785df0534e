"""Multipart / resumable corpus ingest — the engine analog of the
reference's multipart job-upload flow (api/app/endpoints/refined_api.py:
55-167: create multipart job -> POST parts -> finalize -> run), upgraded
from the reference's in-memory sequential parts buffer
(api/app/services/job_service.py:63-75 — "part_number not currently
used") to what a 100-TB corpus actually needs:

- parts land as parquet under ``<job_dir>/parts/part-NNNNN/``, written to
  a tmp name and renamed, with a JSON part manifest written LAST — the
  manifest is the commit point, so a crashed upload leaves no torn part;
- ``add_part`` is IDEMPOTENT per part number: re-submitting a completed
  part is a no-op (retry-safe), and an interrupted write is cleaned up
  and redone on the retry;
- ``received()`` answers the resume question ("which parts still need
  uploading") from durable state, so any process can continue an ingest;
- ``finalize`` validates expected part/row counts, stamps the job, and
  freezes it (late parts are refused); the finalized job reads back as
  ONE DataFrame over the part directory tree — no compaction copy, the
  parts ARE the table's files, exactly how a cluster ingest would leave
  shards on object storage.

Schema discipline: the first part freezes the job schema; later parts
must match field-for-field (names + types), the parquet-side analog of
the reference mapping every uploaded row onto the job's stored header
(refined_api.py:139-141).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

JOB_STAMP = "_INGEST.json"
FINAL_STAMP = "_FINALIZED.json"


class IngestError(RuntimeError):
    pass


def _part_name(part_number: int) -> str:
    if not (isinstance(part_number, int) and part_number >= 0):
        raise IngestError(f"part_number must be a non-negative int, "
                          f"got {part_number!r}")
    return f"part-{part_number:05d}"


class MultipartIngest:
    """One instance per ingest root; jobs are subdirectories."""

    def __init__(self, spark: SparkSession, ingest_dir: str) -> None:
        self.spark = spark
        self.ingest_dir = ingest_dir
        os.makedirs(ingest_dir, exist_ok=True)

    # -- paths ---------------------------------------------------------

    def _job_dir(self, job_id: str) -> str:
        return os.path.join(self.ingest_dir, job_id)

    def _parts_dir(self, job_id: str) -> str:
        return os.path.join(self._job_dir(job_id), "parts")

    def _stamp(self, job_id: str) -> dict:
        p = os.path.join(self._job_dir(job_id), JOB_STAMP)
        if not os.path.exists(p):
            raise IngestError(f"unknown ingest job {job_id!r}")
        with open(p) as f:
            return json.load(f)

    # -- protocol ------------------------------------------------------

    def begin(self, job_id: str | None = None,
              expected_parts: int | None = None,
              expected_rows: int | None = None) -> str:
        """Create an ingest job; returns its id. Re-calling begin() for
        an existing id is a no-op (resume keeps the original stamp)."""
        job_id = job_id or uuid.uuid4().hex[:16]
        jd = self._job_dir(job_id)
        os.makedirs(self._parts_dir(job_id), exist_ok=True)
        stamp_path = os.path.join(jd, JOB_STAMP)
        if not os.path.exists(stamp_path):
            tmp = stamp_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(dict(job_id=job_id, status="ingesting",
                               expected_parts=expected_parts,
                               expected_rows=expected_rows,
                               created_at=time.time(), schema=None), f)
            os.replace(tmp, stamp_path)
        return job_id

    def received(self, job_id: str) -> dict[int, dict]:
        """Completed parts (manifest-committed): {part_number: manifest}.
        THE resume query — a restarted uploader submits everything not
        in this map and nothing that is."""
        out = {}
        pd_ = self._parts_dir(job_id)
        if not os.path.isdir(pd_):
            raise IngestError(f"unknown ingest job {job_id!r}")
        for name in os.listdir(pd_):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(pd_, name)) as f:
                    m = json.load(f)
                out[m["part_number"]] = m
        return out

    def add_part(self, job_id: str, part_number: int,
                 rows: DataFrame) -> dict:
        """Land one part. Idempotent: a part whose manifest already
        exists is skipped (returns the existing manifest with
        ``skipped=True``); a torn write from a crashed attempt is
        removed and redone."""
        stamp = self._stamp(job_id)
        name = _part_name(part_number)
        pd_ = self._parts_dir(job_id)
        manifest_path = os.path.join(pd_, name + ".json")
        # idempotent-skip BEFORE the finalized check: the documented
        # retry contract ("re-submitting a completed part is a no-op")
        # must hold for an uploader whose commit response was lost and
        # whose coordinator finalized in the meantime — only genuinely
        # NEW parts are refused after finalize
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = json.load(f)
            return {**m, "skipped": True}
        if self.is_finalized(job_id):
            raise IngestError(
                f"ingest job {job_id!r} is finalized; no further parts")

        # schema discipline: first committed part freezes the job schema
        schema_json = rows.schema.json()
        frozen = stamp.get("schema")
        if frozen is not None and frozen != schema_json:
            raise IngestError(
                f"part {part_number} schema does not match the job "
                f"schema frozen by the first part")

        part_dir = os.path.join(pd_, name)
        if os.path.isdir(part_dir):  # torn write from a crashed attempt
            shutil.rmtree(part_dir)
        # sweep orphaned tmp dirs from attempts that crashed BEFORE the
        # rename — without this a flaky uploader's retries accumulate
        # one part-sized `.part-NNNNN.tmp-*` directory per crash
        for orphan in glob.glob(os.path.join(pd_, f".{name}.tmp-*")):
            shutil.rmtree(orphan, ignore_errors=True)
        tmp_dir = os.path.join(pd_, f".{name}.tmp-{uuid.uuid4().hex[:8]}")
        rows.write.mode("overwrite").parquet(tmp_dir)
        n_rows = self.spark.read.parquet(tmp_dir).count()
        os.replace(tmp_dir, part_dir)

        if frozen is None:
            stamp["schema"] = schema_json
            sp = os.path.join(self._job_dir(job_id), JOB_STAMP)
            with open(sp + ".tmp", "w") as f:
                json.dump(stamp, f)
            os.replace(sp + ".tmp", sp)

        m = dict(job_id=job_id, part_number=part_number, rows=n_rows,
                 path=part_dir, committed_at=time.time())
        with open(manifest_path + ".tmp", "w") as f:
            json.dump(m, f)
        os.replace(manifest_path + ".tmp", manifest_path)  # commit point
        return m

    def is_finalized(self, job_id: str) -> bool:
        return os.path.exists(
            os.path.join(self._job_dir(job_id), FINAL_STAMP))

    def finalize(self, job_id: str) -> dict:
        """Validate against the expected counts (when declared) and
        freeze the job. Idempotent."""
        stamp = self._stamp(job_id)
        fp = os.path.join(self._job_dir(job_id), FINAL_STAMP)
        if os.path.exists(fp):
            with open(fp) as f:
                return json.load(f)
        parts = self.received(job_id)
        n_rows = sum(m["rows"] for m in parts.values())
        exp_p, exp_r = stamp.get("expected_parts"), stamp.get(
            "expected_rows")
        if exp_p is not None:
            # validate the part-number SET, not just the count — the
            # right number of wrong parts (a skipped number plus a
            # stray extra) must not finalize
            missing = sorted(set(range(exp_p)) - set(parts))
            extra = sorted(set(parts) - set(range(exp_p)))
            if missing or extra:
                raise IngestError(
                    f"finalize: {len(parts)}/{exp_p} parts received; "
                    f"missing part numbers {missing}; unexpected part "
                    f"numbers {extra}")
        if exp_r is not None and n_rows != exp_r:
            raise IngestError(
                f"finalize: {n_rows} rows received, expected {exp_r}")
        final = dict(job_id=job_id, status="finalized",
                     n_parts=len(parts), n_rows=n_rows,
                     finalized_at=time.time())
        with open(fp + ".tmp", "w") as f:
            json.dump(final, f)
        os.replace(fp + ".tmp", fp)
        return final

    def read(self, job_id: str) -> DataFrame:
        """The finalized job as one DataFrame — the parts are the
        table's files (no compaction copy)."""
        if not self.is_finalized(job_id):
            raise IngestError(
                f"ingest job {job_id!r} is not finalized")
        parts = self.received(job_id)
        if not parts:
            raise IngestError(f"ingest job {job_id!r} has no parts")
        return self.spark.read.parquet(
            *[m["path"] for _n, m in sorted(parts.items())])
