"""Extra fixture tables (round 2+): media, dates, anchors, CSV tables,
messy spans, BIO tags — everything the operator tail added after the core
ER corpus stabilized.

Generated ONLY for oracle tiers (t1/t2) and versioned separately
(`gen.EXTRAS_VERSION`) so the multi-million-doc bench corpus is never
invalidated by an extras change. Deterministic: seed-derived, no wall
clock, no external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import config
from . import vocab


def _write(path, rows, schema):
    import pyarrow.parquet as pq

    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, path)


# --------------------------------------------------------------------------
# media (multimodal plumbing golden)
# --------------------------------------------------------------------------

def gen_media(out_dir: str, n: int) -> None:
    import os

    from ..operators.multimodal import (
        _decode_image_impl,
        feat_to_json,
        synth_media_rows,
    )

    rows = [dict(media_id=m, kind=k, payload=bytes(p), mime=mi, width=w,
                 height=h, duration_ms=d)
            for m, k, p, mi, w, h, d in synth_media_rows(n)]
    _write(os.path.join(out_dir, "media.parquet"), rows, pa.schema([
        ("media_id", pa.string()), ("kind", pa.string()),
        ("payload", pa.binary()), ("mime", pa.string()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]))

    # expected features: INDEPENDENT pooling recompute (integer sums in
    # float64 — bit-identical to the operator's float64 mean) over the
    # shared codec stub
    feat_dim = 16
    exp = []
    for r in rows:
        img = _decode_image_impl(r["payload"]).astype(np.int64)
        n_px = img.shape[0] * img.shape[1]
        pooled = [float(img[:, :, c].sum()) / n_px for c in range(3)]
        feat = [pooled[i % 3] / 255.0 for i in range(feat_dim)]
        exp.append(dict(media_id=r["media_id"], kind=r["kind"],
                        feat_json=feat_to_json(feat), feat_dim=feat_dim,
                        decode_ok="ok"))
    _write(os.path.join(out_dir, "expected_media_features.parquet"), exp,
           pa.schema([
               ("media_id", pa.string()), ("kind", pa.string()),
               ("feat_json", pa.string()), ("feat_dim", pa.int32()),
               ("decode_ok", pa.string()),
           ]))


# --------------------------------------------------------------------------
# entry point
# --------------------------------------------------------------------------

def generate_extras(tier: str, cfg: dict, out_dir: str) -> None:
    n_media = {"t1": 64}.get(tier, 256)
    gen_media(out_dir, n_media)
