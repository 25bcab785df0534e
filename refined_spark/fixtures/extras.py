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
# expected_topk (F7 golden via the sequential NumPy oracle)
# --------------------------------------------------------------------------

def _rebuild_oracle_world(cfg):
    """Deterministic replay of the core generator's universe + docs +
    oracle lookup tables (same seeds — the core corpus parquet on disk is
    byte-identical to this reconstruction)."""
    from ..functions.embed import hash_embed
    from . import gen as g
    from . import oracle as o

    rng = np.random.Generator(np.random.PCG64(42))
    uni = g.build_universe(cfg, rng)
    docs, spans = g.build_docs(cfg, uni)
    pem: dict[str, list[tuple[str, float]]] = {}
    for r in uni["pem_rows"]:
        pem.setdefault(r["surface_form"], []).append((r["qcode"], r["prob"]))
    for k in pem:
        pem[k] = o.sort_candidates(pem[k])
    human_qcodes = {e["qcode"] for e in uni["entities"] if e["is_human"]}
    closure_by_qcode = {e["qcode"]: set(e["class_idx"])
                        for e in uni["entities"]}
    emb_by_qcode = {
        e["qcode"]: (np.asarray(hash_embed(e["topic"]), dtype=np.float32)
                     if e["description"] is not None
                     else np.zeros(config.EMB_DIM, dtype=np.float32))
        for e in uni["entities"]
    }
    topic_class = {t: uni["cidx"][c] for t, c in uni["topic_rows"].items()}
    weights = dict(class_overlap=2.0, pem=1.5, class_dist=-1.0,
                   desc_score=3.0, bias=0.0)
    return dict(uni=uni, docs=docs, spans=spans, pem=pem,
                human_qcodes=human_qcodes, closure_by_qcode=closure_by_qcode,
                emb_by_qcode=emb_by_qcode, topic_class=topic_class,
                weights=weights)


def gen_expected_topk(out_dir: str, world: dict, k: int = 5) -> None:
    import os

    from . import oracle as o

    spans_by_url: dict[str, list] = {}
    for sp in world["spans"]:
        spans_by_url.setdefault(sp["url"], []).append(sp)
    rows = []
    for url in sorted(spans_by_url):
        spans = sorted(spans_by_url[url], key=lambda s: s["start"])
        cand_map = o.get_candidates_for_doc(
            spans, world["pem"], world["human_qcodes"])
        topk = o.topk_doc(spans, cand_map, world["emb_by_qcode"],
                          world["closure_by_qcode"], world["topic_class"],
                          world["weights"], k=k)
        for sp in spans:
            for rank, (q, s) in enumerate(topk[sp["start"]], 1):
                rows.append(dict(url=url, start=sp["start"], topk_rank=rank,
                                 qcode=q, score=s))
    _write(os.path.join(out_dir, "expected_topk.parquet"), rows, pa.schema([
        ("url", pa.string()), ("start", pa.int32()),
        ("topk_rank", pa.int32()), ("qcode", pa.string()),
        ("score", pa.float64()),
    ]))


# --------------------------------------------------------------------------
# entry point
# --------------------------------------------------------------------------

def generate_extras(tier: str, cfg: dict, out_dir: str) -> None:
    n_media = {"t1": 64}.get(tier, 256)
    gen_media(out_dir, n_media)
    world = _rebuild_oracle_world(cfg)
    gen_expected_topk(out_dir, world)
