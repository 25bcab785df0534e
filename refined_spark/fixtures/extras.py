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

    # expected resize: INDEPENDENT nearest-neighbor replay — pure-Python
    # per-pixel double loop over the documented rule src_i=(dst_i*src)//dst
    # (the operator uses numpy index grids); codec stub shared (the seam).
    import hashlib
    import json

    from ..operators.multimodal import (
        FRAME_MS,
        _decode_frame_impl,
    )

    out_w = out_h = 4
    exp_rs = []
    for r in rows:
        if r["kind"] != "image":
            continue
        img = _decode_image_impl(r["payload"])
        src_h, src_w = img.shape[0], img.shape[1]
        px = []
        for oy in range(out_h):
            sy = (oy * src_h) // out_h
            for ox in range(out_w):
                sx = (ox * src_w) // out_w
                for c in range(3):
                    px.append(int(img[sy, sx, c]))
        exp_rs.append(dict(media_id=r["media_id"], kind=r["kind"],
                           src_w=src_w, src_h=src_h, out_w=out_w,
                           out_h=out_h, px_json=json.dumps(px),
                           decode_ok="ok"))
    _write(os.path.join(out_dir, "expected_media_resize.parquet"), exp_rs,
           pa.schema([
               ("media_id", pa.string()), ("kind", pa.string()),
               ("src_w", pa.int32()), ("src_h", pa.int32()),
               ("out_w", pa.int32()), ("out_h", pa.int32()),
               ("px_json", pa.string()), ("decode_ok", pa.string()),
           ]))

    # expected frame sampling: endpoint-inclusive uniform stride
    # idx_i=(i*(T-1))//(n-1), deduped; digests recomputed from the shared
    # frame-codec stub.
    n_frames = 4
    exp_fr = []
    for r in rows:
        if r["kind"] != "video":
            continue
        n_total = max(1, r["duration_ms"] // FRAME_MS)
        if n_total <= 1:
            idxs = [0]
        else:
            idxs = sorted({(i * (n_total - 1)) // (n_frames - 1)
                           for i in range(n_frames)})
        for fi in idxs:
            frame = _decode_frame_impl(r["payload"], fi)
            exp_fr.append(dict(
                media_id=r["media_id"], n_total_frames=n_total,
                frame_idx=fi, ts_ms=fi * FRAME_MS,
                frame_digest=hashlib.sha256(
                    frame.tobytes()).hexdigest()[:16]))
    _write(os.path.join(out_dir, "expected_media_frames.parquet"), exp_fr,
           pa.schema([
               ("media_id", pa.string()), ("n_total_frames", pa.int32()),
               ("frame_idx", pa.int32()), ("ts_ms", pa.int32()),
               ("frame_digest", pa.string()),
           ]))


# --------------------------------------------------------------------------
# date spans (E9)
# --------------------------------------------------------------------------

_MONTH_FULL = ["January", "February", "March", "April", "May", "June",
               "July", "August", "September", "October", "November",
               "December"]
_MONTH_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
               "Sep", "Oct", "Nov", "Dec"]


def _ordinal(d: int) -> str:
    if 11 <= d % 100 <= 13:
        return f"{d}th"
    return f"{d}" + {1: "st", 2: "nd", 3: "rd"}.get(d % 10, "th")


def _sample_date_text(rng, mode: str) -> str:
    """One date-span text from the closed grammar (date_test_examples.py
    shapes). mode controls whether numeric dates reveal day-first /
    month-first order."""
    y = 1900 + int(rng.integers(0, 200))
    m = 1 + int(rng.integers(0, 12))
    d_lo = 1 + int(rng.integers(0, 12))     # ambiguous day (<=12)
    d_hi = 13 + int(rng.integers(0, 16))    # revealing day (13..28)
    sep = "/-."[int(rng.integers(0, 3))]
    mname = (_MONTH_FULL[m - 1] if rng.random() < 0.5 else
             _MONTH_ABBR[m - 1] + ("." if rng.random() < 0.5 else ""))
    prefix = ["early ", "late ", "mid-", "the start of ", "the end of ",
              "the year "][int(rng.integers(0, 6))]
    kind = int(rng.integers(0, 13))
    if kind == 0:
        return str(y)
    if kind == 1:
        return prefix + str(y) if "year" in prefix else prefix + mname
    if kind == 2:
        return _ordinal(1 + int(rng.integers(0, 28)))
    if kind == 3:
        return f"{mname} {_ordinal(1 + int(rng.integers(0, 28)))}"
    if kind == 4:
        return f"{mname} {y}"
    if kind == 5:
        v = rng.random()
        if v < 0.4:
            return f"{mname} {_ordinal(1 + int(rng.integers(0, 28)))} {y}"
        if v < 0.7:
            return f"{mname} {1 + int(rng.integers(0, 28))}, {y}"
        return f"{1 + int(rng.integers(0, 28))} {mname} {y}"
    if kind == 6:  # range of two distinct years (offsets stay searchable)
        y2 = y + 1 + int(rng.integers(1, 30))
        # ' -- ' included so the oracle exercises the \s?--\s? branch of
        # SPLIT_RE with REAL whitespace (round-2 advisor: the unspaced
        # fixtures let an expr-escaping offset bug through)
        joiner = [" to ", " - ", "--", " -- "][int(rng.integers(0, 4))]
        return f"{y}{joiner}{y2}"
    if kind == 7:  # numeric
        if mode == "day_first":
            return f"{d_hi}{sep}{m}{sep}{y}"
        if mode == "month_first":
            return f"{m}{sep}{d_hi}{sep}{y}"
        return f"{d_lo}{sep}{m}{sep}{y}"  # ambiguous
    if kind == 8:  # ambiguous numeric regardless of mode
        return f"{d_lo}{sep}{1 + int(rng.integers(0, 12))}{sep}{y}"
    # round-4 dateutil-parity worded shapes (dates.P_D_OF_MY..P_YEAR_MONTH)
    if kind == 9:
        d = 1 + int(rng.integers(0, 28))
        dd = _ordinal(d) if rng.random() < 0.5 else str(d)
        return (f"{dd} of {mname} {y}" if rng.random() < 0.6
                else f"{dd} of {mname}")
    if kind == 10:
        return f"{1 + int(rng.integers(0, 28))} {mname}"
    if kind == 11:
        return (f"{mname} of {y}" if rng.random() < 0.5
                else f"{y} {mname}")
    # unparseable junk (reference maps these to None too)
    return ["bimonthly", "80s", "the 1980s", "1-day",
            "nineteenth century"][int(rng.integers(0, 5))]


def gen_date_spans(out_dir: str, n_urls: int) -> None:
    import os

    rng = np.random.Generator(np.random.PCG64(4242))
    rows = []
    for u in range(n_urls):
        url = f"https://example.org/datepage/{u:05d}"
        mode = ["day_first", "month_first", "conflict", "none"][u % 4]
        start = 0
        n_spans = 3 + int(rng.integers(0, 5))
        forced = (["day_first", "month_first"] if mode == "conflict"
                  else [mode] if mode in ("day_first", "month_first")
                  else [])
        for j in range(n_spans):
            if j < len(forced):  # guarantee the reveal rows exist
                y = 1900 + int(rng.integers(0, 200))
                m = 1 + int(rng.integers(0, 12))
                d = 13 + int(rng.integers(0, 16))
                sep = "/-."[int(rng.integers(0, 3))]
                txt = (f"{d}{sep}{m}{sep}{y}" if forced[j] == "day_first"
                       else f"{m}{sep}{d}{sep}{y}")
            else:
                txt = _sample_date_text(
                    rng, mode if mode in ("day_first", "month_first")
                    else "ambig")
            rows.append(dict(url=url, start=start, date_text=txt))
            start += len(txt) + 1 + int(rng.integers(5, 60))
    _write(os.path.join(out_dir, "date_spans.parquet"), rows, pa.schema([
        ("url", pa.string()), ("start", pa.int32()),
        ("date_text", pa.string()),
    ]))


# --------------------------------------------------------------------------
# numeric spans (CARDINAL/ORDINAL/MONEY/PERCENT/TIME/QUANTITY handlers)
# --------------------------------------------------------------------------

def _sample_number_text(rng) -> str:
    """One numeric expression from the closed handler grammar
    (operators/numbers.py), covering every coarse type + junk."""
    n = int(rng.integers(1, 5000))
    frac = f"{n}.{int(rng.integers(0, 99)):02d}"
    big = f"{int(rng.integers(1, 999)):d},{int(rng.integers(0, 999)):03d}"
    num = [str(n), frac, big][int(rng.integers(0, 3))]
    kind = int(rng.integers(0, 10))
    if kind == 0:  # PERCENT
        return num + [" percent", "%", " per cent"][int(rng.integers(0, 3))]
    if kind == 1:  # MONEY symbol
        sym = "$£€"[int(rng.integers(0, 3))]
        scale = ["", " million", " billion"][int(rng.integers(0, 3))]
        return f"{sym}{num}{scale}"
    if kind == 2:  # MONEY word
        w = ["dollars", "pounds", "euros", "cents"][int(rng.integers(0, 4))]
        return f"{num} {w}"
    if kind == 3:  # TIME
        h = int(rng.integers(0, 24))
        m = int(rng.integers(0, 60))
        v = rng.random()
        if v < 0.4:
            return f"{h % 13}:{m:02d} {'am' if h < 12 else 'pm'}"
        if v < 0.7:
            return f"{h}:{m:02d}:{int(rng.integers(0, 60)):02d}"
        return f"{1 + h % 12} {'am' if h < 12 else 'pm'}"
    if kind == 4:  # QUANTITY
        u = ["km", "kg", "miles", "metres", "tonnes", "acres",
             "litres"][int(rng.integers(0, 7))]
        return f"{num} {u}"
    if kind == 5:  # ORDINAL digits
        d = 1 + int(rng.integers(0, 130))
        sfx = ("th" if 11 <= d % 100 <= 13
               else {1: "st", 2: "nd", 3: "rd"}.get(d % 10, "th"))
        return f"{d}{sfx}"
    if kind == 6:  # ORDINAL worded
        return ["first", "second", "third", "fifth", "ninth", "twelfth",
                "twentieth"][int(rng.integers(0, 7))]
    if kind == 7:  # CARDINAL worded
        return ["one", "seven", "twelve", "nineteen", "forty", "ninety",
                "hundred", "million"][int(rng.integers(0, 8))]
    if kind == 8:  # CARDINAL numeric w/ scale
        scale = ["", " thousand", " million"][int(rng.integers(0, 3))]
        return f"{num}{scale}"
    return num  # bare CARDINAL


def gen_number_docs(out_dir: str, n_urls: int) -> None:
    """Documents whose text interleaves grammar expressions with filler
    prose — the corpus for the number-handler oracle (same build the
    date_detect corpus uses)."""
    import os

    rng = np.random.Generator(np.random.PCG64(777))
    filler = ["the committee reported", "sales reached", "documented at",
              "about", "roughly", "which was", "growth of", "a lap of",
              "closing price", "the entry read"]
    rows = []
    for u in range(n_urls):
        url = f"https://example.org/numpage/{u:05d}"
        n_spans = 4 + int(rng.integers(0, 6))
        pieces = []
        for _ in range(n_spans):
            pieces.append(filler[int(rng.integers(0, len(filler)))])
            pieces.append(_sample_number_text(rng))
        rows.append(dict(url=url, text=" ".join(pieces) + "."))
    _write(os.path.join(out_dir, "number_docs.parquet"), rows, pa.schema([
        ("url", pa.string()), ("text", pa.string()),
    ]))


# --------------------------------------------------------------------------
# crawl snapshots (URL-canonicalization + latest-crawl-wins corpus)
# --------------------------------------------------------------------------

def gen_crawl_snapshots(out_dir: str, n_sites: int) -> None:
    """Multi-crawl corpus for operators/crawl.py: each site appears as
    1-4 snapshots whose urls are ALIASES of one canonical form (scheme/
    host case, www., default port, fragment, trailing slash — one
    decoration per snapshot, so every rule is exercised), with
    per-site-UNIQUE warc_ts (the bump loop below) so the latest pick is
    total — snapshot days are drawn independently, so timestamps are
    not monotone in the snapshot index. Query strings are part of page
    identity and therefore FIXED per site.
    Columns: (url, warc_ts, text, lang)."""
    import datetime
    import os

    rng = np.random.Generator(np.random.PCG64(20260818))
    langs = ["en", "de", "fr", "es"]
    rows = []
    for s in range(n_sites):
        host = f"site{s:04d}.example{s % 7}.org"
        scheme = "https" if s % 3 else "http"
        path = "" if s % 5 == 0 else f"/p/{s:04d}"
        query = "?id=7&v=2" if s % 4 == 1 else ""
        canon_tail = f"{host}{path}{query}"
        n_snaps = 1 + int(rng.integers(0, 4))
        for j in range(n_snaps):
            u_scheme = scheme.upper() if (s + j) % 4 == 2 else scheme
            u_host = host
            deco = (s + j) % 6
            if deco == 0:
                u_host = "www." + host
            elif deco == 1:
                u_host = host.upper()
            elif deco == 2:
                u_host = host + (":443" if scheme == "https" else ":80")
            u_rest = path + query
            if deco == 3:
                # the trailing-slash ALIAS decorates the PATH — a '/'
                # appended after a query string is a different URL
                # (rule 5 preserves the query byte-for-byte; the r5
                # review fixed the rule and this decoration with it)
                u_rest = path + "/" + query
            elif deco == 4:
                u_rest = u_rest + "#section-2"
            url = f"{u_scheme}://{u_host}{u_rest}"
            ts = (datetime.datetime(2025, 1, 1)
                  + datetime.timedelta(days=int(rng.integers(0, 200)),
                                       hours=j * 7 + s % 5,
                                       minutes=j))
            rows.append(dict(
                url=url, warc_ts=ts,
                text=(f"site {canon_tail} revision {j} "
                      + " ".join(vocab.FILLER[(s * 7 + j * 3 + w) %
                                              len(vocab.FILLER)]
                                 for w in range(12))),
                lang=langs[(s + j) % len(langs)]))
    # per-site warc_ts uniqueness (the pick must be total without
    # leaning on the url tiebreak alone): bump colliding timestamps —
    # text word [1] is the canonical tail, i.e. the site key
    seen: dict[str, set] = {}
    fixed = []
    for r in rows:
        ts = r["warc_ts"]
        bucket = seen.setdefault(r["text"].split()[1], set())
        while ts in bucket:
            ts += datetime.timedelta(hours=13)
        bucket.add(ts)
        fixed.append({**r, "warc_ts": ts})
    _write(os.path.join(out_dir, "crawl_snapshots.parquet"), fixed,
           pa.schema([("url", pa.string()),
                      ("warc_ts", pa.timestamp("us")),
                      ("text", pa.string()), ("lang", pa.string())]))


# --------------------------------------------------------------------------
# entity-typing (F4) goldens: per-span top classes + ET-mode links
# --------------------------------------------------------------------------

def gen_et_expected(out_dir: str, world: dict, k: int = 3) -> None:
    """Sequential replay of the ET protocol (operators/entity_typing.py):
    confidences for ALL distinct ctx words in ONE call to the shared
    ``et_conf_matrix`` (bit-identical to the Spark UDF by construction),
    then per-span top-k classes and the full ET-mode link pass via the
    oracle's sequential scorer. Asserts the ET links differ from the
    prior-mode links — the gate must not be vacuous."""
    import os

    from ..operators.entity_typing import et_conf_matrix
    from . import oracle as o

    uni = world["uni"]
    names = [n for n, _ in sorted(uni["cidx"].items(), key=lambda kv: kv[1])]
    # '' plays the NULL-context sentinel: every span gets a typed
    # prediction (the reference types every span; engine r5 fix maps
    # NULL ctx to '' in et_top_classes)
    ctx_words = sorted({sp.get("ctx_word") or "" for sp in world["spans"]})
    conf, sq = et_conf_matrix(ctx_words, names)
    et = dict(conf_by_ctx={w: conf[i] for i, w in enumerate(ctx_words)},
              sq_by_ctx={w: float(sq[i]) for i, w in enumerate(ctx_words)})

    type_rows = []
    for sp in world["spans"]:
        w = sp.get("ctx_word") or ""
        c = et["conf_by_ctx"][w]
        order = sorted(range(len(names)), key=lambda i: (-c[i], i))
        for rank, i in enumerate(order[:k], 1):
            type_rows.append(dict(url=sp["url"], start=sp["start"],
                                  et_rank=rank, class_name=names[i]))
    _write(os.path.join(out_dir, "expected_et_types.parquet"), type_rows,
           pa.schema([("url", pa.string()), ("start", pa.int32()),
                      ("et_rank", pa.int32()), ("class_name", pa.string())]))

    spans_by_url: dict[str, list] = {}
    for sp in world["spans"]:
        spans_by_url.setdefault(sp["url"], []).append(sp)
    link_rows, differs = [], False
    for url in sorted(spans_by_url):
        spans = sorted(spans_by_url[url], key=lambda s: s["start"])
        cand_map = o.get_candidates_for_doc(
            spans, world["pem"], world["human_qcodes"])
        links_et = o.link_doc(spans, cand_map, world["emb_by_qcode"],
                              world["closure_by_qcode"],
                              world["topic_class"], world["weights"], et=et)
        links_prior = o.link_doc(spans, cand_map, world["emb_by_qcode"],
                                 world["closure_by_qcode"],
                                 world["topic_class"], world["weights"])
        for sp in spans:
            q, confv = links_et[sp["start"]]
            if links_prior[sp["start"]] != links_et[sp["start"]]:
                differs = True
            link_rows.append(dict(url=url, start=sp["start"],
                                  pred_qcode=q, confidence=confv))
    if not differs:
        raise AssertionError(
            "ET-mode links identical to prior-mode links — the links_et "
            "gate would be vacuous; fixture corpus needs more contrast")
    _write(os.path.join(out_dir, "expected_links_et.parquet"), link_rows,
           pa.schema([("url", pa.string()), ("start", pa.int32()),
                      ("pred_qcode", pa.string()),
                      ("confidence", pa.float64())]))


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
# backward-coref corpus (M3 2-pass protocol,
# reference candidate_generator.py:123-159)
# --------------------------------------------------------------------------

def gen_coref_docs(out_dir: str, world: dict, n_urls: int) -> None:
    """Docs where surname mentions PRECEDE the registering full name —
    the case the forward protocol cannot resolve and ``backward_coref``
    exists for. Five deterministic patterns per cycle:

    0. surname, Full Name, surname — first receiver needs the fallback;
    1. Full Name, surname — pure forward (both modes must agree);
    2. surname only — no registration in the doc (both modes: nothing);
    3. P, surname, Q, surname (shared surname) — latest-BEFORE must win
       over the pre-pass residue in backward mode too;
    4. surname, P, Q (shared surname) — backward fallback must take the
       document-LAST registration (Q), not the first.

    Expected tables come from the sequential oracle replay
    (oracle.candidates_rows) in BOTH directions, so the gate also proves
    the two modes actually differ on this corpus (non-vacuity).
    """
    import os

    from . import oracle as o

    rng = np.random.Generator(np.random.PCG64(4242))
    persons = world["uni"]["persons"]
    by_last: dict[str, list] = {}
    for p in persons:
        by_last.setdefault(p["last"], []).append(p)
    docs_rows, span_rows = [], []
    for i in range(n_urls):
        url = f"https://example.org/coref/{i:05d}"
        p = persons[int(rng.integers(len(persons)))]
        same = [x for x in by_last[p["last"]] if x is not p]
        q = same[0] if same else persons[int(rng.integers(len(persons)))]
        pat = i % 5
        if pat == 0:
            events = [([p["last"]], p["topic"]),
                      (p["label"].split(" "), p["topic"]),
                      ([p["last"]], None)]
        elif pat == 1:
            events = [(p["label"].split(" "), p["topic"]),
                      ([p["last"]], p["topic"])]
        elif pat == 2:
            events = [([p["last"]], p["topic"])]
        elif pat == 3:
            events = [(p["label"].split(" "), p["topic"]),
                      ([p["last"]], None),
                      (q["label"].split(" "), q["topic"]),
                      ([p["last"]], None)]
        else:
            events = [([p["last"]], None),
                      (p["label"].split(" "), p["topic"]),
                      (q["label"].split(" "), q["topic"])]
        tokens, meta = [], []
        for m_tokens, ctx in events:
            tokens.extend(_FILLER[int(rng.integers(len(_FILLER)))]
                          for _ in range(2 + int(rng.integers(0, 3))))
            start_tok = len(tokens)
            tokens.extend(m_tokens)
            if ctx:
                tokens.append(f"({ctx})")
            meta.append((start_tok, len(m_tokens)))
        tokens.extend(_FILLER[int(rng.integers(len(_FILLER)))]
                      for _ in range(2))
        text = " ".join(tokens) + "."
        offs, pos = [], 0
        for t in tokens:
            offs.append(pos)
            pos += len(t) + 1
        docs_rows.append(dict(url=url, text=text))
        for st, n in meta:
            mtext = " ".join(tokens[st:st + n])
            start = offs[st]
            assert text[start:start + len(mtext)] == mtext
            span_rows.append(dict(url=url, start=start, length=len(mtext),
                                  mention_text=mtext))

    _write(os.path.join(out_dir, "coref_docs.parquet"), docs_rows,
           pa.schema([("url", pa.string()), ("text", pa.string())]))
    _write(os.path.join(out_dir, "coref_spans.parquet"), span_rows,
           pa.schema([("url", pa.string()), ("start", pa.int32()),
                      ("length", pa.int32()),
                      ("mention_text", pa.string())]))
    cand_schema = pa.schema([
        ("url", pa.string()), ("start", pa.int32()), ("qcode", pa.string()),
        ("prob", pa.float64()), ("cand_source", pa.string()),
        ("cand_rank", pa.int32()),
    ])
    for name, backward in (("expected_candidates_fwd", False),
                           ("expected_candidates_back", True)):
        rows = o.candidates_rows(span_rows, world["pem"],
                                 world["human_qcodes"], backward=backward)
        _write(os.path.join(out_dir, f"{name}.parquet"), rows, cand_schema)


# --------------------------------------------------------------------------
# wiki pages with raw anchors (S3/E10)
# --------------------------------------------------------------------------

_FILLER = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur",
           "adipiscing", "elit", "sed", "do"]


def gen_wiki_pages(out_dir: str, world: dict, n_pages: int) -> None:
    """Pages whose text carries `<a href="uri">surface</a>` anchors over
    the entity universe, plus redirects / title→qcode / deny tables —
    the full input set of the S3 anchor ETL. Includes every cleanup case:
    %20 escapes, lowercase-first uris, HTML entities, redirects, unmapped
    targets and deny-listed qcodes."""
    import os

    rng = np.random.Generator(np.random.PCG64(7788))
    ents = [e for e in world["uni"]["entities"]]
    deny = sorted({e["qcode"] for e in ents if e["never_gold"]})

    # extra titles exercising the HTML-entity path (qcodes outside the
    # universe are fine — the ETL only maps titles)
    extra_titles = [("AT&T_Inc.", "Q900001", "AT&amp;T_Inc."),
                    ("X≤Y_paradox", "Q900002", "X&le;Y_paradox")]

    title_rows = [dict(wiki_title=e["wiki_title"], qcode=e["qcode"])
                  for e in ents]
    title_rows += [dict(wiki_title=t, qcode=q)
                   for t, q, _u in extra_titles]
    redirect_rows = []
    for e in ents:
        if rng.random() < 0.3:
            redirect_rows.append(dict(
                src_title=e["wiki_title"] + "_(old)",
                dst_title=e["wiki_title"]))

    redirect_by_ent = {r["dst_title"]: r["src_title"]
                       for r in redirect_rows}

    def uri_for(e) -> str:
        t = e["wiki_title"]
        r = rng.random()
        if r < 0.35:
            return t
        if r < 0.55:
            return t.replace("_", "%20")
        if r < 0.7:
            return t[0].lower() + t[1:]
        if r < 0.85 and t in redirect_by_ent:
            return redirect_by_ent[t]
        return t

    def surface_for(e) -> str:
        lbl = e["label"]
        r = rng.random()
        if r < 0.6:
            return lbl
        if r < 0.8:
            return "The " + lbl
        return lbl.upper()

    page_rows = []
    for i in range(n_pages):
        parts = []
        n_anchors = 2 + int(rng.integers(0, 6))
        for _j in range(n_anchors):
            parts.extend(_FILLER[int(k)] for k in
                         rng.integers(0, len(_FILLER), size=3))
            r = rng.random()
            if r < 0.08:  # unmapped target — ETL must drop it
                parts.append('<a href="Nonexistent_Page">nothing</a>')
            elif r < 0.16:  # entity-escape title
                t, _q, u = extra_titles[int(rng.integers(
                    len(extra_titles)))]
                parts.append(f'<a href="{u}">{t.replace("_", " ")}</a>')
            else:
                e = ents[int(rng.integers(len(ents)))]
                parts.append(f'<a href="{uri_for(e)}">{surface_for(e)}</a>')
        page_rows.append(dict(page_title=f"Page_{i:05d}",
                              text=" ".join(parts)))

    _write(os.path.join(out_dir, "wiki_pages.parquet"), page_rows,
           pa.schema([("page_title", pa.string()), ("text", pa.string())]))
    _write(os.path.join(out_dir, "redirects.parquet"), redirect_rows,
           pa.schema([("src_title", pa.string()),
                      ("dst_title", pa.string())]))
    _write(os.path.join(out_dir, "title_qcode.parquet"), title_rows,
           pa.schema([("wiki_title", pa.string()), ("qcode", pa.string())]))
    _write(os.path.join(out_dir, "deny_qcodes.parquet"),
           [dict(qcode=q) for q in deny],
           pa.schema([("qcode", pa.string())]))


# --------------------------------------------------------------------------
# CSV tables + ground truth (S7 / A6 / A7 / A8)
# --------------------------------------------------------------------------

def gen_csv_tables(out_dir: str, world: dict, n_tables: int) -> None:
    """Headerless CSV tables (row, cell, ctx, noise) + ground-truth qids
    parquet — the fork's table-linking input shape (semtab-style: target
    column 1, context column 2). Cells are entity surfaces with cased /
    'The '-prefixed variants; some NIL cells; some multi-qid truths."""
    import os

    rng = np.random.Generator(np.random.PCG64(8899))
    ents = [e for e in world["uni"]["entities"]
            if e["description"] is not None]
    tables_dir = os.path.join(out_dir, "tables")
    os.makedirs(tables_dir, exist_ok=True)
    gt_rows = []
    for t in range(n_tables):
        tid = f"tbl_{t:04d}"
        lines = []
        n_rows = 5 + int(rng.integers(0, 11))
        for r in range(n_rows):
            if rng.random() < 0.08:
                cell = vocab.NIL_SURFACES[int(rng.integers(
                    len(vocab.NIL_SURFACES)))].replace(",", "")
                ctx, qid = "", "NIL"
            else:
                e = ents[int(rng.integers(len(ents)))]
                v = rng.random()
                cell = (e["label"] if v < 0.6
                        else "The " + e["label"] if v < 0.8
                        else e["label"].upper())
                ctx = e["topic"] if rng.random() < 0.85 else ""
                qid = e["qcode"]
                # multi-qid truth for ambiguous surfaces (semtab allows
                # several correct targets)
                if rng.random() < 0.1:
                    others = world["pem"].get(
                        e["label"].lower().replace(".", ""), [])
                    extra = [q for q, _p in others if q != qid][:1]
                    if extra:
                        qid = qid + " " + extra[0]
            noise = str(int(rng.integers(0, 10000)))
            lines.append(f"{r},{cell},{ctx},{noise}")
            gt_rows.append(dict(table_id=tid, row=r, col=1, qid=qid))
        with open(os.path.join(tables_dir, f"{tid}.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")
    _write(os.path.join(out_dir, "table_gt.parquet"), gt_rows, pa.schema([
        ("table_id", pa.string()), ("row", pa.int32()),
        ("col", pa.int32()), ("qid", pa.string()),
    ]))


# --------------------------------------------------------------------------
# messy spans (E6/E7) + BIO token tags (E8)
# --------------------------------------------------------------------------

def gen_messy_spans(out_dir: str, world: dict, n_urls: int) -> None:
    import os

    rng = np.random.Generator(np.random.PCG64(5511))
    labels = [e["label"] for e in world["uni"]["entities"]]
    rows = []
    for u in range(n_urls):
        url = f"https://example.org/messy/{u:05d}"
        pos = 0
        # one document-leading title-split case per third url
        if u % 3 == 0:
            t = (labels[int(rng.integers(len(labels)))] + "\n\n"
                 + labels[int(rng.integers(len(labels)))])
            rows.append(dict(url=url, start=0, length=len(t), text=t,
                             prioritised=False))
            pos = len(t) + 2
        n = 4 + int(rng.integers(0, 6))
        for _j in range(n):
            base = labels[int(rng.integers(len(labels)))]
            v = rng.random()
            if v < 0.12:
                t = "\n" * int(rng.integers(1, 3)) + base
            elif v < 0.24:
                t = base + "\n" * int(rng.integers(1, 3))
            elif v < 0.32:
                t = '"' + base            # unbalanced lead quote
            elif v < 0.40:
                t = base + '"'            # unbalanced trail quote
            elif v < 0.46:
                t = '"' + base + '"'      # balanced -> untouched
            elif v < 0.52:
                t = "the"
            elif v < 0.56:
                t = base[0]               # 1-char drop
            elif v < 0.60:
                t = "\n\n"
            else:
                t = base
            prio = rng.random() < 0.3
            start = pos + int(rng.integers(0, 8))
            rows.append(dict(url=url, start=start, length=len(t), text=t,
                             prioritised=prio))
            # occasionally an overlapping additional span (merge drops it)
            if rng.random() < 0.25:
                rows.append(dict(url=url, start=start + 1,
                                 length=len(base), text=base,
                                 prioritised=not prio and rng.random() < 0.5))
            pos = start + len(t) + 1
    _write(os.path.join(out_dir, "messy_spans.parquet"), rows, pa.schema([
        ("url", pa.string()), ("start", pa.int32()),
        ("length", pa.int32()), ("text", pa.string()),
        ("prioritised", pa.bool_()),
    ]))


def gen_bio_tags(out_dir: str, world: dict, n_urls: int) -> None:
    import os

    rng = np.random.Generator(np.random.PCG64(6611))
    labels = [e["label"] for e in world["uni"]["entities"]]
    rows = []
    for u in range(n_urls):
        url = f"https://example.org/bio/{u:05d}"
        pos, idx = 0, 0

        def emit(token, tag):
            nonlocal pos, idx
            rows.append(dict(url=url, tok_idx=idx, token=token,
                             start=pos, tag=tag))
            pos += len(token) + 1
            idx += 1

        n_ev = 3 + int(rng.integers(0, 5))
        for _j in range(n_ev):
            for _k in range(1 + int(rng.integers(0, 4))):
                emit(_FILLER[int(rng.integers(len(_FILLER)))], "O")
            toks = labels[int(rng.integers(len(labels)))].split(" ")
            orphan = rng.random() < 0.15   # lenient-decode case: I w/o B
            for ti, tok in enumerate(toks):
                emit(tok, "I" if (orphan and ti == 0) else
                     ("B" if ti == 0 else "I"))
        emit(_FILLER[int(rng.integers(len(_FILLER)))], "O")
    _write(os.path.join(out_dir, "bio_tags.parquet"), rows, pa.schema([
        ("url", pa.string()), ("tok_idx", pa.int32()),
        ("token", pa.string()), ("start", pa.int32()),
        ("tag", pa.string()),
    ]))


# --------------------------------------------------------------------------
# entry point
# --------------------------------------------------------------------------

def gen_el_datasets(out_dir: str) -> None:
    """Public-format EL evaluation files over the fixture corpus
    (sources/datasets.py): ``aida_docs.jsonl`` (reference
    dataset_factory.py:22-115 shape — text + spans with wikipedia uris)
    and ``standard_docs.jsonl`` (:117-185 — mentions with wiki_name).

    Built FROM the committed fixture tables so the dataset-fed pipeline
    is replayable against the existing expected_links golden: AIDA takes
    every 5th document (by sorted url) and encodes ALL of its gold_spans
    rows — same (url, start, length) keys, so running the pipeline on
    the read-back corpus must reproduce expected_links exactly for
    those urls. The uris exercise every mapper branch: plain titles,
    one-hop redirects, lowercase-first (case bump), non-wiki uris
    (ignored; leading ones exercise first-WIKI-uri pick), second wiki
    uri (first wins), NULL-gold spans as mention-only (empty/non-wiki
    uri lists), deny-listed (disambiguation-class) targets, unmapped
    titles, and one &le;-escaped title (the mapper's exact unescape
    list). The standard file covers a DIFFERENT doc subset, omits the
    ``id`` field (exercising the content-addressed doc:<md5> keying),
    and uses spaces-for-underscores names plus NULL/"NIL" rows."""
    import json as jsonlib
    import os

    import pyarrow.parquet as pq

    rng = np.random.Generator(np.random.PCG64(20260819))
    docs = pq.read_table(os.path.join(out_dir, "documents.parquet"),
                         columns=["url", "text"]).to_pylist()
    spans = pq.read_table(os.path.join(out_dir, "gold_spans.parquet"),
                          columns=["url", "start", "length",
                                   "gold_qcode"]).to_pylist()
    ents = pq.read_table(os.path.join(out_dir, "entity.parquet"),
                         columns=["qcode", "wiki_title"]).to_pylist()
    reds = pq.read_table(os.path.join(out_dir, "redirects.parquet")
                         ).to_pylist()
    deny = [r["qcode"] for r in pq.read_table(
        os.path.join(out_dir, "deny_qcodes.parquet")).to_pylist()]

    text_of = {d["url"]: d["text"] for d in docs}
    title_of = {e["qcode"]: e["wiki_title"] for e in ents}
    redirect_src = {r["dst_title"]: r["src_title"] for r in reds}
    all_titles = sorted(title_of.values())
    deny_titles = sorted(title_of[q] for q in deny if q in title_of)
    by_url: dict[str, list] = {}
    for s in spans:
        by_url.setdefault(s["url"], []).append(s)

    prefix = "http://en.wikipedia.org/wiki/"
    urls = sorted(by_url)

    def aida_uris(s, force_escape: bool) -> list[str]:
        q = s["gold_qcode"]
        r = rng.random()
        if force_escape:
            # the &le; branch of the mapper's unescape list — maps to
            # the extra_titles qcode OUTSIDE the entity universe (a
            # guaranteed-never-predicted gold: pure fn, both engines)
            return [prefix + "X&le;Y_paradox"]
        if q is None:
            if r < 0.25:
                return []
            if r < 0.5:
                return ["http://other.example.org/page"]
            if r < 0.75 and deny_titles:
                return [prefix + deny_titles[int(rng.integers(
                    len(deny_titles)))]]
            return [prefix + "Unmapped_Title_777"]
        t = title_of[q]
        if r < 0.2 and t in redirect_src:
            return [prefix + redirect_src[t]]
        if r < 0.35:
            return [prefix + t[0].lower() + t[1:]]
        if r < 0.45:
            return ["http://other.example.org/page", prefix + t]
        if r < 0.5:
            other = all_titles[int(rng.integers(len(all_titles)))]
            return [prefix + t, prefix + other]
        return [prefix + t]

    aida_lines = []
    first_gold_done = False
    for url in urls[0::5]:
        text = text_of[url]
        out_spans = []
        for s in sorted(by_url[url], key=lambda x: x["start"]):
            force = (not first_gold_done
                     and s["gold_qcode"] is not None)
            if force:
                first_gold_done = True
            out_spans.append(dict(start=s["start"], length=s["length"],
                                  uris=aida_uris(s, force)))
        aida_lines.append(dict(id=url, text=text, spans=out_spans))
    with open(os.path.join(out_dir, "aida_docs.jsonl"), "w") as f:
        for line in aida_lines:
            f.write(jsonlib.dumps(line, sort_keys=True) + "\n")

    def std_name(s) -> str | None:
        q = s["gold_qcode"]
        r = rng.random()
        if q is None:
            return None if r < 0.5 else "NIL"
        t = title_of[q]
        if r < 0.2 and t in redirect_src:
            t = redirect_src[t]
        elif r < 0.35:
            t = t[0].lower() + t[1:]
        # half the names arrive with spaces (the reader re-underscores)
        return t.replace("_", " ") if rng.random() < 0.5 else t

    std_lines = []
    for url in urls[1::5]:
        text = text_of[url]
        ms = [dict(start=s["start"], length=s["length"],
                   wiki_name=std_name(s))
              for s in sorted(by_url[url], key=lambda x: x["start"])]
        # NO id field: exercises the content-addressed doc:<md5> keying
        std_lines.append(dict(text=text, mentions=ms))
    with open(os.path.join(out_dir, "standard_docs.jsonl"), "w") as f:
        for line in std_lines:
            f.write(jsonlib.dumps(line, sort_keys=True) + "\n")


def gen_wikidata_dump(out_dir: str, world: dict) -> None:
    """JSON-array dump in the real wikidata shipping shape — '[' / ']'
    bracket lines, per-entity JSON with a trailing comma — covering
    labels / descriptions / aliases / sitelinks / P31 / P279 / P106 /
    P17 / P641 claims over the fixture universe (class items carry the
    P279 edges, so the dump is self-contained: the S1 fan-out feeds the
    A3 class-array build with no side tables)."""
    import json as jsonlib
    import os
    import zlib

    from . import gen as g

    names, cidx, closure = g._class_tables()
    by_set = {frozenset(cidx[c] for c in closure[n]): n for n in names}
    non_person = [n for n in names if n != "C_person"]

    def snak(vid: str) -> dict:
        return {"mainsnak": {"datavalue": {"value": {"id": vid}}}}

    items = []
    for n in names:
        parents = sorted(p for c, p in vocab.CLASS_EDGES if c == n)
        item = {"id": n, "type": "item",
                "labels": {"en": {"value": n[2:].replace("_", " ")}}}
        if parents:
            item["claims"] = {"P279": [snak(p) for p in parents]}
        items.append(item)
    for e in world["uni"]["entities"]:
        base = by_set[frozenset(e["class_idx"])]
        claims = {"P31": [snak(base)]}
        h = zlib.crc32(e["qcode"].encode())
        if e["is_human"]:
            claims["P106"] = [snak("C_person")]
        elif base in ("C_city", "C_river", "C_mountain") and h % 2 == 0:
            claims["P17"] = [snak("C_place")]
        elif base == "C_team":
            claims["P641"] = [snak("C_sports_org")]
        if h % 3 == 0 and not e["is_human"]:
            # deterministic second instance-of: the union/dedup path of
            # the class build is non-trivial only if some entity has >1
            claims["P31"].append(snak(non_person[h % len(non_person)]))
        item = {"id": e["qcode"], "type": "item",
                "labels": {"en": {"value": e["label"]}},
                "claims": claims,
                "sitelinks": {"enwiki": {"title": e["wiki_title"]}}}
        if e["description"] is not None:
            item["descriptions"] = {"en": {"value": e["description"]}}
        lowered = e["label"].lower()
        if lowered != e["label"]:
            item["aliases"] = {"en": [{"value": lowered}]}
        items.append(item)

    with open(os.path.join(out_dir, "wikidata_dump.jsonl"), "w") as f:
        f.write("[\n")
        for i, item in enumerate(items):
            tail = ",\n" if i < len(items) - 1 else "\n"
            f.write(jsonlib.dumps(item, sort_keys=True) + tail)
        f.write("]\n")


def gen_bpe(out_dir: str, world: dict, n_docs: int) -> None:
    """E2 fixture: a small text corpus, a BPE merges artifact trained on
    it, and a token golden computed by the INDEPENDENT rank-order-replay
    encoder (`bpe.encode_word_rank_replay`) with its own offset
    arithmetic — the Spark UDF (greedy min-rank loop) is checked against
    it by the `bpe_tokens` oracle."""
    import os

    from ..operators import bpe

    ents = world["uni"]["entities"]
    texts = []
    for i in range(n_docs):
        e = ents[i % len(ents)]
        e2 = ents[(i * 7 + 3) % len(ents)]
        desc = e["description"] or "an entity"
        texts.append(
            f"{e['label']} isn't just {desc}; it's linked to {e2['label']}"
            f" since {1900 + i % 120} — cost ${i * 13 % 997}.50,"
            f" naïve café rôle №{i}."
        )
    merges = bpe.train_bpe(texts, 240)
    bpe.save_merges(os.path.join(out_dir, "bpe_merges.parquet"), merges)

    rows = [dict(doc_id=f"bpe{i:04d}", text=t) for i, t in enumerate(texts)]
    _write(os.path.join(out_dir, "bpe_docs.parquet"), rows, pa.schema([
        ("doc_id", pa.string()), ("text", pa.string()),
    ]))

    ids = bpe.piece_ids(merges)
    exp = []
    for r in rows:
        pos = 0
        for raw, s, _ in bpe.pretokenize(r["text"]):
            # independent offset arithmetic: walk the pre-token's chars,
            # assigning each piece the chars whose byte span it overlaps
            pieces = bpe.encode_word_rank_replay(bpe.map_word(raw), merges)
            byte_char = [ci for ci, ch in enumerate(raw)
                         for _ in ch.encode("utf-8")]
            b = 0
            for piece in pieces:
                covered = byte_char[b:b + len(piece)]
                exp.append(dict(doc_id=r["doc_id"], pos=pos, piece=piece,
                                token_id=ids[piece],
                                start=s + covered[0],
                                end=s + covered[-1] + 1))
                b += len(piece)
                pos += 1
    _write(os.path.join(out_dir, "expected_bpe_tokens.parquet"), exp,
           pa.schema([
               ("doc_id", pa.string()), ("pos", pa.int32()),
               ("piece", pa.string()), ("token_id", pa.int32()),
               ("start", pa.int32()), ("end", pa.int32()),
           ]))


# --------------------------------------------------------------------------
# PII corpus (operators/pii.py) + decontamination benchmark
# --------------------------------------------------------------------------

def gen_pii_docs(out_dir: str, n_docs: int) -> None:
    """Web-text corpus laced with deterministic PII (operators/pii.py):
    every detector class appears alone and in combination, plus the
    edge shapes the patterns must decide — an email whose domain is
    IP-shaped (sequential semantics: the email stage eats it, n_ip=0
    for that doc), a 4-digit-octet non-IP that the word boundary
    rejects, both phone separator forms, PII at string start/end, and
    clean docs (has_pii false is non-vacuous).
    Columns: (doc_id, text)."""
    import os

    rows = []
    for i in range(n_docs):
        body = " ".join(vocab.FILLER[(i * 5 + w) % len(vocab.FILLER)]
                        for w in range(10))
        kind = i % 7
        if kind == 0:
            text = body  # clean
        elif kind == 1:
            text = (f"{body[:40]} contact user{i}.name+tag@mail-{i % 9}"
                    f".example.org {body[40:]}")
        elif kind == 2:
            text = (f"ops{i}@corp.example.net said {body} "
                    f"call 555-{100 + i % 900:03d}-{1000 + i:04d}")
        elif kind == 3:
            text = f"{body} (host 10.{i % 256}.{(i * 7) % 256}.{i % 250})."
        elif kind == 4:
            # IP-shaped domain: the email stage redacts the whole
            # address, so the ip stage sees nothing (n_ip must be 0)
            text = f"{body} admin{i}@10.0.{i % 200}.9.net writes"
        elif kind == 5:
            # boundary-defeated fake IP + space-separated phone
            text = (f"v999.999.999.9999 of {body} "
                    f"dial 555 {200 + i % 700:03d} {2000 + i:04d} now")
        else:
            text = (f"a{i}@x.io b{i}@y.co {body} 555-3{i % 10:01d}1-"
                    f"{3000 + i:04d} at 192.168.{i % 200}.{i % 9}")
        rows.append(dict(doc_id=i, text=text))
    _write(os.path.join(out_dir, "pii_docs.parquet"), rows,
           pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))


def gen_benchmark(out_dir: str, n_bench: int, n: int = 8) -> None:
    """Eval-benchmark table for operators/decontam.py, built FROM the
    fixture crawl corpus so contamination is exact by construction:
    3 of every 4 rows embed a ``n+2``-token window copied from a
    fixture document's NORMALIZED token stream (the window survives
    the operator's lowercase-[a-z0-9]+ normalization verbatim, so the
    doc MUST hit on 3 overlapping n-grams), wrapped in benchmark-only
    ``bq<k>`` framing tokens that cannot create accidental corpus
    n-grams; every 4th row is synthetic-token-only (hits nothing —
    clean-benchmark non-vacuity). Row pairs k and k+1 with k%8==1
    share the same window (bench-side DISTINCT non-vacuity), and
    source docs are drawn from the sorted-url corpus at a stride, so
    several docs are hit by multiple rows while most of the corpus
    stays clean. Columns: (bench_id, task, text)."""
    import os
    import re as relib

    import pyarrow.parquet as pq

    docs = sorted(pq.read_table(
        os.path.join(out_dir, "documents.parquet"),
        columns=["url", "text"]).to_pylist(), key=lambda d: d["url"])
    rng = np.random.Generator(np.random.PCG64(20260820))
    rows = []
    prev_window = None
    for k in range(n_bench):
        if k % 4 == 3:
            text = " ".join(f"zz{k}q{j}" for j in range(n + 4))
        else:
            if k % 8 == 2 and prev_window is not None:
                window = prev_window  # duplicate of row k-1's window
            else:
                d = docs[(k * 17) % len(docs)]
                toks = relib.findall(r"[a-z0-9]+", d["text"].lower())
                while len(toks) < n + 2:  # skip short docs
                    d = docs[(int(rng.integers(0, len(docs))))]
                    toks = relib.findall(r"[a-z0-9]+", d["text"].lower())
                s = int(rng.integers(0, len(toks) - (n + 2) + 1))
                window = " ".join(toks[s:s + n + 2])
            prev_window = window
            text = f"bq{k}intro question {window} bq{k}outro answer"
        rows.append(dict(bench_id=k, task=f"task{k % 3}", text=text))
    _write(os.path.join(out_dir, "benchmark.parquet"), rows,
           pa.schema([("bench_id", pa.int64()), ("task", pa.string()),
                      ("text", pa.string())]))


def gen_wet_pages(out_dir: str, n_pages: int) -> None:
    """Multi-line web pages for operators/lines.py (line/paragraph
    dedup + boilerplate cut). Deterministic (pure function of the page
    index, no RNG). Every decision clause of both operators is
    non-vacuous by construction:

    - BOILERPLATE lines on most pages, with per-page DIGIT variation
      (copyright years) and CASE variation (shouting banners) so the
      CCNet normalization folding is load-bearing, not decorative;
    - unique content lines built from letter-coded page ids + FILLER
      words (letters only — digit folding cannot accidentally collide
      them);
    - a CROSS-DOC duplicated content line (page i copies one line from
      page i-1 when i % 3 == 1): keep-first keeps the earlier page's,
      and at min_docs=3 the 2-doc line is PROTECTED from the
      boilerplate cut (the threshold clause). Exception: content(0,0)
      reaches THREE docs (page 0, page 1's copy, page 7's replay) and
      is therefore condemned at min_docs=3 — the protection clause is
      exercised by the later instances (content(3,0) onward);
    - a WITHIN-DOC repeat (i % 5 == 2 repeats its first content line);
    - pass-through lines that normalize to empty: blank lines on every
      page, '* * *' dividers (i % 4 == 3), whitespace-only (i % 6 == 5)
      — none may ever become a dedup key or a boilerplate count;
    - page 7 is ENTIRELY copies of pages 0-2's content lines (no
      blanks) -> keep-first drops the whole page;
    - page 11 is ENTIRELY boilerplate (no blanks) -> the boilerplate
      cut drops the whole page.

    Columns: (doc_id, url, text)."""
    import os

    def alpha(i: int) -> str:
        # letters-only page code ('a', 'b', ..., 'ba', ...) — immune to
        # the digit-folding normalization rule
        s = ""
        i += 1
        while i:
            i, d = divmod(i - 1, 26)
            s = chr(97 + d) + s
        return s

    def content(i: int, j: int) -> str:
        ws = " ".join(vocab.FILLER[(i * 7 + j * 3 + w) % len(vocab.FILLER)]
                      for w in range(6))
        return f"section {alpha(i)} {ws} part {alpha(j)}"

    def boiler(i: int, b: int) -> str:
        base = [
            f"Copyright {2015 + i % 9} Example Corp",   # digits fold
            "Subscribe to our newsletter today",
            "Accept all cookies to continue",
            "Home | About | Contact",
        ][b % 4]
        if b % 4 == 1 and i % 2 == 1:
            return base.upper()                          # case folds
        return base

    rows = []
    for i in range(n_pages):
        if i == 7:
            lines = [content(0, 0), content(1, 0), content(2, 1)]
        elif i == 11:
            lines = [boiler(11, 0), boiler(11, 1), boiler(11, 2)]
        else:
            lines = [boiler(i, i % 4), content(i, 0), ""]
            if i % 3 == 1 and i > 0:
                lines.append(content(i - 1, 0))          # cross-doc dup
            lines.append(content(i, 1))
            if i % 4 == 3:
                lines.append("* * *")                    # punct-only
            if i % 5 == 2:
                lines.append(content(i, 0))              # within-doc dup
            if i % 6 == 5:
                lines.append("   ")                      # spaces-only
            lines.append(boiler(i, 1 + i % 3))
        rows.append(dict(doc_id=i,
                         url=f"https://site{i % 40}.example.com/p/{i}",
                         text="\n".join(lines)))
    _write(os.path.join(out_dir, "wet_pages.parquet"), rows,
           pa.schema([("doc_id", pa.int64()), ("url", pa.string()),
                      ("text", pa.string())]))


def gen_domain_blocklist(out_dir: str) -> None:
    """UT1-style domain blocklist for operators/urlfilter.py, over the
    crawl_snapshots corpus (hosts ``siteNNNN.example{0..6}.org``) plus
    the psl_crawl PSL-suffix corpus. Non-vacuous by construction:

    - two REGISTERED domains that match (every siteNNNN subdomain of
      example1/example4 inherits the block — the subdomain-inheritance
      clause);
    - a listed FULL HOST (``site0002.example2.org``) that must NEVER
      match — matching is on the registered domain, and a host is not
      one;
    - an unmatched flat domain and an unmatched multi-suffix domain
      (``co.uk`` entries exercise the suffix rule in pytest; no crawl
      host carries one);
    - three PSL-snapshot registered domains over suffixes ABSENT from
      the r1-r4 closed set (``com.sg``, ``co.il``) including a 4-label
      registered domain under a 3-label suffix (``k12.ca.us``) — the
      r5 gate extension the r4 verdict prescribed.

    Columns: (domain, category)."""
    import os

    rows = [
        dict(domain="example1.org", category="ads"),
        dict(domain="example4.org", category="adult"),
        dict(domain="site0002.example2.org", category="malware"),
        dict(domain="tracker.net", category="tracker"),
        dict(domain="shop.co.uk", category="spam"),
        dict(domain="shop.com.sg", category="spam"),
        dict(domain="news.co.il", category="ads"),
        dict(domain="myschool.k12.ca.us", category="malware"),
        # wildcard-registry registered domain (*.mm → 3-label) and an
        # exception-rule registrable (!city.kawasaki.jp) — the r5
        # wildcard/exception cascade arms, each condemning subdomains
        dict(domain="shop.buy.mm", category="spam"),
        dict(domain="city.kawasaki.jp", category="ads"),
    ]
    _write(os.path.join(out_dir, "domain_blocklist.parquet"), rows,
           pa.schema([("domain", pa.string()),
                      ("category", pa.string())]))


def gen_psl_crawl(out_dir: str) -> None:
    """Deterministic crawl rows whose hosts exercise the PSL snapshot
    (operators/psl.py) end to end through the url_block gate —
    same schema as crawl_snapshots (url, warc_ts, text, lang).

    - ``shop.com.sg`` is LISTED: both its www. and promo. subdomains
      must drop (2-label suffix absent from the old closed set);
    - ``news.co.il`` is LISTED: its cdn. subdomain (with a default
      port decoration) must drop;
    - ``myschool.k12.ca.us`` is LISTED: its portal. subdomain and its
      SHOUTED bare host must both drop (4-label registered domain
      under a 3-label suffix — longest-match wins over ``ca.us``);
    - ``site.com.ar`` / ``other.k12.ca.us`` / ``example.ac.uk`` are
      unlisted controls over new and old suffixes — all keep;
    - host == suffix (``k12.ca.us``) maps to itself and keeps;
    - ``shop.buy.mm`` is LISTED (a *.mm wildcard-registry 3-label
      registered domain): the bare host and its promo. subdomain both
      drop; ``city.kawasaki.jp`` is LISTED (the !city exception
      registrable): its ward. subdomain drops;
    - ``foo.bar.ck`` and ``a.b.nagoya.jp`` are unlisted wildcard
      controls — both keep with their wildcard-rule domains.
    """
    import datetime
    import os

    def ts(i):
        return (datetime.datetime(2025, 3, 1)
                + datetime.timedelta(days=i, hours=i % 7))

    urls = [
        ("https://www.shop.com.sg/cart", "en"),
        ("https://promo.shop.com.sg/sale?id=3", "en"),
        ("http://cdn.news.co.il:80/breaking", "en"),
        ("https://portal.myschool.k12.ca.us/home", "en"),
        ("https://MYSCHOOL.K12.CA.US/x", "en"),
        ("https://site.com.ar/p", "es"),
        ("https://other.k12.ca.us/", "en"),
        ("https://k12.ca.us/", "en"),
        ("https://example.ac.uk/research", "en"),
        ("https://uni.act.edu.au/courses", "en"),
        ("https://shop.buy.mm/catalog", "my"),
        ("https://promo.shop.buy.mm/sale", "my"),
        ("https://ward.city.kawasaki.jp/office", "ja"),
        ("https://foo.bar.ck/reef", "en"),
        ("https://a.b.nagoya.jp/park", "ja"),
    ]
    rows = [dict(url=u, warc_ts=ts(i),
                 text=f"psl page {i} "
                      + " ".join(vocab.FILLER[(i * 5 + w)
                                              % len(vocab.FILLER)]
                                 for w in range(10)),
                 lang=lang)
            for i, (u, lang) in enumerate(urls)]
    _write(os.path.join(out_dir, "psl_crawl.parquet"), rows,
           pa.schema([("url", pa.string()),
                      ("warc_ts", pa.timestamp("us")),
                      ("text", pa.string()), ("lang", pa.string())]))


def gen_curation_pages(out_dir: str) -> None:
    """Dedicated corpus for the FULL curation chain gate (curate_full /
    curate_pack): every stage of operators/curation.py bites, in order,
    with deterministic construction (pure function of indices, no RNG).
    Columns: (doc_id, url, warc_ts, text, lang).

    - BLOCKED domains: pages on ads.example1.org (listed example1.org)
      and www.shop.com.sg (listed shop.com.sg — a PSL-snapshot suffix)
      carry perfectly good text; only the blocklist stage can drop
      them.
    - ALIASED SNAPSHOTS: sites carry 1-3 snapshots whose urls are
      aliases of one canonical form with per-site-unique warc_ts; only
      the latest snapshot's text (revision-marked first line) may
      survive the collapse.
    - BOILERPLATE lines (digit/case-varied banners) on most pages in
      >= 3 distinct docs -> cut from every page; a CROSS-DOC duplicate
      content line in exactly 2 docs is protected from the cut but
      keep-first then drops it from the later (url-order) page.
    - PASS-THROUGH lines ('' and '$$$ ###') never key.
    - SPAM HOST (spam.cur.org, 4 pages of low-alpha garbage) falls to
      the host cut. Note the interplay: the two garbage lines fold to
      the shared digit keys '000'/'0000' (digits→0, symbols strip), so
      at min_docs=3 the boilerplate cut removes them from all 4 pages
      FIRST and the host cut judges the rewritten one-line pages —
      whose only line is the pass-through '$$$ ###' (normalizes
      empty, never keys, quality 0.0). The host-cut margin in the
      gate (0.0 vs tau 0.5) is therefore the rewritten text's, not
      the original garbage's.
    - HAPAX DOC (doc 900 on good host h0): letters-only words unique
      to it -> mean -logp far above every common-word doc -> LM cut.
    - NEAR-DUP MIRROR PAIRS surviving the line stages by design: the
      mirror repeats its base's three 40-word lines with the LAST word
      of each line swapped, so every normalized line key is distinct
      (both docs keep all lines) while word-3-gram Jaccard stays
      ~0.85-0.9. Pair 1 (800/801): the mirror's swap words are LONGER
      -> longest-wins keeps the mirror; pair 2 (810/811): equal-length
      swaps -> the min-doc-id tie-break keeps the base.
    - LANG STRATA en/de/fr/es for the terminal hash sample.
    """
    import datetime
    import os

    def alpha(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, d = divmod(i - 1, 26)
            s = chr(97 + d) + s
        return s

    def content_line(i: int, j: int, swap: str | None = None) -> str:
        ws = ["sect", alpha(i), "part", alpha(j)]
        for g in range(9):
            idx = (i * 997 + j * 101 + g * 13) % len(vocab.FILLER)
            ws += ["the", vocab.FILLER[idx], "and",
                   vocab.FILLER[(idx + 37) % len(vocab.FILLER)]]
        if swap is not None:
            ws[-1] = swap
        return " ".join(ws)

    def boiler(i: int, b: int) -> str:
        base = [
            f"Copyright {2016 + i % 8} Curated Pages Inc",
            "Subscribe to our newsletter today",
            "All rights reserved worldwide",
        ][b % 3]
        return base.upper() if (b % 3 == 1 and i % 2 == 1) else base

    langs = ["en", "de", "fr", "es"]
    rows = []

    def add(doc_id, url, day, text, lang):
        rows.append(dict(
            doc_id=doc_id, url=url,
            warc_ts=(datetime.datetime(2025, 2, 1)
                     + datetime.timedelta(days=day, hours=doc_id % 11,
                                          minutes=doc_id % 7)),
            text=text, lang=lang))

    # --- good hosts h0..h7, 4 pages each, 1-3 snapshots per page ----
    doc_id = 0
    for h in range(8):
        for p in range(4):
            i = h * 4 + p
            site = f"h{h}.cur.org"
            path = f"/p/{p}"
            n_snaps = 1 + (i % 3)
            for j in range(n_snaps):
                deco = (i + j) % 4
                u_host = ("www." + site if deco == 0
                          else site.upper() if deco == 1 else site)
                u_rest = path + ("/" if deco == 2 else "")
                lines = [f"revision {alpha(j)} of page {alpha(i)}",
                         boiler(i, i % 3),
                         content_line(i, 0), "",
                         content_line(i, 1),
                         "$$$ ###" if i % 4 == 2 else boiler(i, 1 + i % 2)]
                if i == 9:  # cross-doc dup: page 9 copies page 8's line
                    lines.append(content_line(8, 0))
                add(doc_id, f"https://{u_host}{u_rest}", i * 2 + j,
                    "\n".join(lines), langs[i % 4])
                doc_id += 1

    # --- blocked-domain pages (good text; only the blocklist drops
    #     them) ---
    for k, u in enumerate(["https://ads.example1.org/x",
                           "https://ads.example1.org/y",
                           "https://www.shop.com.sg/cart"]):
        add(700 + k, u, 50 + k,
            "\n".join([content_line(60 + k, 0),
                       content_line(60 + k, 1)]), "en")

    # --- spam host: 4 pages of low-alpha garbage (host cut) ---
    for k in range(4):
        add(750 + k, f"https://spam.cur.org/{k}", 60 + k,
            "\n".join([f"$$$ {k}{k}{k} ### @@@ !!!! %%% ^^^ &&& ***",
                       f"{k}9{k}9 ____ ==== ++++ |||| ~~~~ ::: ;;;",
                       "$$$ ###"]), langs[k % 4])

    # --- doc-level line-stage drops: a page of PURE boilerplate (no
    #     blanks) vanishes at the boilerplate cut; a page whose every
    #     line already occurs on an earlier-url page vanishes at
    #     keep-first ---
    add(920, "https://zz.cur.org/allboiler", 75,
        "\n".join([boiler(920, 0), boiler(920, 1), boiler(920, 2)]),
        "en")
    add(921, "https://zz.cur.org/alldup", 76,
        "\n".join([content_line(0, 0), content_line(0, 1)]), "en")

    # --- hapax doc on good host h0 (LM cut) ---
    add(900, "https://h0.cur.org/rare", 70,
        " ".join(f"qzx{alpha(w)}vw" for w in range(40)), "en")

    # --- near-dup mirror pairs (survive line stages by design) ---
    def mirror_doc(i, swaps):
        return "\n".join(
            content_line(i, j, swap=swaps[j] if swaps else None)
            for j in range(3))

    add(800, "https://h1.cur.org/base-a", 80, mirror_doc(70, None), "de")
    add(801, "https://h2.cur.org/mirror-a", 81,
        mirror_doc(70, ["variantlongerword", "anotherlongvariant",
                        "extendedswapvariant"]), "de")
    # pair 2: swap words of EXACTLY the base last word's length (all-z,
    # no FILLER word is) -> equal text lengths -> min-doc-id tie-break
    base_b = mirror_doc(71, None)
    swaps_b = ["z" * len(ln.split(" ")[-1])
               for ln in base_b.split("\n")]
    add(810, "https://h3.cur.org/base-b", 82, base_b, "en")
    add(811, "https://h4.cur.org/mirror-b", 83,
        mirror_doc(71, swaps_b), "en")

    _write(os.path.join(out_dir, "curation_pages.parquet"), rows,
           pa.schema([("doc_id", pa.int64()), ("url", pa.string()),
                      ("warc_ts", pa.timestamp("us")),
                      ("text", pa.string()), ("lang", pa.string())]))


def generate_extras(tier: str, cfg: dict, out_dir: str) -> None:
    n_media = {"t1": 64}.get(tier, 256)
    gen_media(out_dir, n_media)
    world = _rebuild_oracle_world(cfg)
    gen_expected_topk(out_dir, world)
    gen_date_spans(out_dir, {"t1": 24}.get(tier, 120))
    gen_number_docs(out_dir, {"t1": 24}.get(tier, 120))
    gen_wiki_pages(out_dir, world, {"t1": 60}.get(tier, 400))
    gen_csv_tables(out_dir, world, {"t1": 12}.get(tier, 60))
    gen_messy_spans(out_dir, world, {"t1": 30}.get(tier, 150))
    gen_bio_tags(out_dir, world, {"t1": 30}.get(tier, 150))
    gen_wikidata_dump(out_dir, world)
    gen_bpe(out_dir, world, {"t1": 24}.get(tier, 120))
    gen_coref_docs(out_dir, world, {"t1": 25}.get(tier, 100))
    gen_crawl_snapshots(out_dir, {"t1": 40}.get(tier, 160))
    gen_et_expected(out_dir, world)
    # needs gen_wiki_pages' redirects/title_qcode/deny + the core
    # documents/gold_spans/entity parquet already on disk
    gen_el_datasets(out_dir)
    gen_pii_docs(out_dir, {"t1": 28}.get(tier, 140))
    # needs the core documents parquet already on disk
    gen_benchmark(out_dir, {"t1": 12}.get(tier, 48))
    gen_wet_pages(out_dir, {"t1": 36}.get(tier, 150))
    gen_domain_blocklist(out_dir)
    gen_psl_crawl(out_dir)
    gen_curation_pages(out_dir)
