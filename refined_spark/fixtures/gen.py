"""Deterministic synthetic-corpus generator (FIXTURES.md).

Produces, per tier, the full ER fixture set under ``.fixtures/<tier>/``:

- ``documents``        (url, warc_ts, html BINARY, text, lang) — input_hint shape
- ``gold_spans``       labeled mentions (AIDA-jsonl-shaped, flattened)
- ``link_counts``      raw alias-link counts (input to the A1 PEM build op)
- ``pem``              normalized alias table (surface_form, qcode, prob, rank<=30)
- ``entity``           entity dimension (qcode, qcode_idx, label, description,
                       topic, class_idx, is_human, wiki_title)
- ``entity_emb``       (qcode_idx, desc_emb) incl. all-zeros pad row 0
- ``topic_class``      ctx-topic -> class_idx (deterministic ET stand-in)
- ``class_edges``      P279-style subclass DAG
- ``ed_weights``       scoring weight fixture
- ``gold_pairs``       labeled same-block mention pairs (the F1 gate input)
- ``expected_candidates / expected_links / expected_clusters`` — NumPy-oracle
  goldens (t1/t2 only)

Everything is seeded (seed 42 + doc index); NO wall-clock, NO external data.
HTML is generated so that :func:`refined_spark.operators.extract.extract_text`
reproduces ``text`` byte-identically (the invariant is asserted at gen time).
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timedelta
from html import escape

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import config
from ..functions.embed import hash_embed
from ..functions.normalize import normalize_surface_form
from . import vocab
from .oracle import run_oracle

FIXTURE_VERSION = "v5"  # v5: documents/gold_spans sharded into many files

# Extra tables added after round 1 (media, dates, anchors, tables, spans…).
# Versioned SEPARATELY so adding one never invalidates the expensive bench
# corpus: extras are only generated for oracle tiers (t1/t2) and regenerate
# independently of the core stamp.
EXTRAS_VERSION = "x25"  # x25: ET goldens type NULL-ctx spans via the
                        # '' sentinel (every span predicted);
                        # x24: path-only trailing-slash alias decoration
                        # (canonical_url rule 5 fix);
                        # x23: wildcard/exception PSL rows (psl_crawl +
                        # blocklist — *.mm / !city.kawasaki.jp arms);
                        # x22: psl_crawl + curation_pages, PSL blocklist
                        # (url/domain filtering gate);
                        # x18 added the multi-line wet_pages corpus
                        # (line-dedup + boilerplate-cut gates);
                        # x17 added the PII corpus + decontam benchmark
                        # ('21st of February 2009', '21 February',
                        # 'February of 2009', '2009 February') to the
                        # date_spans sampler; x15 added the AIDA/standard
                        # EL dataset jsonl

TIERS = {
    "t1": dict(n_stems=20, n_persons=12, n_docs=120, pair_cap=None,
               with_oracle=True, n_hot=20),
    "t2": dict(n_stems=50, n_persons=40, n_docs=2000, pair_cap=400,
               with_oracle=True, n_hot=35),
    # bench corpus sized so per-stage WORK dominates per-stage scheduling
    # latency at the scaling-efficiency measurement levels (a 400k corpus
    # finishes its shuffle stages in ~1s — pure latency — at which point
    # N-vs-4N efficiency measures the driver, not the engine)
    # 4.8M docs: sized so the parallel work P is >=30x the fixed per-job
    # floor S (driver planning + broadcast builds + CC round latency,
    # ~16s measured round 2) — below that ratio the N-vs-4N measurement
    # reads Amdahl on S, not engine scaling (P/S=22 -> eff 0.80 exactly;
    # doubling the corpus moves the same engine to ~0.88)
    "bench": dict(n_stems=50, n_persons=60, n_docs=4_800_000, pair_cap=50,
                  with_oracle=False, n_hot=35),
}

TIER_FOR_SF = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}

DEFAULT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".fixtures")


def fixture_dir_for_sf(sf_dir: str, root: str | None = None) -> str:
    """Map a driver sf dir (…/sf0.01) to the matching fixture tier dir."""
    tier = TIER_FOR_SF.get(os.path.basename(os.path.normpath(sf_dir)), "t2")
    return os.path.join(root or DEFAULT_ROOT, tier)


# --------------------------------------------------------------------------
# universe
# --------------------------------------------------------------------------

def _class_tables():
    names = sorted({c for e in vocab.CLASS_EDGES for c in e})
    cidx = {n: i for i, n in enumerate(names)}
    parents: dict[str, set[str]] = {}
    for child, parent in vocab.CLASS_EDGES:
        parents.setdefault(child, set()).add(parent)
    closure: dict[str, set[str]] = {}

    def close(c):
        if c in closure:
            return closure[c]
        out = {c}
        for p in parents.get(c, ()):
            out |= close(p)
        closure[c] = out
        return out

    for n in names:
        close(n)
    return names, cidx, closure


def build_universe(cfg, rng):
    class_names, cidx, closure = _class_tables()
    base_topics = [t for t, c in vocab.TOPIC_CLASS.items() if c != "C_person"]

    entities: list[dict] = []
    surfaces: dict[str, list[str]] = {}     # norm_sf -> [qcode] (creation order)
    display: dict[str, str] = {}            # norm_sf -> cased display form
    topic_rows: dict[str, str] = {}         # topic word -> class name

    def add_entity(label, topic_word, class_name, is_human, has_desc,
                   never_gold=False):
        qcode = f"Q{100 + len(entities)}"
        cl = sorted(cidx[c] for c in closure[class_name])
        entities.append(dict(
            qcode=qcode, label=label, topic=topic_word,
            description=(f"{label}, a notable {topic_word}" if has_desc else None),
            class_idx=cl, is_human=is_human,
            wiki_title=label.replace(" ", "_"), never_gold=never_gold,
        ))
        topic_rows[topic_word] = class_name
        return entities[-1]

    def add_surface(surface_cased, qcode):
        norm = normalize_surface_form(surface_cased)
        surfaces.setdefault(norm, []).append(qcode)
        display.setdefault(norm, surface_cased)

    # ambiguous stems
    stems = vocab.NAME_STEMS[: cfg["n_stems"]]
    for stem in stems:
        k = 1 + int(rng.random() < 0.55) + int(rng.random() < 0.25)
        topics = list(rng.choice(base_topics, size=min(k, len(base_topics)),
                                 replace=False))
        for j, base_t in enumerate(topics):
            tword = base_t if len(topics) == 1 else f"{base_t}{j}"
            topic_rows.setdefault(tword, vocab.TOPIC_CLASS[base_t])
            e = add_entity(stem, tword, vocab.TOPIC_CLASS[base_t],
                           is_human=False, has_desc=True)
            e["topic"] = tword
            add_surface(stem, e["qcode"])
            if rng.random() < 0.5:  # per-entity alias surface
                alias = f"{stem} {base_t.capitalize()}"
                e["alias"] = alias
                add_surface(alias, e["qcode"])
        if rng.random() < 0.3:  # no-description distractor (never gold)
            base_t = str(rng.choice(base_topics))
            e = add_entity(stem + " (other)", f"{base_t}x", vocab.TOPIC_CLASS[base_t],
                           is_human=False, has_desc=False, never_gold=True)
            add_surface(stem, e["qcode"])

    # persons
    persons = []
    used_pairs, used_occ_by_last = set(), {}
    shared, unique = list(vocab.LAST_NAMES_SHARED), list(vocab.LAST_NAMES_UNIQUE)
    occs = list(vocab.OCCUPATIONS)
    for i in range(cfg["n_persons"]):
        for _attempt in range(50):
            first = vocab.FIRST_NAMES[int(rng.integers(len(vocab.FIRST_NAMES)))]
            last = (shared[int(rng.integers(len(shared)))]
                    if rng.random() < 0.6 or not unique
                    else unique[int(rng.integers(len(unique)))])
            if (first, last) not in used_pairs:
                used_pairs.add((first, last))
                break
        used = used_occ_by_last.setdefault(last, set())
        avail = [o for o in occs if o not in used] or occs
        occ = avail[int(rng.integers(len(avail)))]
        used.add(occ)
        label = f"{first} {last}"
        e = add_entity(label, occ, "C_person", is_human=True, has_desc=True)
        e["last"] = last
        persons.append(e)
        add_surface(label, e["qcode"])

    # one famous surname directly in the alias table (merge path, M3)
    famous = next((p for p in persons if p["last"] == "Johnson"), None)
    if famous is not None:
        add_surface("Johnson", famous["qcode"])

    # hot skewed key (salting/AQE exercise): many candidates for one surface
    hot_goldable = []
    for i in range(cfg["n_hot"]):
        tword = f"conglomerate{i}"
        e = add_entity("Acme", tword, "C_company", is_human=False, has_desc=True)
        add_surface("Acme", e["qcode"])
        hot_goldable.append(e)

    # dense surrogate index (1-based; 0 = pad), by qcode string order
    for i, e in enumerate(sorted(entities, key=lambda x: x["qcode"]), 1):
        e["qcode_idx"] = i

    # link counts -> pem probabilities (distinct totals => distinct probs)
    ent_by_q = {e["qcode"]: e for e in entities}
    sources = ["labels", "aliases", "hyperlinks", "titles", "redirects",
               "aida_means"]
    link_rows, pem_rows = [], []
    for norm in sorted(surfaces):
        qcodes = surfaces[norm]
        totals = rng.choice(np.arange(20, 20 + 8 * len(qcodes)),
                            size=len(qcodes), replace=False)
        ssum = float(totals.sum())
        disp = display[norm]
        scored = sorted(
            ((q, int(t)) for q, t in zip(qcodes, totals)),
            key=lambda x: (-x[1] / ssum, x[0]),
        )
        for rank, (q, t) in enumerate(scored, 1):
            prob = t / ssum
            if rank <= config.MAX_CANDIDATES:
                pem_rows.append(dict(surface_form=norm, qcode=q, prob=prob,
                                     rank=rank))
            n_parts = 1 + int(rng.integers(0, 3))
            cuts = sorted(rng.choice(np.arange(1, t), size=min(n_parts - 1, t - 1),
                                     replace=False)) if t > 1 else []
            parts = np.diff([0, *cuts, t])
            for p_i, part in enumerate(parts):
                variant = [disp, disp.upper(), "The " + disp, disp + "."][
                    int(rng.integers(4))]
                link_rows.append(dict(
                    surface_form_raw=variant, qcode=q,
                    source=sources[int(rng.integers(len(sources)))],
                    cnt=int(part),
                ))

    # matcher dictionary = pem keys + words of multi-word human surfaces
    pem_by_sf: dict[str, list[tuple[str, float]]] = {}
    for r in pem_rows:
        pem_by_sf.setdefault(r["surface_form"], []).append((r["qcode"], r["prob"]))
    human_words = set()
    for sf, cands in pem_by_sf.items():
        words = sf.split(" ")
        if len(words) > 1 and any(
            ent_by_q[q]["is_human"] and p > config.PERSON_COREF_PEM_MIN
            for q, p in cands
        ):
            human_words.update(words)
    match_dict = set(pem_by_sf) | human_words

    return dict(
        entities=entities, persons=persons, surfaces=surfaces, display=display,
        pem_rows=pem_rows, pem_by_sf=pem_by_sf, link_rows=link_rows,
        class_names=class_names, cidx=cidx,
        topic_rows=topic_rows, match_dict=match_dict, ent_by_q=ent_by_q,
        stems=stems, hot_goldable=hot_goldable,
    )


# --------------------------------------------------------------------------
# documents
# --------------------------------------------------------------------------

def _fillers(drng, n):
    return [vocab.FILLER[int(i)] for i in
            drng.integers(0, len(vocab.FILLER), size=n)]


def _raw_variant(drng, surface, allow_the=True):
    r = drng.random()
    if r < 0.60:
        return surface
    if r < 0.75:
        parts = surface.split(" ")
        parts[0] = parts[0].upper()
        return " ".join(parts)
    if r < 0.85 and allow_the:
        return "The " + surface
    # diacritic variant on the first mappable letter (ascii_fold-parity set)
    chars = list(surface)
    for i, ch in enumerate(chars):
        rep = vocab.DIACRITIC_MAP.get(ch.lower())
        if rep:
            chars[i] = rep if ch.islower() else rep.upper()
            break
    return "".join(chars)


def _pick_gold(drng, uni, norm_sf):
    cands = uni["pem_by_sf"].get(norm_sf, [])
    elig = [(q, p) for q, p in cands[: config.MAX_CANDIDATES]
            if not uni["ent_by_q"][q]["never_gold"]
            and uni["ent_by_q"][q]["description"] is not None]
    if not elig:
        return None
    probs = np.array([p for _q, p in elig])
    probs = probs / probs.sum()
    return elig[int(drng.choice(len(elig), p=probs))][0]


def build_docs(cfg, uni):
    docs, spans = [], []
    t0 = datetime(2025, 1, 1)
    stems = uni["stems"]
    persons = uni["persons"]
    for i in range(cfg["n_docs"]):
        drng = np.random.Generator(np.random.PCG64(
            np.random.SeedSequence([42, i])))
        url = f"https://example.org/page/{i:07d}"
        lang = "en" if drng.random() < 0.9 else ("de" if drng.random() < 0.5
                                                 else "fr")
        # events: (surface_tokens, gold_qcode, ctx_word)
        events = []
        n_ev = 1 + int(drng.integers(0, 5))
        j = 0
        while j < n_ev:
            r = drng.random()
            if r < 0.08:
                nil = vocab.NIL_SURFACES[int(drng.integers(
                    len(vocab.NIL_SURFACES)))]
                events.append((nil.split(" "), None, None))
            elif r < 0.30 and persons:
                p = persons[int(drng.integers(len(persons)))]
                ctx = p["topic"] if drng.random() < 0.85 else None
                events.append((p["label"].split(" "), p["qcode"], ctx))
                for _k in range(1 + int(drng.integers(0, 2))):
                    events.append(([p["last"]], p["qcode"], p["topic"]))
                    j += 1
            elif r < 0.36:
                gold = _pick_gold(drng, uni, "acme")
                if gold is not None:
                    events.append((_raw_variant(drng, "Acme").split(" "),
                                   gold, uni["ent_by_q"][gold]["topic"]))
            else:
                stem = stems[int(drng.integers(len(stems)))]
                norm = normalize_surface_form(stem)
                gold = _pick_gold(drng, uni, norm)
                if gold is None:
                    j += 1
                    continue
                ent = uni["ent_by_q"][gold]
                if "alias" in ent and drng.random() < 0.25:
                    surface = ent["alias"]
                    allow_the = True
                else:
                    surface = stem
                    allow_the = True
                raw = _raw_variant(drng, surface, allow_the=allow_the)
                ctx = ent["topic"] if drng.random() < 0.95 else None
                events.append((raw.split(" "), gold, ctx))
            j += 1

        # paragraphs
        n_paras = 1 + int(drng.integers(0, 3))
        cuts = sorted(drng.integers(0, len(events) + 1, size=n_paras - 1)) \
            if n_paras > 1 else []
        para_events = np.split(np.arange(len(events)), cuts)
        para_texts, para_span_meta = [], []
        for ev_idx in para_events:
            tokens = _fillers(drng, 2 + int(drng.integers(0, 3)))
            meta = []
            for k in ev_idx:
                m_tokens, gold, ctx = events[int(k)]
                start_tok = len(tokens)
                tokens.extend(m_tokens)
                if ctx:
                    tokens.append(f"({ctx})")
                tokens.extend(_fillers(drng, 2 + int(drng.integers(0, 4))))
                meta.append((start_tok, len(m_tokens), gold, ctx))
            text = " ".join(tokens) + "."
            para_texts.append(text)
            # char offsets
            offs, pos = [], 0
            for t in tokens:
                offs.append(pos)
                pos += len(t) + 1
            para_span_meta.append([
                (offs[st], len(" ".join(tokens[st:st + n])), gold, ctx,
                 " ".join(tokens[st:st + n]))
                for st, n, gold, ctx in meta
            ])

        doc_text = "\n".join(para_texts)
        base = 0
        for ptext, metas in zip(para_texts, para_span_meta):
            for off, ln, gold, ctx, mtext in metas:
                start = base + off
                assert doc_text[start:start + ln] == mtext
                norm = normalize_surface_form(mtext)
                spans.append(dict(
                    url=url, start=start, length=ln, mention_text=mtext,
                    gold_qcode=gold, coarse_type="MENTION", ctx_word=ctx,
                    norm_sf=norm,
                    dict_matchable=norm in uni["match_dict"],
                ))
            base += len(ptext) + 1

        # html (extraction must reproduce doc_text byte-identically)
        parts = ["<html><body>"]
        for ptext in para_texts:
            if drng.random() < 0.25:
                first, _sep, rest = ptext.partition(" ")
                parts.append(f"<p><b>{escape(first)}</b> {escape(rest)}</p>")
            else:
                parts.append(f"<p>{escape(ptext)}</p>")
            if drng.random() < 0.2:
                parts.append("<script>var x = 1;</script>")
        parts.append("</body></html>")
        html = "".join(parts).encode("utf-8")

        docs.append(dict(
            url=url, warc_ts=t0 + timedelta(seconds=int(i)), html=html,
            text=doc_text, lang=lang,
        ))
    return docs, spans


def build_gold_pairs(spans, cap, seed=42):
    rng = np.random.Generator(np.random.PCG64(seed))
    by_block: dict[str, list[dict]] = {}
    for sp in spans:
        by_block.setdefault(sp["norm_sf"], []).append(sp)
    rows = []
    for block in sorted(by_block):
        members = sorted(by_block[block], key=lambda s: (s["url"], s["start"]))
        n = len(members)
        n_pairs = n * (n - 1) // 2
        if cap is None or n_pairs <= cap:
            sel_pairs = [(a, b) for a in range(n) for b in range(a + 1, n)]
        else:
            # sample pair indices WITHOUT materializing the O(n^2) list
            idx = rng.choice(n_pairs, size=cap, replace=False)
            sel_pairs = []
            for flat in sorted(int(x) for x in idx):
                # unrank: pair index -> (a, b), a < b
                a = int((2 * n - 1 - np.sqrt((2 * n - 1) ** 2
                                             - 8 * flat)) // 2)
                # guard against sqrt rounding at block boundaries
                while a * (2 * n - a - 1) // 2 > flat:
                    a -= 1
                while (a + 1) * (2 * n - a - 2) // 2 <= flat:
                    a += 1
                off = flat - a * (2 * n - a - 1) // 2
                sel_pairs.append((a, a + 1 + off))
        for a, b in sel_pairs:
            sa, sb = members[a], members[b]
            rows.append(dict(
                url_a=sa["url"], start_a=sa["start"],
                url_b=sb["url"], start_b=sb["start"], block_key=block,
                same_entity=bool(
                    sa["gold_qcode"] is not None
                    and sa["gold_qcode"] == sb["gold_qcode"]),
            ))
    return rows


# --------------------------------------------------------------------------
# writing
# --------------------------------------------------------------------------

def _write(path, rows, schema):
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, path)


def _write_sharded(path, rows, schema, rows_per_file: int = 12500):
    """Write a DIRECTORY of parquet shards (deterministic round-robin-free
    contiguous chunks). Spark/pyarrow/duckdb all read the directory
    transparently. Real corpora are thousands of files; a single fat file
    caps the scan at one split (maxPartitionBytes) and forces a full-corpus
    shuffle just to get parallelism — sharding makes map stages scale with
    the core count, which the bench's N-vs-4N protocol measures."""
    n = max(1, min(64, (len(rows) + rows_per_file - 1) // rows_per_file))
    if n == 1:
        _write(path, rows, schema)
        return
    os.makedirs(path, exist_ok=True)
    per = (len(rows) + n - 1) // n
    for i in range(n):
        chunk = rows[i * per:(i + 1) * per]
        if chunk:
            _write(os.path.join(path, f"part-{i:04d}.parquet"), chunk, schema)


def generate(tier: str, out_dir: str) -> None:
    cfg = TIERS[tier]
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(42))
    uni = build_universe(cfg, rng)
    docs, spans = build_docs(cfg, uni)

    # byte-identical extraction invariant, asserted at gen time
    from ..operators.extract import extract_text
    for d in docs[: min(len(docs), 200)]:
        assert extract_text(d["html"]) == d["text"], d["url"]

    _write_sharded(os.path.join(out_dir, "documents.parquet"), docs,
                   pa.schema([
                       ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                       ("html", pa.binary()), ("text", pa.string()),
                       ("lang", pa.string()),
                   ]))
    _write_sharded(os.path.join(out_dir, "gold_spans.parquet"), spans,
                   pa.schema([
        ("url", pa.string()), ("start", pa.int32()), ("length", pa.int32()),
        ("mention_text", pa.string()), ("gold_qcode", pa.string()),
        ("coarse_type", pa.string()), ("ctx_word", pa.string()),
        ("norm_sf", pa.string()), ("dict_matchable", pa.bool_()),
    ]))
    _write(os.path.join(out_dir, "link_counts.parquet"), uni["link_rows"],
           pa.schema([
               ("surface_form_raw", pa.string()), ("qcode", pa.string()),
               ("source", pa.string()), ("cnt", pa.int64()),
           ]))
    _write(os.path.join(out_dir, "pem.parquet"), uni["pem_rows"], pa.schema([
        ("surface_form", pa.string()), ("qcode", pa.string()),
        ("prob", pa.float64()), ("rank", pa.int32()),
    ]))
    ent_rows = [
        dict(qcode=e["qcode"], qcode_idx=e["qcode_idx"], label=e["label"],
             description=e["description"], topic=e["topic"],
             class_idx=e["class_idx"], is_human=e["is_human"],
             wiki_title=e["wiki_title"])
        for e in uni["entities"]
    ]
    _write(os.path.join(out_dir, "entity.parquet"), ent_rows, pa.schema([
        ("qcode", pa.string()), ("qcode_idx", pa.int64()),
        ("label", pa.string()), ("description", pa.string()),
        ("topic", pa.string()), ("class_idx", pa.list_(pa.int16())),
        ("is_human", pa.bool_()), ("wiki_title", pa.string()),
    ]))
    emb_rows = [dict(qcode_idx=0,
                     desc_emb=[0.0] * config.EMB_DIM)]
    for e in uni["entities"]:
        emb = (hash_embed(e["topic"]) if e["description"] is not None
               else np.zeros(config.EMB_DIM, dtype=np.float32))
        emb_rows.append(dict(qcode_idx=e["qcode_idx"],
                             desc_emb=[float(x) for x in emb]))
    _write(os.path.join(out_dir, "entity_emb.parquet"), emb_rows, pa.schema([
        ("qcode_idx", pa.int64()), ("desc_emb", pa.list_(pa.float32())),
    ]))
    topic_rows = [dict(topic=t, class_idx=uni["cidx"][c])
                  for t, c in sorted(uni["topic_rows"].items())]
    _write(os.path.join(out_dir, "topic_class.parquet"), topic_rows, pa.schema([
        ("topic", pa.string()), ("class_idx", pa.int16()),
    ]))
    _write(os.path.join(out_dir, "class_edges.parquet"),
           [dict(child_class=c, parent_class=p) for c, p in vocab.CLASS_EDGES],
           pa.schema([("child_class", pa.string()),
                      ("parent_class", pa.string())]))
    weights_rows = [
        dict(feature="class_overlap", weight=2.0),
        dict(feature="pem", weight=1.5),
        dict(feature="class_dist", weight=-1.0),
        dict(feature="desc_score", weight=3.0),
        dict(feature="bias", weight=0.0),
    ]
    _write(os.path.join(out_dir, "ed_weights.parquet"), weights_rows,
           pa.schema([("feature", pa.string()), ("weight", pa.float64())]))
    pairs = build_gold_pairs(spans, cfg["pair_cap"])
    _write(os.path.join(out_dir, "gold_pairs.parquet"), pairs, pa.schema([
        ("url_a", pa.string()), ("start_a", pa.int32()),
        ("url_b", pa.string()), ("start_b", pa.int32()),
        ("block_key", pa.string()), ("same_entity", pa.bool_()),
    ]))

    if cfg["with_oracle"]:
        tclass = [dict(topic=r["topic"], class_idx=r["class_idx"])
                  for r in topic_rows]
        cand_out, link_out, cluster_out = run_oracle(
            docs, spans, uni["pem_rows"], ent_rows,
            emb_rows, weights_rows, tclass,
        )
        _write(os.path.join(out_dir, "expected_candidates.parquet"), cand_out,
               pa.schema([
                   ("url", pa.string()), ("start", pa.int32()),
                   ("qcode", pa.string()), ("prob", pa.float64()),
                   ("cand_source", pa.string()), ("cand_rank", pa.int32()),
               ]))
        _write(os.path.join(out_dir, "expected_links.parquet"), link_out,
               pa.schema([
                   ("url", pa.string()), ("start", pa.int32()),
                   ("pred_qcode", pa.string()), ("confidence", pa.float64()),
               ]))
        _write(os.path.join(out_dir, "expected_clusters.parquet"), cluster_out,
               pa.schema([
                   ("url", pa.string()), ("start", pa.int32()),
                   ("cluster_id", pa.string()),
               ]))

    stamp = dict(version=FIXTURE_VERSION, tier=tier, cfg=cfg)
    with open(os.path.join(out_dir, "_VERSION.json"), "w") as f:
        json.dump(stamp, f, sort_keys=True)


def _stamp_ok(out_dir, tier):
    p = os.path.join(out_dir, "_VERSION.json")
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            stamp = json.load(f)
        return (stamp.get("version") == FIXTURE_VERSION
                and stamp.get("cfg") == TIERS[tier])
    except Exception:
        return False


def _extras_ok(out_dir):
    p = os.path.join(out_dir, "_EXTRAS.json")
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return json.load(f).get("version") == EXTRAS_VERSION
    except Exception:
        return False


def ensure_extras(tier: str, out_dir: str) -> None:
    """Generate the post-round-1 extra tables (oracle tiers only) if their
    stamp is stale — independent of the core corpus stamp, so an extras
    bump never regenerates the bench-scale documents."""
    if not TIERS[tier]["with_oracle"] or _extras_ok(out_dir):
        return
    from .extras import generate_extras

    generate_extras(tier, TIERS[tier], out_dir)
    with open(os.path.join(out_dir, "_EXTRAS.json"), "w") as f:
        json.dump(dict(version=EXTRAS_VERSION, tier=tier), f)


def ensure_fixtures(target: str, root: str | None = None) -> str:
    """Idempotent: generate the fixture tier for ``target`` if missing.

    ``target`` may be a tier name (t1/t2/bench) or a driver sf dir path.
    Returns the fixture directory.
    """
    tier = target if target in TIERS else TIER_FOR_SF.get(
        os.path.basename(os.path.normpath(target)), "t2")
    out_dir = os.path.join(root or DEFAULT_ROOT, tier)
    if not _stamp_ok(out_dir, tier):
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)  # stale version: rebuild from clean
        generate(tier, out_dir)
    ensure_extras(tier, out_dir)
    return out_dir
