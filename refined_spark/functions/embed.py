"""Deterministic hash embeddings — the engine's stand-in "model weights".

The reference scores (mention, candidate) pairs with a bi-encoder dot
product between a mention embedding and a precomputed entity description
embedding (/root/reference/src/refined/model_components/ed_layer_2.py:82-84;
embeddings precomputed offline to an fp16 memmap,
inference/processor.py:525-553). We keep the exact same dataflow — entity
embeddings pre-materialized in a parquet table, mention embeddings computed
in a vectorized UDF, dot-product scoring — but replace the 440MB
transformer weights with a deterministic hash embedding, per SURVEY.md §7.1
(the F1 gate is against reference-SEMANTICS clusters on deterministic
fixtures, not against the trained model).

``hash_embed`` is the shared deterministic "encoder": sha256(text) seeds a
PCG64 generator -> unit-normalized gaussian vector. Identical text -> identical
vector; distinct texts -> near-orthogonal vectors (dim 16 keeps |cos| small).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .. import config


def hash_embed(text: str, dim: int = config.EMB_DIM) -> np.ndarray:
    """Deterministic unit vector for a text key. float32."""
    if not text:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.sha256(text.encode("utf-8")).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n).astype(np.float32) if n > 0 else np.zeros(dim, dtype=np.float32)


def hash_embed_batch(texts, dim: int = config.EMB_DIM) -> np.ndarray:
    """Vectorized over a list/Series of texts -> (n, dim) float32 matrix."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if t:
            out[i] = hash_embed(t, dim)
    return out
