"""Deterministic batch embedder (SURVEY E6; reference embedder/client.py:29-37
`create_batch`, nodes.py:304-325 name embedding with newline strip).

Feature-hashing bag-of-words embedder: each lowercase token (and word
bigram) hashes (blake2b — stable across processes/platforms, unlike
Python hash()) to a dimension index + sign; vectors are L2-normalized at
write time so cosine similarity reduces to a dot product (the reference
normalizes candidates in helpers.py:82-85).

At production scale this is the pluggable slot for a real embedding
model; the Spark plumbing (Arrow-batched pandas UDF → ARRAY<FLOAT>
column) is identical.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64

_token_cache: dict[str, tuple[int, float]] = {}


def _tok_slot(tok: str, dim: int) -> tuple[int, float]:
    key = tok
    hit = _token_cache.get(key)
    if hit is not None and hit[0] < dim:
        return hit
    h = int.from_bytes(blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big")
    slot = (h >> 1) % dim, (1.0 if h & 1 else -1.0)
    if len(_token_cache) < 1_000_000:
        _token_cache[key] = slot
    return slot


def embed_texts(texts: pd.Series, dim: int = DEFAULT_DIM) -> pd.Series:
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        toks = [w for w in str(t).replace("\n", " ").lower().split() if w]
        toks = [w.strip(".,;:!?\"'()[]") for w in toks]
        toks = [w for w in toks if w]
        v = np.zeros(dim, dtype=np.float32)
        prev = None
        for w in toks:
            i, s = _tok_slot(w, dim)
            v[i] += s
            if prev is not None:
                i2, s2 = _tok_slot(prev + "_" + w, dim)
                v[i2] += 0.5 * s2
            prev = w
        n = float(np.linalg.norm(v))
        if n > 0:
            v /= n
        out.append(v.tolist())
    return pd.Series(out)


def embedder_udf(dim: int = DEFAULT_DIM):
    @pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return embed_texts(texts, dim)

    return _embed


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two L2-normalized ARRAY<FLOAT> columns as a
    native SQL dot product (reference Neo4j vector.similarity.cosine,
    search_utils.py:234) — `zip_with` + `aggregate`, fully JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_normalize(a: Column) -> Column:
    """L2-normalize an ARRAY<FLOAT/DOUBLE> column (reference helpers.py:82-85)."""
    norm = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(norm > 0, F.transform(a, lambda x: x / norm)).otherwise(a)
