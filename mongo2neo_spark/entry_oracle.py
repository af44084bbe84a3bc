"""Pure-Python oracle outputs rendered as DuckDB SQL for the driver's
correctness harness (__spark_entry__.oracle_sql()).

Several operators are deterministic but not sanely SQL-expressible
(MinHash-LSH clustering, SimHash, rolling fingerprints, the rule-based
KG extraction).  For those, the *specification implementation* — simple
pure-Python loops sharing ``rules``/``functions.hashing`` with nothing
Spark about them (the same parity-by-construction approach as
``mongo2neo_spark.oracle``) — computes the expected output driver-side,
and this module renders it as a ``VALUES`` query DuckDB can run.  The
driver then performs its usual row-count/schema/value-hash comparison
against the Spark result, turning previously rows-only checks into hard
oracle rows.

No Spark imports here; everything must run standalone in the harness
process.  Inputs are the sf0.01 testdata parquet (the scale the driver
compares at; override with $SPARK_GRAFT_ORACLE_SF_DIR) or deterministic
synthetic fixtures.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Iterable, List, Sequence, Tuple

from .functions import hashing

ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


def _read_docs(sf_dir: str | None = None) -> Tuple[List[int], List[str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir or ORACLE_SF_DIR}/documents.parquet",
        columns=["doc_id", "text"],
    )
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def values_sql(rows: Sequence[tuple], cols: Sequence[Tuple[str, str]]) -> str:
    """Render rows as ``SELECT CAST(...) FROM (VALUES ...)`` with explicit
    DuckDB types so the schema matches the Spark result exactly."""
    if not rows:
        casts = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return f"SELECT {casts} WHERE 1=0"
    body = ",\n".join(
        "(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows
    )
    names = ", ".join(n for n, _ in cols)
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    return f"SELECT {casts} FROM (VALUES\n{body}\n) AS t({names})"


# ---------------------------------------------------------------------------
# pure-Python specification implementations
# ---------------------------------------------------------------------------
def _word_shingles(text: str, n: int = 3) -> frozenset:
    # mirrors operators.dedup._word_shingles (no Spark import allowed here)
    toks = (text or "").split()
    if len(toks) < n:
        return frozenset((" ".join(toks),)) if toks else frozenset()
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


def _jaccard(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 1.0


def minhash_cluster_rows(
    threshold: float = 0.5,
    band_cap: int = hashing.BAND_CAP,
    sf_dir: str | None = None,
) -> List[tuple]:
    """Expected (id, component) rows of
    operators.dedup.minhash_dedup_components on the documents table:
    word-3-shingle MinHash -> LSH bands (capped) -> candidate pairs ->
    exact-jaccard verify -> min-id union-find."""
    ids, texts = _read_docs(sf_dir)
    shingles = {int(i): _word_shingles(t) for i, t in zip(ids, texts)}
    buckets: dict = defaultdict(list)
    for i in sorted(shingles):
        sig = hashing.minhash_signature(shingles[i])
        for bk in hashing.band_keys(sig):
            buckets[bk].append(i)
    parent = {i: i for i in shingles}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = set()
    for bk, members in buckets.items():
        if len(members) > band_cap:
            continue  # K3 hot-band drop, same rule as the Spark path
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                pairs.add((members[ai], members[bi]))
    for a, b in sorted(pairs):
        if _jaccard(shingles[a], shingles[b]) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    return [(i, find(i)) for i in sorted(shingles)]


def simhash_rows(sf_dir: str | None = None) -> List[tuple]:
    """Expected (id, simhash) rows of operators.dedup.simhash_groups."""
    ids, texts = _read_docs(sf_dir)

    def to_i64(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    return [
        (int(i), to_i64(hashing.simhash((t or "").split())))
        for i, t in zip(ids, texts)
    ]


def fingerprint_rows(sf_dir: str | None = None) -> List[tuple]:
    """Expected (doc_id, fingerprint) rows of operators.text.fingerprint_udf."""
    ids, texts = _read_docs(sf_dir)
    return [
        (int(i), hashing.rolling_fingerprint(t or ""))
        for i, t in zip(ids, texts)
    ]


def kg_triple_rows(n_convs: int = 10, seed: int = 11,
                   max_turns: int = 40) -> List[tuple]:
    """Expected distinct (subj, pred, obj) of the full KG pipeline on the
    deterministic synthetic fixture — the pure-Python oracle end-to-end
    (oracle.pipeline_triples), no Spark involved."""
    from . import fixtures, oracle

    rows = fixtures.generate_transcripts(
        n_convs=n_convs, seed=seed, max_turns=max_turns
    )
    return sorted(oracle.pipeline_triples(rows))


def embedding_cluster_rows(
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 8,
    sf_dir: str | None = None,
) -> List[tuple]:
    """Expected (id, component) rows of
    operators.similarity.embedding_dedup_components on the embeddings
    table.  The hyperplane family is deterministic (seed 1337, matching
    similarity._PLANE_SEED), so this numpy replica produces the exact
    same buckets -> candidate pairs -> cosine-verified min-id clusters."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir or ORACLE_SF_DIR}/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    ids = [int(i) for i in t["vec_id"].to_pylist()]
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(1337)
    planes = rng.standard_normal((n_tables * n_planes, vecs.shape[1]))
    signs = (vecs @ planes.T) > 0
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    vals = signs.reshape(len(vecs), n_tables, n_planes) @ weights
    buckets: dict = defaultdict(list)
    for i, row in zip(ids, vals):
        for tbl, bk in enumerate(row):
            buckets[(tbl, int(bk))].append(i)
    pairs = set()
    for members in buckets.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = members[ai], members[bi]
                pairs.add((a, b) if a < b else (b, a))
    id2row = {i: k for k, i in enumerate(ids)}
    norms = np.linalg.norm(vecs, axis=1)
    parent = {i: i for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(pairs):
        ra_, rb_ = id2row[a], id2row[b]
        cos = float(vecs[ra_] @ vecs[rb_]) / float(norms[ra_] * norms[rb_])
        if cos >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    return [(i, find(i)) for i in sorted(ids)]


def multimodal_rows(n: int = 64) -> List[tuple]:
    """Expected (media_id, kind, n_bytes) of multimodal.extract_features
    over synthesize_media(n): kinds cycle image/audio/video and content
    length is 64 + (i % 5) * 32 bytes by construction."""
    kinds = ["image", "audio", "video"]
    return [(i, kinds[i % 3], 64 + (i % 5) * 32) for i in range(n)]


# ---------------------------------------------------------------------------
# rendered SQL (used by __spark_entry__.oracle_sql)
# ---------------------------------------------------------------------------
def minhash_clusters_sql() -> str:
    return values_sql(
        minhash_cluster_rows(), [("id", "BIGINT"), ("component", "BIGINT")]
    )


def simhash_sql() -> str:
    return values_sql(simhash_rows(), [("id", "BIGINT"), ("simhash", "BIGINT")])


def fingerprints_sql() -> str:
    return values_sql(
        fingerprint_rows(), [("doc_id", "BIGINT"), ("fingerprint", "BIGINT")]
    )


def kg_triples_sql() -> str:
    return values_sql(
        kg_triple_rows(),
        [("subj", "VARCHAR"), ("pred", "VARCHAR"), ("obj", "VARCHAR")],
    )


def embedding_clusters_sql() -> str:
    return values_sql(
        embedding_cluster_rows(),
        [("id", "BIGINT"), ("component", "BIGINT")],
    )


def multimodal_sql() -> str:
    return values_sql(
        multimodal_rows(),
        [("media_id", "BIGINT"), ("kind", "VARCHAR"), ("n_bytes", "BIGINT")],
    )
