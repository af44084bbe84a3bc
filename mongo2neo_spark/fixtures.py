"""Deterministic synthetic transcript generator (FIXTURES.md §A).

Produces the contract input table (conv_id, turn_idx, role, text, tool, ts)
with Zipf-hot conversation sizes (so salted repartitioning is actually
exercised), entity surface forms with alias/misspelling variants (so the
MinHash/LSH linking stage has real work to do), and predicate sentences
drawn from the shared rule module.

Everything derives from ``random.Random(seed)`` — same seed, same bytes.
No external data (driver contract: synthesize deterministically).
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Dict, List, NamedTuple, Optional, Tuple

from . import rules

_SYLLABLES = [
    "ka", "ve", "lo", "ri", "ta", "mu", "zen", "bar", "nis", "or",
    "pel", "dra", "quo", "fim", "sul", "gar", "hex", "jor", "wyn", "ced",
]
_ORG_SUFFIX_SURFACES = ["Corp", "Inc", "Labs", "Gmbh", "Ltd"]
_PLACE_SURFACES = [p.capitalize() for p in sorted(rules.PLACE_NAMES)]
_FILLERS = [
    "the result looks fine so far .",
    "ok let me check the logs again .",
    "that query returned nothing useful .",
    "we should retry with a larger batch .",
    "sounds good , moving on to the next step .",
    "hmm , the numbers do not add up yet .",
]
_TOOLS = ["search", "code", "browse"]

KINDS = ("person", "org", "tool", "place", "artifact")


class Entity(NamedTuple):
    entity_id: str
    kind: str
    surfaces: Tuple[str, ...]  # surfaces[0] is canonical


class Turn(NamedTuple):
    conv_id: str
    turn_idx: int
    role: str
    text: str
    tool: Optional[str]
    ts: dt.datetime


def _name_token(rng: random.Random, n_syll: int = 3) -> str:
    s = "".join(rng.choice(_SYLLABLES) for _ in range(n_syll))
    return s.capitalize()


def _perturb(rng: random.Random, token: str) -> str:
    """Edit-distance-≤2 misspelling that keeps the Capitalized-token shape."""
    if len(token) < 4:
        return token + token[-1]
    i = rng.randrange(1, len(token) - 1)
    op = rng.randrange(3)
    if op == 0:  # double a letter
        return token[: i + 1] + token[i] + token[i + 1 :]
    if op == 1:  # drop a letter
        return token[:i] + token[i + 1 :]
    # swap adjacent (avoid producing the same token)
    if token[i] == token[i + 1] if i + 1 < len(token) else True:
        return token[: i + 1] + token[i] + token[i + 1 :]
    return token[:i] + token[i + 1] + token[i] + token[i + 2 :]


def make_entity_pool(n_entities: int, seed: int = 42) -> List[Entity]:
    rng = random.Random(seed)
    pool: List[Entity] = []
    seen: set = set()
    k = 0
    while len(pool) < n_entities:
        kind = KINDS[len(pool) % len(KINDS)]
        if kind == "place" and all(
            rules.normalize(p) in seen for p in _PLACE_SURFACES
        ):
            kind = "artifact"  # only 10 place surfaces exist; don't livelock
        if kind == "person":
            canonical = f"{_name_token(rng, 2)} {_name_token(rng, 2)}"
        elif kind == "org":
            canonical = f"{_name_token(rng, 2)} {rng.choice(_ORG_SUFFIX_SURFACES)}"
        elif kind == "tool":
            canonical = "Tool" + _name_token(rng, 2).lower()
        elif kind == "place":
            canonical = _PLACE_SURFACES[len(pool) // len(KINDS) % len(_PLACE_SURFACES)]
        else:
            canonical = _name_token(rng, 3)
        norm = rules.normalize(canonical)
        if norm in seen or rules.infer_kind(norm) != kind:
            # regenerate deterministically on collision/kind-mismatch
            k += 1
            if k > 100 * n_entities:
                raise RuntimeError("entity pool generation stuck")
            continue
        seen.add(norm)
        n_alias = rng.randrange(0, 3)
        aliases: List[str] = []
        for _ in range(n_alias):
            toks = canonical.split()
            j = rng.randrange(len(toks))
            toks[j] = _perturb(rng, toks[j])
            alias = " ".join(toks)
            anorm = rules.normalize(alias)
            if anorm != norm and anorm not in seen:
                seen.add(anorm)
                aliases.append(alias)
        pool.append(Entity(f"ent-{len(pool):05d}", kind, (canonical, *aliases)))
    return pool


def _zipf_sizes(rng: random.Random, n: int, a: float = 1.2,
                lo: int = 2, hi: int = 2000) -> List[int]:
    # inverse-CDF Zipf via rejection-free power draw, clipped
    out = []
    for _ in range(n):
        u = rng.random()
        size = int((u ** (-1.0 / (a - 1.0 + 1e-9))))
        out.append(max(lo, min(hi, size)))
    return out


def generate_transcripts(
    n_convs: int = 20,
    seed: int = 42,
    n_entities: int = 25,
    alias_rate: float = 0.15,
    distractor_rate: float = 0.30,
    max_turns: int = 2000,
) -> List[Turn]:
    """The primary fixture: a list of Turn rows, fully deterministic."""
    rng = random.Random(seed)
    pool = make_entity_pool(n_entities, seed)
    sizes = _zipf_sizes(rng, n_convs, hi=max_turns)
    base_ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows: List[Turn] = []
    for ci in range(n_convs):
        conv_id = f"conv-{ci:08d}"
        ts = base_ts + dt.timedelta(seconds=ci * 7919)
        for ti in range(sizes[ci]):
            ts = ts + dt.timedelta(seconds=rng.randrange(10, 300))
            if rng.random() < 0.2:
                role, tool = "tool", rng.choice(_TOOLS)
            else:
                role, tool = ("user", None) if ti % 2 == 0 else ("assistant", None)
            if rng.random() < distractor_rate:
                text = rng.choice(_FILLERS)
            else:
                subj = rng.choice(pool)
                obj = rng.choice(pool)
                pred = rng.choice(rules.PREDICATES)
                s_surf = _pick_surface(rng, subj, alias_rate)
                o_surf = _pick_surface(rng, obj, alias_rate)
                text = f"{s_surf} {pred} {o_surf} ."
                if rng.random() < 0.25:
                    text = rng.choice(_FILLERS) + " " + text
            rows.append(Turn(conv_id, ti, role, text, tool, ts))
    return rows


def _pick_surface(rng: random.Random, ent: Entity, alias_rate: float) -> str:
    if len(ent.surfaces) > 1 and rng.random() < alias_rate:
        return rng.choice(ent.surfaces[1:])
    return ent.surfaces[0]


def turns_to_pandas(rows: List[Turn]):
    """Turn rows -> pandas DataFrame with contract dtypes (for createDataFrame
    and for the pure-Python oracle alike)."""
    import pandas as pd

    return pd.DataFrame(
        {
            "conv_id": [r.conv_id for r in rows],
            "turn_idx": pd.array([r.turn_idx for r in rows], dtype="int32"),
            "role": [r.role for r in rows],
            "text": [r.text for r in rows],
            "tool": [r.tool for r in rows],
            "ts": [r.ts for r in rows],
        }
    )


def generate_transcripts_distributed(
    spark,
    n_convs: int,
    seed: int = 42,
    n_entities: int = 200,
    alias_rate: float = 0.15,
    distractor_rate: float = 0.30,
    max_turns: int = 2000,
    partitions: int = 64,
):
    """Cluster-scale fixture generation: one deterministic RNG stream per
    conversation (seeded by (seed, conv_idx)), generated in parallel via
    mapInPandas.  Same statistical shape as ``generate_transcripts`` (Zipf
    sizes, alias variants, hot conversations) but embarrassingly parallel —
    this is how the 10^12-turn input would be synthesized on a real
    cluster.  Returns a DataFrame with the contract schema.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    pool = make_entity_pool(n_entities, seed)

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
            for ci in pdf["id"]:
                ci = int(ci)
                rng = random.Random((seed << 32) ^ ci)
                size = _zipf_sizes(rng, 1, hi=max_turns)[0]
                conv_id = f"conv-{ci:08d}"
                ts = dt.datetime(2026, 1, 1) + dt.timedelta(seconds=ci * 7919)
                for ti in range(size):
                    ts = ts + dt.timedelta(seconds=rng.randrange(10, 300))
                    if rng.random() < 0.2:
                        role, tool = "tool", rng.choice(_TOOLS)
                    else:
                        role, tool = ("user", None) if ti % 2 == 0 else ("assistant", None)
                    if rng.random() < distractor_rate:
                        text = rng.choice(_FILLERS)
                    else:
                        subj, obj = rng.choice(pool), rng.choice(pool)
                        pred = rng.choice(rules.PREDICATES)
                        text = (f"{_pick_surface(rng, subj, alias_rate)} {pred} "
                                f"{_pick_surface(rng, obj, alias_rate)} .")
                        if rng.random() < 0.25:
                            text = rng.choice(_FILLERS) + " " + text
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(ti)
                    out["role"].append(role)
                    out["text"].append(text)
                    out["tool"].append(tool)
                    out["ts"].append(ts)
            pdf_out = pd.DataFrame(out)
            pdf_out["turn_idx"] = pdf_out["turn_idx"].astype("int32")
            yield pdf_out

    ids = spark.range(0, n_convs).repartition(partitions)
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    return ids.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# synthetic document corpus (curation-pipeline scaling input)
# ---------------------------------------------------------------------------
_DOC_WORDS = [
    "data", "query", "table", "row", "scan", "merge", "batch", "stream",
    "filter", "group", "sort", "window", "join", "hash", "value", "line",
    "part", "key", "big", "small", "fast", "slow", "column", "order",
    "spark", "vector", "customer", "agg",
]
_EN_STOP_WORDS = ["the", "a", "of", "and", "to", "in", "is", "for"]
_ES_WORDS = ["el", "la", "que", "de", "los", "es"]


def _doc_base_text(i: int, seed: int, vocab: int = 0) -> str:
    """Deterministic base text of document i — a pure function, so a
    duplicate of doc j can be generated without materializing doc j.

    ``vocab`` > 0 mixes in tokens from a ``w<k>`` pool of that size
    (half the draws).  Real corpora grow vocabulary with size (Heaps'
    law); without this, a fixed ~30-word vocabulary makes *genuinely
    similar* cross-doc pair volume grow ~n^1.7 and the near-dup verify
    stage quadratic in corpus size (measured: 8.6M/28.1M/80.5M LSH
    candidate pairs at 0.5/1/2M docs with vocab=0)."""
    rng = random.Random(((seed << 32) ^ (i * 2654435761)) & (2**63 - 1))
    words = (_ES_WORDS * 3 + _DOC_WORDS) if rng.random() < 0.1 else (
        _EN_STOP_WORDS * 2 + _DOC_WORDS
    )
    n = rng.randrange(8, 90)  # short docs fail the quality gate
    if vocab <= 0:
        return " ".join(rng.choice(words) for _ in range(n))
    return " ".join(
        f"w{rng.randrange(vocab)}" if rng.random() < 0.5 else rng.choice(words)
        for _ in range(n)
    )


def generate_documents_distributed(
    spark,
    n_docs: int,
    seed: int = 42,
    dup_rate: float = 0.05,
    near_dup_rate: float = 0.05,
    partitions: int = 64,
    vocab: int | None = None,
):
    """Cluster-scale synthetic document corpus for the curation pipeline:
    ~dup_rate exact duplicates (verbatim copies of an earlier doc),
    ~near_dup_rate near-duplicates (a few tokens perturbed), a mix of
    predicted languages and quality levels.  One deterministic RNG per
    doc — embarrassingly parallel, same bytes at any partitioning.

    ``vocab`` defaults to n_docs // 50 (Heaps-ish growth) so the
    similar-pair volume stays linear in corpus size — see
    :func:`_doc_base_text`; pass 0 for the legacy fixed-vocabulary
    corpus."""
    import pandas as pd

    if vocab is None:
        vocab = n_docs // 50

    def gen(batches):
        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"]:
                i = int(i)
                rng = random.Random((seed << 32) ^ i)
                r = rng.random()
                if i > 0 and r < dup_rate:
                    t = _doc_base_text(rng.randrange(i), seed, vocab)
                elif i > 0 and r < dup_rate + near_dup_rate:
                    toks = _doc_base_text(rng.randrange(i), seed, vocab).split()
                    for _ in range(max(1, len(toks) // 30)):
                        toks[rng.randrange(len(toks))] = rng.choice(_DOC_WORDS)
                    t = " ".join(toks)
                else:
                    t = _doc_base_text(i, seed, vocab)
                ids.append(i)
                texts.append(t)
            out = pd.DataFrame({"doc_id": ids, "text": texts})
            out["doc_id"] = out["doc_id"].astype("int64")
            yield out

    ids = spark.range(0, n_docs).repartition(partitions)
    return ids.mapInPandas(gen, "doc_id long, text string")


# ---------------------------------------------------------------------------
# synthetic embedding corpus (ANN scaling input)
# ---------------------------------------------------------------------------
def generate_embeddings_distributed(
    spark,
    n_vecs: int,
    dim: int = 32,
    seed: int = 7,
    n_clusters: int = 64,
    noise: float = 0.25,
    partitions: int = 64,
):
    """Cluster-scale synthetic embeddings: unit vectors drawn around
    ``n_clusters`` deterministic centroids, one per-index rng per vector
    — embarrassingly parallel, identical bytes at any partitioning.

    Two regimes via the knobs: few clusters + large ``noise`` = an ANN
    retrieval corpus (IVF has coarse structure to exploit); many tiny
    clusters (n_clusters ~ n/4) + small ``noise`` (0.02 -> intra-cluster
    cosine ~0.99) = a near-dup corpus with planted duplicate groups.

    Emits ``array<float>`` — the SAME element type as the driver's
    testdata embeddings.parquet (list<float>).  The round-6 12M-vector
    campaign showed why this matters at scale: generating float64 here
    doubled every byte the LSH/IVF index builds shuffle, sort and
    write, and the synthetic corpus no longer modeled the contract
    input.  Scoring still happens in float64 (float32->float64 casts
    are exact, so results are bit-identical to hashing/scoring the
    same values as doubles)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        # centroids are derived per-index too (n_clusters can be huge in
        # the near-dup regime — never materialize the full matrix)
        def centroid(k: int):
            crng = np.random.default_rng((seed << 16) ^ (k * 7919))
            c = crng.standard_normal(dim)
            return c / np.linalg.norm(c)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float64)
            for j, i in enumerate(ids):
                rng = np.random.default_rng((seed << 32) ^ int(i))
                v = centroid(int(i) % n_clusters) + noise * rng.standard_normal(dim)
                out[j] = v / np.linalg.norm(v)
            yield pd.DataFrame(
                {"vec_id": ids.astype("int64"),
                 "embedding": list(out.astype(np.float32))}
            )

    ids = spark.range(0, n_vecs).repartition(partitions)
    return ids.mapInPandas(gen, "vec_id long, embedding array<float>")


def with_duplicates_and_shuffle(rows: List[Turn], seed: int = 7,
                                dup_rate: float = 0.05) -> List[Turn]:
    """Exercise P3 dedup + permutation invariance: duplicate some rows
    verbatim and shuffle the whole list (deterministically)."""
    rng = random.Random(seed)
    dups = [r for r in rows if rng.random() < dup_rate]
    out = rows + dups
    rng.shuffle(out)
    return out
