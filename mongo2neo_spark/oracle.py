"""Pure-Python specification oracle (SURVEY.md §5.1).

This is "the reference's emitted triple set" for P/R scoring: a simple,
loop-based implementation of the exact same pipeline semantics —
dedup → mention/triple extraction → MinHash-LSH linking →
connected-components canonicalization → canonical-name election →
distinct (subj, pred, obj) set.

It shares ``rules`` and ``functions.hashing`` with the Spark pipeline, so
parity is by construction; the tests then *verify* it (never assume).
No Spark imports here — this must run standalone.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence, Set, Tuple

from . import rules
from .functions import hashing


def _dedup_key(row) -> tuple:
    # deterministic survivor election: same total order the Spark side uses
    # (orderBy role, text, tool, ts — asc, nulls first)
    return (
        (row.role is None, row.role),
        (row.text is None, row.text),
        (row.tool is None, row.tool),
        (row.ts is None, row.ts),
    )


def dedup_turns(rows: Sequence) -> List:
    """Exactly one row per (conv_id, turn_idx): the min row under the
    deterministic survivor order (mirrors operators/ingest.py)."""
    best: Dict[Tuple[str, int], object] = {}
    for r in rows:
        k = (r.conv_id, r.turn_idx)
        if k not in best or _dedup_key(r) < _dedup_key(best[k]):
            best[k] = r
    return [best[k] for k in sorted(best)]


def extract(rows: Sequence) -> Tuple[List[dict], List[dict]]:
    """Per-turn mention + raw-triple extraction via the shared rules."""
    mentions: List[dict] = []
    raw_triples: List[dict] = []
    for r in rows:
        ms = rules.extract_mentions(r.text or "")
        for m in ms:
            mentions.append(
                dict(conv_id=r.conv_id, turn_idx=r.turn_idx,
                     span_start=m.span_start, span_end=m.span_end,
                     surface=m.surface, norm=m.norm, kind=m.kind)
            )
        for t in rules.extract_triples(r.text or "", ms):
            raw_triples.append(
                dict(conv_id=r.conv_id, turn_idx=r.turn_idx,
                     subj_norm=ms[t.subj_idx].norm, pred=t.pred,
                     obj_norm=ms[t.obj_idx].norm)
            )
    return mentions, raw_triples


def candidate_pairs(norms: Iterable[str]) -> Set[Tuple[str, str]]:
    """MinHash-LSH candidate generation over *distinct* norms, with the
    same band keys and band-size cap the Spark path uses."""
    buckets: Dict[str, List[str]] = defaultdict(list)
    for n in sorted(set(norms)):
        sig = hashing.minhash_signature(rules.char_ngrams(n))
        for bk in hashing.band_keys(sig):
            buckets[bk].append(n)
    pairs: Set[Tuple[str, str]] = set()
    for bk, members in buckets.items():
        if len(members) > hashing.BAND_CAP:
            continue  # K3 hot-band drop (same rule as Spark side)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def link_components(norms: Iterable[str]) -> Dict[str, str]:
    """norm -> component representative (lexicographic min norm), via
    union-find over scored candidate pairs."""
    norms = sorted(set(norms))
    parent: Dict[str, str] = {n: n for n in norms}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(candidate_pairs(norms)):
        if rules.pair_score(a, b) >= rules.LINK_THRESHOLD:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    return {n: find(n) for n in norms}


def canonical_names(mentions: Sequence[dict],
                    comp: Dict[str, str]) -> Dict[str, str]:
    """Component representative -> canonical name: the most frequent norm
    (by mention count) in the component, ties broken lexicographically."""
    counts: Dict[str, Counter] = defaultdict(Counter)
    for m in mentions:
        counts[comp[m["norm"]]][m["norm"]] += 1
    out: Dict[str, str] = {}
    for rep, ctr in counts.items():
        best = min(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        out[rep] = best[0]
    return out


def pipeline_triples(rows: Sequence) -> Set[Tuple[str, str, str]]:
    """End-to-end: transcript rows -> distinct canonical (subj, pred, obj)."""
    rows = dedup_turns(rows)
    mentions, raw = extract(rows)
    comp = link_components([m["norm"] for m in mentions])
    canon = canonical_names(mentions, comp)
    out: Set[Tuple[str, str, str]] = set()
    for t in raw:
        out.add((canon[comp[t["subj_norm"]]], t["pred"],
                 canon[comp[t["obj_norm"]]]))
    return out


def precision_recall(ours: Set[tuple], ref: Set[tuple]) -> Tuple[float, float]:
    if not ours or not ref:
        return (0.0, 0.0)
    tp = len(ours & ref)
    return (tp / len(ours), tp / len(ref))
