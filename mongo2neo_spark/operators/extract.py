"""Extract stage (U1 + U2): batched mention detection and (subj, pred,
obj) triple extraction per conversation turn, as ONE Arrow-batched
scalar-iterator pandas UDF (SURVEY.md §2.10).

Why one UDF: mention detection and triple extraction share the per-turn
parse, so fusing them halves the Arrow transfer and keeps exactly one
ArrowEvalPython island in the plan — everything around it stays in
whole-stage codegen.  The UDF body delegates to the shared
``mongo2neo_spark.rules`` module, the same functions the pure-Python
oracle runs, so triple-set parity is by construction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import rules
from ..schemas import MENTION_ARRAY, TRIPLE_ARRAY

EXTRACT_TYPE = T.StructType(
    [
        T.StructField("mentions", MENTION_ARRAY, False),
        T.StructField("triples", TRIPLE_ARRAY, False),
    ]
)


@pandas_udf(EXTRACT_TYPE)
def extract_turn_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """text -> {mentions: array<struct>, triples: array<struct>}.

    Scalar-iterator form amortizes per-batch setup; inside a batch the
    compiled regex in ``rules`` does the work (Arrow moves the data, not
    per-row Python serialization).
    """
    for texts in batches:
        mentions_col = []
        triples_col = []
        for text in texts:
            ms = rules.extract_mentions(text or "")
            mentions_col.append([tuple(m) for m in ms])
            triples_col.append(
                [tuple(t) for t in rules.extract_triples(text or "", ms)]
            )
        yield pd.DataFrame({"mentions": mentions_col, "triples": triples_col})


def extract(turns: DataFrame) -> DataFrame:
    """turns -> one row per turn with mention/triple arrays attached.

    Input should already be salted-repartitioned (operators.skew) so a
    hot conversation's turns spread across executors; extraction is
    row-local, so salting is lossless here.
    """
    return turns.select(
        "conv_id", "turn_idx", "ts", extract_turn_udf(F.col("text")).alias("ex")
    )


def mentions(extracted: DataFrame) -> DataFrame:
    """Unnest the mention arrays into the MENTIONS contract (one shuffle-free
    posexplode; mention_id = xxhash64(conv_id, turn_idx, span_start))."""
    m = extracted.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.posexplode("ex.mentions").alias("pos", "m"),
    )
    return m.select(
        F.xxhash64("conv_id", "turn_idx", F.col("m.span_start")).alias("mention_id"),
        "conv_id",
        "turn_idx",
        "ts",
        F.col("m.span_start").alias("span_start"),
        F.col("m.span_end").alias("span_end"),
        F.col("m.surface").alias("surface"),
        F.col("m.norm").alias("norm"),
        F.col("m.kind").alias("kind"),
    )


def raw_triples(extracted: DataFrame) -> DataFrame:
    """Unnest triple arrays, resolving mention indexes to norms in-place
    (array indexing — no join needed)."""
    t = extracted.select(
        "conv_id", "turn_idx", "ex.mentions", F.explode("ex.triples").alias("t")
    )
    return t.select(
        "conv_id",
        "turn_idx",
        F.element_at("mentions", F.col("t.subj_idx") + 1)["norm"].alias("subj_norm"),
        F.col("t.pred").alias("pred"),
        F.element_at("mentions", F.col("t.obj_idx") + 1)["norm"].alias("obj_norm"),
    )
