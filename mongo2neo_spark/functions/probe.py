"""Driver-venue probe: the one shared primitive behind every
size-adaptive execution-venue choice in the engine.

Pattern (used by plans.pipeline's driver linking and both ANN query
venues in operators.similarity): some stage is a fixed-cost distributed
job (Python UDF passes, CC rounds) whose input is USUALLY tiny — a norm
vocabulary, a query set.  Instead of paying the fixed cost, run ONE
``LIMIT max+1`` job; if it comes back short we already hold the
complete input and the stage collapses to driver arithmetic over the
same shared functions (bit-identical by construction, parity
test-asserted per call site); if it comes back long, the caller keeps
the distributed path.  The probe itself is bounded: at most ``max_rows
+ 1`` rows ever reach the driver, and Spark plans a CollectLimit — no
full scan, no full shuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def driver_probe(df: DataFrame, max_rows: int) -> Optional[list]:
    """Collect ``df`` iff it has at most ``max_rows`` rows.

    Returns the complete row list (possibly empty) when the frame fits,
    else ``None`` — the caller's signal to stay distributed.  One job
    either way.
    """
    if max_rows <= 0:
        return None
    rows = df.limit(max_rows + 1).collect()
    return rows if len(rows) <= max_rows else None
