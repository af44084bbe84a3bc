"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N-vs-4N-executor cluster is unavailable in this sandbox, so —
per the driver instruction — the SAME pipeline job runs on the SAME
input at two parallelism levels (local[8] and local[32] on a 32-core
box) in separate processes, and this script reports throughput at both
plus the scaling efficiency ( (thr_4N / thr_N) / 4 ) into
BENCH/BASELINE.md.

Usage: python BENCH/scaling.py [n_convs] (default sized for ~4M turns)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000  # ~27M turns
INPUT = f"/tmp/m2n_scaling_cache/transcripts_{N_CONVS}"

RUN_SNIPPET = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
from mongo2neo_spark.session import get_spark
from mongo2neo_spark.plans.pipeline import PipelineConfig, run_pipeline
from mongo2neo_spark.operators import extract as _ex, materialize as _mt

cores = int(sys.argv[1])
# SAME job both sizes: identical shuffle width; only the master differs
spark = get_spark(app_name=f"m2n-scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")
n_turns = spark.read.parquet({input!r}).count()
# warm UDF workers (same warmup at both sizes)
wm = _ex.mentions(_ex.extract(spark.read.parquet({input!r}).limit(512))).persist()
_mt.canonical_names(wm, _mt.norm_components(wm)).count(); wm.unpersist()
out = tempfile.mkdtemp(prefix=f"m2n_scale_{{cores}}_")
cfg = PipelineConfig(n_buckets=32, salt=8, run_id=f"scale{{cores}}")
t0 = time.monotonic()
paths = run_pipeline(spark, {input!r}, f"{{out}}/kg", cfg, resume=False)
wall = time.monotonic() - t0
n_triples = spark.read.parquet(paths["triples"]).count()
print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 2),
      "turns": n_turns, "turns_per_sec": round(n_turns / wall, 1),
      "triples": n_triples}}))
spark.stop()
"""


def ensure_input() -> None:
    if os.path.exists(f"{INPUT}/_SUCCESS"):
        return
    from mongo2neo_spark.fixtures import generate_transcripts_distributed
    from mongo2neo_spark.session import get_spark

    spark = get_spark(app_name="m2n-scaling-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    df = generate_transcripts_distributed(spark, N_CONVS, seed=42, partitions=256)
    df.write.mode("overwrite").parquet(INPUT)
    print("generated", spark.read.parquet(INPUT).count(), "turns ->", INPUT)
    spark.stop()


def run_at(cores: int) -> dict:
    script = RUN_SNIPPET.format(repo=REPO, input=INPUT)
    # taskset pins the WHOLE process tree (JVM task threads AND Python
    # UDF workers) to `cores` cpus — without it, local[8]'s Python
    # workers spill onto the other 24 cores and the "small cluster"
    # isn't small.
    proc = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", script,
         str(cores)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"run at {cores} cores produced no RESULT:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ensure_input()
    r8 = run_at(8)
    print("local[8]:", r8)
    r32 = run_at(32)
    print("local[32]:", r32)
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    report = {
        "input_turns": r8["turns"],
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    _write_baseline(report)


def _write_baseline(report: dict) -> None:
    md = f"""# BENCH/BASELINE.md — measured baselines (this engine, this sandbox)

Measured {dt.date.today().isoformat()} on the sandbox host (32 cores,
125 GB RAM, local filesystem, Spark {os.environ.get('SPARK_VERSION', '4.1.2')},
single JVM).  The reference checkout is empty (SURVEY.md §0), so these are
the binding numbers future rounds must match or beat.

## End-to-end KG pipeline (transcripts -> nodes/edges/triples)

Same job, same input ({report['input_turns']:,} synthetic turns,
Zipf-hot conversations, seed 42), two parallelism levels, separate
processes — the sandbox stand-in for N vs 4N executors per the driver
instruction:

| parallelism | wall (s) | throughput (turns/s) |
|---|---|---|
| local[8]  (N)  | {report['local8']['wall_sec']} | {report['local8']['turns_per_sec']:,} |
| local[32] (4N) | {report['local32']['wall_sec']} | {report['local32']['turns_per_sec']:,} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {report['scaling_efficiency']}**
(contract target >= 0.8).

Triples emitted: {report['local32']['triples']:,} (identical at both sizes —
partitioning-independence is asserted by tests/test_pipeline.py).

## Per-round headline suite

`bench.py` (sf0.1 relational tables + {report['input_turns'] // 20:,}-ish-turn
KG run at local[32]) — the driver records its JSON as BENCH_r{{N}}.json;
compare `value` (total wall sec, lower is better) and `kg_turns_per_sec`
(higher is better) across rounds.
"""
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write(md)
    print("wrote", out)


if __name__ == "__main__":
    main()
