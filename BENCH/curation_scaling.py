"""N-vs-4N scaling evidence for the CURATION pipeline (the data-pipeline
operator family: profile -> exact dedup -> minhash near-dup -> filter),
mirroring BENCH/scaling.py's protocol for the KG pipeline:

    N  = local-cluster[1, 4, 6144]  (taskset-pinned to 4 cores)
    4N = local-cluster[4, 4, 6144]  (taskset-pinned to 16 cores)

Same spark-submit --py-files job (BENCH/run_curation_job.py), same
input, best-of-k; curated-survivor counts are asserted identical across
cluster sizes (partitioning-independence is a correctness property).
Results land in BENCH/curation_scaling.json and as a marked section in
BENCH/BASELINE.md (preserved by scaling.py regeneration).

Usage: python BENCH/curation_scaling.py [n_docs]   (default 2M docs)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys
import tempfile

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(BENCH_DIR)
sys.path.insert(0, REPO)
sys.path.insert(0, BENCH_DIR)
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

from scaling import (  # noqa: E402
    EXEC_CORES,
    EXEC_MEM_MB,
    SIZES,
    build_pyfiles_zip,
    host_calibration,
    spark_submit_bin,
)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
INPUT = f"/tmp/m2n_curation_cache/documents_{N_DOCS}"

SECTION_BEGIN = "<!-- CURATION_SCALING_BEGIN -->"
SECTION_END = "<!-- CURATION_SCALING_END -->"


def ensure_input() -> None:
    if os.path.exists(f"{INPUT}/_SUCCESS"):
        return
    from mongo2neo_spark.fixtures import generate_documents_distributed
    from mongo2neo_spark.session import get_spark

    spark = get_spark(app_name="m2n-curation-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    df = generate_documents_distributed(spark, N_DOCS, seed=42, partitions=256)
    df.write.mode("overwrite").parquet(INPUT)
    print("generated", spark.read.parquet(INPUT).count(), "docs ->", INPUT)
    spark.stop()


def run_at(n_execs: int, zpath: str) -> dict:
    cores = n_execs * EXEC_CORES
    out = tempfile.mkdtemp(prefix=f"m2n_cur_scale_{n_execs}x_", dir="/dev/shm")
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        spark_submit_bin(),
        "--master", f"local-cluster[{n_execs},{EXEC_CORES},{EXEC_MEM_MB}]",
        "--driver-memory", "4g",
        # local-cluster's third arg is worker memory; executor heap must
        # be set explicitly or it defaults to 1g
        "--conf", f"spark.executor.memory={EXEC_MEM_MB - 1024}m",
        "--conf", "spark.sql.shuffle.partitions=128",
        "--conf", "spark.local.dir=/dev/shm/m2n-spark-local",
        "--py-files", zpath,
        os.path.join(REPO, "BENCH", "run_curation_job.py"),
        "--input", INPUT, "--out", f"{out}/cur",
    ]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                          env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["executors"] = n_execs
            r["cores"] = cores
            return r
    raise RuntimeError(
        f"{n_execs}-executor curation run produced no RESULT:\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )


def _best_of(n_execs: int, zpath: str, k: int) -> dict:
    runs = [run_at(n_execs, zpath) for _ in range(k)]
    for r in runs:
        print(f"  run @{n_execs} execs:", r)
    best = max(runs, key=lambda r: r["docs_per_sec"])
    best["runs"] = [r["wall_sec"] for r in runs]
    return best


def render_section(report: dict) -> str:
    # two-point decomposition T(p) = a/p + b: the parallel work a and the
    # serial/fixed term b (driver jobs, UDF warmup, lineage bookkeeping)
    wn, w4 = report["N"]["wall_sec"], report["4N"]["wall_sec"]
    cn, c4 = report["N"]["cores"], report["4N"]["cores"]
    a = (wn - w4) / (1.0 / cn - 1.0 / c4)
    b = wn - a / cn
    proj = round((10 * a / cn + b) / (4 * (10 * a / c4 + b)), 3)
    return f"""{SECTION_BEGIN}
## Curation pipeline — N vs 4N executors

Same protocol as the KG study, applied to the composed training-data
curation pipeline (profile -> exact dedup -> minhash near-dup ->
quality/lang filter, plans/curation.py) over {report['input_docs']:,}
synthetic documents (~5% exact dups, ~5% near-dups, mixed quality and
language — fixtures.generate_documents_distributed, seed 42):

| cluster | executors x cores | wall (s), best | all runs (s) | throughput (docs/s) |
|---|---|---|---|---|
| N  | {report['N']['executors']} x {EXEC_CORES} = {report['N']['cores']} | {report['N']['wall_sec']} | {report['N'].get('runs')} | {report['N']['docs_per_sec']:,} |
| 4N | {report['4N']['executors']} x {EXEC_CORES} = {report['4N']['cores']} | {report['4N']['wall_sec']} | {report['4N'].get('runs')} | {report['4N']['docs_per_sec']:,} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {report['scaling_efficiency']}**;
host ceiling this run {report['host_ceiling']}, normalized
{report['efficiency_vs_host_ceiling']}.  Curated survivors:
{report['4N']['curated']:,} — identical at both sizes (asserted).

Fixed-term decomposition T(p) = a/p + b from the two points:
parallel work a = {round(a):,} core-s, serial/fixed b = {round(b, 1)} s
(driver job latencies, UDF warmup, lineage bookkeeping — independent of
input size).  At 10x this input the same a/b give a projected
efficiency of {proj}: the gap to 1.0 is the fixed term amortizing, not
a shuffle/skew pathology — the same conclusion the KG study's
multi-scale table reached by direct measurement.
Measured {dt.date.today().isoformat()}.
{SECTION_END}"""


def write_section(report: dict) -> None:
    path = os.path.join(BENCH_DIR, "BASELINE.md")
    section = render_section(report)
    with open(path) as f:
        md = f.read()
    if SECTION_BEGIN in md:
        pre = md.split(SECTION_BEGIN)[0]
        post = md.split(SECTION_END)[1]
        md = pre + section + post
    else:
        md = md.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(md)
    print("updated", path)


def main() -> None:
    ensure_input()
    zpath = build_pyfiles_zip()
    k = int(os.environ.get("M2N_SCALE_RUNS", "1"))
    cal = host_calibration(SIZES["N"] * EXEC_CORES, SIZES["4N"] * EXEC_CORES)
    print("host calibration:", cal)
    r_n = _best_of(SIZES["N"], zpath, k)
    print("N  :", r_n)
    r_4n = _best_of(SIZES["4N"], zpath, k)
    print("4N :", r_4n)
    assert r_n["curated"] == r_4n["curated"], (
        f"curated counts diverge across cluster sizes: "
        f"N={r_n['curated']} 4N={r_4n['curated']}"
    )
    eff = (r_4n["docs_per_sec"] / r_n["docs_per_sec"]) / 4.0
    report = {
        "input_docs": r_n["docs"],
        "N": r_n,
        "4N": r_4n,
        "scaling_efficiency": round(eff, 3),
        "host_ceiling": cal["ceiling"],
        "efficiency_vs_host_ceiling": round(eff / cal["ceiling"], 3),
    }
    print(json.dumps(report))
    with open(os.path.join(BENCH_DIR, "curation_scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    write_section(report)


if __name__ == "__main__":
    main()
