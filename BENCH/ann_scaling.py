"""N-vs-4N scaling evidence for the SIMILARITY-SEARCH operators (LSH
top-k, IVF top-k, embedding near-dup clustering), mirroring
BENCH/scaling.py's protocol:

    N  = local-cluster[1, 4, 6144]  (taskset-pinned to 4 cores)
    4N = local-cluster[4, 4, 6144]  (taskset-pinned to 16 cores)

Same spark-submit --py-files job (BENCH/run_ann_job.py), same input,
best-of-k; per-workload result checksums are asserted identical across
cluster sizes.  Results land in BENCH/ann_scaling.json and as a marked
section in BENCH/BASELINE.md (preserved by scaling.py regeneration).

Usage: python BENCH/ann_scaling.py [n_vecs]   (default 1M vectors;
the near-dup corpus is n_vecs/10 planted 4-vector clusters)
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
    bracket_leg,
    build_pyfiles_zip,
    host_calibration,
    require_healthy_window,
    spark_submit_bin,
)

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_DEDUP = max(50_000, N_VECS // 10)
# _f32 suffix versions the cache on the index dtype contract: a stale
# float64-era corpus under the old unsuffixed path would silently
# benchmark the double-width regime (round-6 ADVICE)
INPUT = f"/tmp/m2n_ann_cache/embeddings_{N_VECS}_f32"
DEDUP_INPUT = f"/tmp/m2n_ann_cache/neardup_{N_DEDUP}"

SECTION_BEGIN = "<!-- ANN_SCALING_BEGIN -->"
SECTION_END = "<!-- ANN_SCALING_END -->"


def ensure_input() -> None:
    if os.path.exists(f"{INPUT}/_SUCCESS") and os.path.exists(
        f"{DEDUP_INPUT}/_SUCCESS"
    ):
        return
    from mongo2neo_spark.fixtures import generate_embeddings_distributed
    from mongo2neo_spark.session import get_spark

    spark = get_spark(app_name="m2n-ann-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{INPUT}/_SUCCESS"):
        df = generate_embeddings_distributed(
            spark, N_VECS, seed=7, partitions=256
        )
        df.write.mode("overwrite").parquet(INPUT)
        print("generated", spark.read.parquet(INPUT).count(), "->", INPUT)
    if not os.path.exists(f"{DEDUP_INPUT}/_SUCCESS"):
        # planted near-dup regime: tiny 4-vector clusters at cosine ~0.99
        dd = generate_embeddings_distributed(
            spark, N_DEDUP, seed=11, n_clusters=max(1, N_DEDUP // 4),
            noise=0.02, partitions=128,
        )
        dd.write.mode("overwrite").parquet(DEDUP_INPUT)
        print("generated", spark.read.parquet(DEDUP_INPUT).count(),
              "->", DEDUP_INPUT)
    spark.stop()


def run_at(n_execs: int, zpath: str) -> dict:
    cores = n_execs * EXEC_CORES
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
        os.path.join(REPO, "BENCH", "run_ann_job.py"),
        "--input", INPUT, "--dedup-input", DEDUP_INPUT,
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
        f"{n_execs}-executor ANN run produced no RESULT:\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )


def _best_of(n_execs: int, zpath: str, k: int) -> dict:
    runs = [run_at(n_execs, zpath) for _ in range(k)]
    for r in runs:
        print(f"  run @{n_execs} execs:", r)
    best = max(runs, key=lambda r: r["vecs_per_sec"])
    best["runs"] = [r["wall_sec"] for r in runs]
    return best


def render_section(report: dict) -> str:
    rn, r4 = report["N"], report["4N"]
    rows = "\n".join(
        f"| {w} | {rn['walls'][w]} | {r4['walls'][w]} | "
        f"{round(rn['walls'][w] / (4 * r4['walls'][w]), 3)} |"
        for w in rn["walls"]
    )
    # two-point fixed-term decomposition, as in the curation study
    wn, w4 = rn["wall_sec"], r4["wall_sec"]
    cn, c4 = rn["cores"], r4["cores"]
    a = (wn - w4) / (1.0 / cn - 1.0 / c4)
    b = wn - a / cn
    proj = round((10 * a / cn + b) / (4 * (10 * a / c4 + b)), 3)
    return f"""{SECTION_BEGIN}
## Similarity search (ANN + embedding dedup) — N vs 4N executors

Same protocol as the KG/curation studies, over {report['input_vecs']:,}
synthetic 32-dim embeddings clustered around 64 centroids
(fixtures.generate_embeddings_distributed, seed 7), in the
build-once/probe-many service shape: lsh_build/ivf_build hash the
corpus ONCE into persisted key-sorted index tables (round 5: one-pass
hash-partition+sort writers); lsh_probe/ivf_probe serve 3 independent
64-query batches FUSED into one probe job per family (round 5 — one
key-pruned scan + one broadcast join + JVM cosine; per-batch checksums
recovered by groupBy, bit-identical to the separate-jobs values).
Embedding near-dup clustering runs on its own
{report['N']['dedup_vecs']:,}-vector planted-duplicate corpus
(4-vector clusters at cosine ~0.99, {report['N']['dedup_planes']}
planes/table = log2(n/32) so unrelated-vector bucket co-residence stays
linear).  Result checksums (every probe batch + index row counts)
asserted identical at both sizes.

| workload | N wall (s) | 4N wall (s) | per-workload efficiency |
|---|---|---|---|
{rows}

Totals (best interleaved pair): N {rn['wall_sec']}s
({rn['vecs_per_sec']:,} vecs/s), 4N {r4['wall_sec']}s
({r4['vecs_per_sec']:,} vecs/s) — **scaling efficiency
{report['scaling_efficiency']}** (host ceiling this run
{report['host_ceiling']}, normalized
{report['efficiency_vs_host_ceiling']}).  Per-pair efficiencies:
{report.get('pair_efficiencies')} (drift-corrected by per-leg
16-core host-speed brackets:
{report.get('pair_efficiencies_drift_corrected')}).

Per-leg host telemetry (16-core calibration wall pre/post each leg,
healthy ~3.0s, + /proc/stat deltas over the leg): N
{rn.get('leg_cal16')} cpu {rn.get('leg_cpu')}; 4N
{r4.get('leg_cal16')} cpu {r4.get('leg_cpu')}.

Two-point decomposition at THIS corpus size, T(p) = a/p + b:
parallel work a = {round(a):,} core-s, non-scaling share b = {round(b, 1)} s
(if b were a size-independent fixed cost, 10x the corpus would project
{proj} — but see the cross-size notes below before trusting that).
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
    # a killed run leaks its /dev/shm index dir (the job only cleans up
    # on success) — sweep stale ones so repeated studies don't bloat
    # tmpfs and skew page-cache behavior between legs
    import glob
    import shutil

    for d in glob.glob("/dev/shm/m2n_ann_idx_*"):
        shutil.rmtree(d, ignore_errors=True)
    ensure_input()
    zpath = build_pyfiles_zip()
    # This VM's hardware scaling ceiling drifts +-30% minute-to-minute
    # (idle calibration measured 0.672..1.014 within one hour), so a
    # plain N-then-4N sequence confounds engine scaling with host
    # drift.  Run INTERLEAVED (N, 4N) pairs instead — each pair spans
    # the smallest possible drift window — compute per-pair efficiency,
    # and report the best pair alongside every pair's number.
    k = int(os.environ.get("M2N_SCALE_RUNS", "1"))
    # refuse to burn a campaign on a degraded host window (round-6
    # gatekeeper); a second calibration after the pairs makes mid-run
    # degradation visible instead of inferred
    cal = require_healthy_window(
        SIZES["N"] * EXEC_CORES, SIZES["4N"] * EXEC_CORES, tag="ann"
    )
    print("host calibration (pre):", cal)
    pairs = []
    # leg ORDER and inter-leg cooldown: a round-6 diagnostic measured
    # the same 4N job's lsh_build at 284s immediately after an 8-minute
    # N leg but 61s in isolation minutes later (identical code, input,
    # checksums) — sustained load provokes host throttling that lands
    # on whichever leg runs SECOND.  Running 4N first and idling
    # between legs keeps the throttle from masquerading as an engine
    # scaling defect; the pair still spans the smallest drift window.
    order_4n_first = os.environ.get("M2N_PAIR_ORDER", "4N_first") == "4N_first"
    cooldown = int(os.environ.get("M2N_LEG_COOLDOWN", "60"))
    import time as _time

    for i in range(k):
        # every leg bracketed by 16-core host-speed samples +
        # /proc/stat deltas (round-6 attempt #4: a 0.917 pre-gate
        # window still throttled the 4N legs mid-campaign; brackets
        # make that a per-leg measurement, not an inference)
        if order_4n_first:
            r_4n = bracket_leg(lambda: run_at(SIZES["4N"], zpath))
            print(f"  pair {i} 4N:", r_4n, flush=True)
            _time.sleep(cooldown)
            r_n = bracket_leg(lambda: run_at(SIZES["N"], zpath))
            print(f"  pair {i} N :", r_n, flush=True)
        else:
            r_n = bracket_leg(lambda: run_at(SIZES["N"], zpath))
            print(f"  pair {i} N :", r_n, flush=True)
            _time.sleep(cooldown)
            r_4n = bracket_leg(lambda: run_at(SIZES["4N"], zpath))
            print(f"  pair {i} 4N:", r_4n, flush=True)
        if i < k - 1:
            _time.sleep(cooldown)
        assert r_n["checks"] == r_4n["checks"], (
            f"ANN results diverge across cluster sizes: "
            f"N={r_n['checks']} 4N={r_4n['checks']}"
        )
        eff = (r_4n["vecs_per_sec"] / r_n["vecs_per_sec"]) / 4.0
        # drift correction: each leg's wall scales with the host speed
        # its own brackets measured; the reference speed cancels, so
        # eff_dc = eff_raw * (cal16 during 4N leg / cal16 during N leg)
        cal_n = sum(r_n["leg_cal16"].values()) / 2.0
        cal_4n = sum(r_4n["leg_cal16"].values()) / 2.0
        eff_dc = eff * (cal_4n / cal_n)
        pairs.append({"N": r_n, "4N": r_4n, "eff": round(eff, 3),
                      "eff_drift_corrected": round(eff_dc, 3)})
        print(f"  pair {i} eff: {round(eff, 3)} "
              f"(drift-corrected {round(eff_dc, 3)})", flush=True)
    best = max(pairs, key=lambda p: p["eff"])
    r_n, r_4n, eff = best["N"], best["4N"], best["eff"]
    cal_post = host_calibration(
        SIZES["N"] * EXEC_CORES, SIZES["4N"] * EXEC_CORES
    )
    print("host calibration (post):", cal_post)
    report = {
        "input_vecs": r_n["vecs"],
        "N": r_n,
        "4N": r_4n,
        "scaling_efficiency": eff,
        "pair_efficiencies": [p["eff"] for p in pairs],
        "pair_efficiencies_drift_corrected": [
            p["eff_drift_corrected"] for p in pairs
        ],
        "host_ceiling": cal["ceiling"],
        "host_ceiling_post": cal_post["ceiling"],
        "efficiency_vs_host_ceiling": round(eff / cal["ceiling"], 3),
    }
    print(json.dumps(report))
    with open(os.path.join(BENCH_DIR, "ann_scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    write_section(report)


if __name__ == "__main__":
    main()
