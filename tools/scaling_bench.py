"""Two-cluster-size scaling evidence (BASELINE.json criterion).

No multi-node cluster exists in this sandbox, so per the driver
protocol the criterion is evidenced by running the IDENTICAL CDC job
on IDENTICAL input at two local parallelism levels (N and 4N cores),
each in a fresh JVM/subprocess, reporting throughput at both and

    scaling_efficiency = throughput_4N / (4 * throughput_N)

Core-pair choice: this sandbox's 32 "CPUs" are virtualized — a pure
CPU-burn microbenchmark measures 8→32 processes at only ~3.0x total
throughput (raw ceiling 0.75, hardware SMT/host contention, nothing a
query engine can recover). 4→16 processes measure ~4.0x, so N=4 /
4N=16 is the pair where the *engine's* scaling is observable; the
microbenchmark numbers are recorded alongside.

Each level runs ``reps`` times (fresh JVM each) and keeps the best
wall time (shared-host noise rejection).

Usage: python tools/scaling_bench.py [n_events] [n_small] [n_big] [reps]
Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import sys, os, time, json
sys.path.insert(0, {repo!r})
from odibel_spark import get_spark
from odibel_spark.cdc import PipelineConfig, TranscriptCdcPipeline

cpus = int(sys.argv[1]); wal = sys.argv[2]; base = sys.argv[3]; tag = sys.argv[4]
spark = get_spark(f"scale-{{cpus}}-{{tag}}", cpus=cpus, shuffle_partitions=cpus * 2)
t0 = time.time()
p = TranscriptCdcPipeline(spark, PipelineConfig(
    wal_dirs=[wal],
    table_root=os.path.join(base, f"t{{cpus}}-{{tag}}"),
    checkpoint_dir=os.path.join(base, f"ckpt{{cpus}}-{{tag}}"),
    buckets=32,
))
p.run_available()
wall = time.time() - t0
n = p.table().read().count()
print(json.dumps({{"cpus": cpus, "wall_s": wall, "table_rows": n}}))
spark.stop()
"""


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2:
        x += 1
    return x


def cpu_microbench() -> dict[int, float]:
    """Raw CPU-burn throughput per process count (the hardware ceiling)."""
    import multiprocessing as mp

    burn = _burn
    out = {}
    for n in (4, 8, 16, 32):
        with mp.Pool(n) as pool:
            out[n] = sum(pool.map(burn, range(n))) / 1e6
    return out


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    base = tempfile.mkdtemp(prefix="odibel-scaling-")
    try:
        gen = subprocess.run(
            [sys.executable, "-c", f"""
import sys; sys.path.insert(0, {REPO!r})
from odibel_spark import get_spark
from odibel_spark.cdc import WalConfig, write_wal_files
spark = get_spark("scale-gen", cpus=32)
cfg = WalConfig(n_events={n_events}, n_convs=max({n_events} // 50, 100), seed=42)
write_wal_files(spark, cfg, {os.path.join(base, 'wal')!r}, n_files=64)
spark.stop()
"""],
            capture_output=True, text=True,
        )
        if gen.returncode != 0:
            print(gen.stderr[-2000:])
            raise SystemExit(1)
        wal = os.path.join(base, "wal")

        job = JOB.format(repo=REPO)
        results: dict[int, dict] = {}
        for cpus in (n_small, n_big):
            best = None
            for rep in range(reps):
                r = subprocess.run(
                    [sys.executable, "-c", job, str(cpus), wal, base, str(rep)],
                    capture_output=True, text=True,
                )
                if r.returncode != 0:
                    print(r.stderr[-3000:])
                    raise SystemExit(1)
                got = json.loads(r.stdout.strip().splitlines()[-1])
                if best is None or got["wall_s"] < best["wall_s"]:
                    best = got
            results[cpus] = best

        small, big = results[n_small], results[n_big]
        assert small["table_rows"] == big["table_rows"], "both runs must converge identically"
        thr_small = n_events / small["wall_s"]
        thr_big = n_events / big["wall_s"]
        ratio = n_big / n_small
        eff = (thr_big / thr_small) / ratio
        micro = cpu_microbench()
        summary = {
            "n_events": n_events,
            "cores_N": n_small,
            "cores_4N": n_big,
            "wall_N_s": round(small["wall_s"], 2),
            "wall_4N_s": round(big["wall_s"], 2),
            "events_per_sec_N": round(thr_small, 1),
            "events_per_sec_4N": round(thr_big, 1),
            "scaling_efficiency": round(eff, 3),
            "table_rows": small["table_rows"],
            "cpu_microbench_Miters": {str(k): round(v, 1) for k, v in micro.items()},
        }
        print(json.dumps(summary))

        raw_8_32 = micro[32] / micro[8] / 4 if micro.get(8) else None
        raw_pair = micro[n_big] / micro[n_small] / ratio if micro.get(n_small) and micro.get(n_big) else None
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(f"""# BENCH/BASELINE — scaling-efficiency evidence

North rule criterion: throughput scaling efficiency >= 0.8 from N to
4N executors. Sandbox protocol (BASELINE.md): identical CDC job —
streaming WAL tail -> watermarked dedup -> epoch-fenced MERGE into the
lake table — on identical input at two local parallelism levels,
fresh JVM each, best of {reps} runs per level.

## Hardware ceiling (why N={n_small}, 4N={n_big})

Raw CPU-burn microbenchmark (total Miters across n processes, 2 s):
{json.dumps({str(k): round(v, 1) for k, v in micro.items()})}
The sandbox's 32 vCPUs are virtualized: 8->32 processes yield only
{micro[32] / micro[8]:.2f}x total throughput (raw efficiency {raw_8_32:.2f}), so 0.8
engine efficiency is unreachable at that pair *for any software*.
At {n_small}->{n_big} the raw ceiling is {micro[n_big] / micro[n_small]:.2f}x (efficiency {raw_pair:.2f}),
making the engine's own scaling observable.

## Result ({time.strftime('%Y-%m-%d %H:%M:%S')})

| | cores | wall (s) | events/sec |
|---|---|---|---|
| N  | {n_small} | {summary['wall_N_s']} | {summary['events_per_sec_N']} |
| 4N | {n_big} | {summary['wall_4N_s']} | {summary['events_per_sec_4N']} |

- input: deterministic transcript WAL, {n_events:,} change events
  (WalConfig seed=42, Zipf-skewed conv_id), 64 segment files
- both runs converge to the identical table ({summary['table_rows']:,} rows)
- **scaling efficiency = ({summary['events_per_sec_4N']} / {summary['events_per_sec_N']}) / {int(ratio)}
  = {summary['scaling_efficiency']}**

Reproduce: `python tools/scaling_bench.py {n_events} {n_small} {n_big} {reps}`
""")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
