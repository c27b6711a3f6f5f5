"""Two-cluster-size scaling evidence for north_rule (N vs 4N executors).

No real cluster exists in this sandbox, so the rule's criterion is
evidenced by running the IDENTICAL index-build job on the IDENTICAL input
at two resource levels and reporting throughput at both plus
``eff = thr(4N) / (4 * thr(N))``.

Resource isolation: each level runs in its own subprocess pinned with
``taskset -c 0-(N-1)`` to EXACTLY N CPUs, with ``local[N]`` task slots and
shuffle partitions sized to the level. Pinning matters: ``local[N]`` alone
only throttles task slots — JVM shuffle/compression/GC threads would still
spill onto the other cores, gifting the small "cluster" extra silicon and
corrupting the ratio. With affinity pinning, an N-CPU run is a faithful
stand-in for an N-executor cluster (every executor bundles its own task,
shuffle, and GC work onto its cores).

Defaults: levels 8 and 32 CPUs (SPARK_GRAFT_SCALE_LEVELS="8,32"), 200k-doc
deterministic synthetic source-code corpus (SPARK_GRAFT_SCALE_DOCS).
Corpus generation is persisted and counted OUTSIDE the timed window; the
timed window is exactly ``build_index`` (tokenize -> postings blocks ->
terms -> norms/docmap -> stats), the north_star metric.

Prints one JSON line; BENCH.md records the results.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

LEVELS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")
]
N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "200000"))
# The sandbox VM has heavy noisy-neighbor variance (same build measured
# 2.2k-6.1k docs/s at 32 CPUs across runs). Throughput CAPABILITY per level
# is therefore taken as the best of K repeats; every repeat is reported.
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
# strong: same input at every level (eff = thr_hi / (ratio * thr_lo)).
# weak: input scales with the level (N_DOCS at LEVELS[0], 4x docs at 4x
# CPUs) — constant work per core, the 10^12-file regime north_star
# describes (bigger cluster <=> bigger corpus). Weak eff = t_lo / t_hi
# (ideal 1.0: wall time constant as both resources and data grow 4x).
MODE = os.environ.get("SPARK_GRAFT_SCALE_MODE", "strong")
# per-level statistic over the K repeats: "best" (capability under noisy
# neighbors) or "median" (robust central tendency — VERDICT r02 ask #6).
# All repeats are reported either way.
STAT = os.environ.get("SPARK_GRAFT_SCALE_STAT", "best")


def run_level(cpus: int, n_docs: int) -> dict:
    from lucene_solr_spark.corpus import synth_corpus
    from lucene_solr_spark.operators.indexer import build_index
    from lucene_solr_spark.session import get_spark

    spark = get_spark(
        app_name=f"scale{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,
    )
    corpus = synth_corpus(spark, n_docs, partitions=cpus * 4).persist()
    n = corpus.count()
    t0 = time.time()
    seg = build_index(spark, corpus, out_dir=None, bucket_docs=8192)
    dt = time.time() - t0
    out = {
        "cpus": cpus,
        "pinned_cpus": len(os.sched_getaffinity(0)),
        "docs": n,
        "secs": round(dt, 2),
        "docs_per_sec": round(n / dt, 1),
        "postings": seg.stats.n_postings,
        "packed_mb": round(seg.stats.packed_bytes / 1e6, 1),
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--single":
        print("RESULT " + json.dumps(run_level(int(sys.argv[2]), int(sys.argv[3]))))
        return
    results = []
    for cpus in LEVELS:
        n_docs = N_DOCS if MODE == "strong" else N_DOCS * cpus // LEVELS[0]
        runs = []
        for _ in range(REPEATS):
            proc = subprocess.run(
                [
                    "taskset", "-c", f"0-{cpus - 1}",
                    sys.executable, str(REPO / "bench_scaling.py"),
                    "--single", str(cpus), str(n_docs),
                ],
                capture_output=True,
                text=True,
                env=os.environ,
            )
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("RESULT ")),
                None,
            )
            if line is None:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
                raise SystemExit(f"level {cpus} failed")
            runs.append(json.loads(line[len("RESULT "):]))
        ranked = sorted(runs, key=lambda r: r["docs_per_sec"])
        pick = (
            ranked[len(ranked) // 2] if STAT == "median" else ranked[-1]
        )
        pick["all_runs_docs_per_sec"] = [r["docs_per_sec"] for r in runs]
        pick["stat"] = STAT
        results.append(pick)
    lo, hi = results[0], results[-1]
    ratio = hi["cpus"] / lo["cpus"]
    if MODE == "strong":
        eff = hi["docs_per_sec"] / (ratio * lo["docs_per_sec"])
        unit = f"strong eff({lo['cpus']}->{hi['cpus']} pinned CPUs, ideal=1.0)"
    else:
        eff = lo["secs"] / hi["secs"]
        unit = (
            f"weak eff({lo['cpus']}->{hi['cpus']} pinned CPUs, "
            f"{lo['docs']}->{hi['docs']} docs, ideal=1.0)"
        )
    print(
        json.dumps(
            {
                "metric": "index_build_scaling_efficiency",
                "value": round(eff, 3),
                "unit": unit,
                "mode": MODE,
                "levels": results,
            }
        )
    )


if __name__ == "__main__":
    main()
