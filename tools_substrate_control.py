"""Substrate control for the scaling evidence: how does CANONICAL Spark
(not our engine) scale on this box at the same pinned-CPU levels?

Three control jobs per level, each its own taskset-pinned subprocess:
  shuffle   — spark.range(2e8).groupBy(id % 1000).sum()   (shuffle-bound)
  codegen   — spark.range(4e9).select(sum(id*2+1))        (no-shuffle)
  python    — multiprocessing sha256 over fixed chunks    (JVM-free ceiling)

Median of K repeats, all repeats reported. If canonical Spark itself
fails to scale N->4N here, an engine built ON Spark cannot exceed that
ceiling — the honest reading of the north_rule criterion on this sandbox.
Usage: python tools_substrate_control.py [levels=4,16] [repeats=3]
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


def run_single(kind: str, cpus: int) -> float:
    """Returns items/sec for the given control job."""
    if kind == "python":
        import hashlib
        from multiprocessing import Pool

        n_chunks = 256
        payload = [bytes([i % 251]) * 2_000_00 for i in range(n_chunks)]
        t0 = time.time()
        with Pool(cpus) as p:
            p.map(_py_work, payload)
        return n_chunks / (time.time() - t0)

    from lucene_solr_spark.session import get_spark

    spark = get_spark(
        app_name=f"ctl{kind}{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,
    )
    if kind == "shuffle":
        n = 200_000_000
        t0 = time.time()
        spark.range(n).selectExpr("id % 1000 AS k", "id AS v").groupBy(
            "k"
        ).sum("v").collect()
        dt = time.time() - t0
    elif kind == "shuffle_volume":
        # ENGINE-SHAPED control (VERDICT r03 ask #9): the exact tf-shuffle
        # volume of the 500k-doc build the 4v16 number was measured on —
        # 47,787,164 rows of (term string, bucket, doc_id, freq) hash-
        # partitioned by (term, bucket) with ~60k-term × 61-bucket group
        # cardinality. Pure JVM (expr-generated rows, codegen aggregates,
        # scalar collect) — no Python anywhere, so whatever efficiency
        # this job shows at N vs 4N is the SUBSTRATE's shuffle ceiling
        # for the engine's dominant stage, attributable to nothing else.
        n = 47_787_164
        t0 = time.time()
        (
            spark.range(n)
            .selectExpr(
                "concat('t', id % 60000) AS term",
                "id % 61 AS bucket",
                "id AS doc_id",
                "CAST(id % 7 + 1 AS INT) AS freq",
            )
            .groupBy("term", "bucket")
            .agg({"freq": "sum", "doc_id": "max"})
            .selectExpr("sum(`sum(freq)`) AS s", "max(`max(doc_id)`) AS m")
            .collect()
        )
        dt = time.time() - t0
    else:
        n = 4_000_000_000
        t0 = time.time()
        spark.range(n).selectExpr("sum(id % 1000 + 1)").collect()
        dt = time.time() - t0
    spark.stop()
    return n / dt


def _py_work(b: bytes) -> str:
    import hashlib

    d = b""
    for _ in range(200):  # re-hash the full buffer: ~40 MB digested per chunk
        d = hashlib.sha256(b + d).digest()
    return d[:4].hex()


def main() -> None:
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        print("RESULT", run_single(sys.argv[i + 1], int(sys.argv[i + 2])))
        return
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "4,16").split(",")]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out: dict = {"levels": levels, "repeats": repeats, "controls": {}}
    import os
    kinds = os.environ.get("CTL_KINDS", "shuffle,codegen,python").split(",")
    for kind in kinds:
        per_level = {}
        for cpus in levels:
            runs = []
            for _ in range(repeats):
                proc = subprocess.run(
                    ["taskset", "-c", f"0-{cpus-1}", sys.executable,
                     str(REPO / "tools_substrate_control.py"),
                     "x", "x", "--single", kind, str(cpus)],
                    capture_output=True, text=True,
                )
                line = next(
                    (l for l in proc.stdout.splitlines() if l.startswith("RESULT")),
                    None,
                )
                if line is None:
                    sys.stderr.write(proc.stderr[-1500:])
                    raise SystemExit(f"{kind}@{cpus} failed")
                runs.append(float(line.split()[1]))
            runs.sort()
            per_level[cpus] = {"median": runs[len(runs) // 2], "all": runs}
        lo, hi = levels[0], levels[-1]
        eff = per_level[hi]["median"] / (
            (hi / lo) * per_level[lo]["median"]
        )
        out["controls"][kind] = {"eff": round(eff, 3), "levels": per_level}
        print(kind, "eff", round(eff, 3), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
