"""One-off: time every driver queries() entry at a given SF (default sf0.1).

Not part of the driver contract — a profiling aid. Writes /tmp/qtimes.json
sorted slowest-first. Run AFTER bench.py finishes (idle JVM) to avoid VM
noise.
"""

import json
import sys
import time

import __spark_entry__ as e
from lucene_solr_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark(app_name="qtimes")
qs = e.queries()
times = {}
for name in sorted(qs):
    t0 = time.time()
    try:
        qs[name](spark, SF).collect()
        times[name] = round(time.time() - t0, 3)
    except Exception as ex:  # noqa: BLE001
        times[name] = f"ERR {ex}"
    print(name, times[name], flush=True)

ranked = dict(sorted(times.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 1e9)))
with open("/tmp/qtimes.json", "w") as f:
    json.dump(ranked, f, indent=1)
print(json.dumps(ranked, indent=1))
