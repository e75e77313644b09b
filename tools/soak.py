"""Scale soak: run the most expensive pipelines on a corpus 10-100x
the largest test scale factor, recording what the 100-TB design
claims actually rest on — bounded driver memory, no spill-death, and
wall time that tracks data size, not blowup.

Usage:
  python tools/soak.py [--build-only] [--scale N] [--out DIR]

Builds /tmp/swishray_soak/data (deterministic expansion of
$GRAFT_SF_DIR, default sf0.1):
  * documents x SCALE: replica 0 keeps the original text, replica 1
    is an exact duplicate (so dedup finds real pairs), replicas >= 2
    are salted unique (so near-dup candidate sets don't become
    SCALE-cliques — a synthetic explosion no real corpus has)
  * lineitem / orders / events x SCALE with key offsets

Each pipeline runs in a FRESH subprocess (own ray.init) so driver
RSS and spill attribution are per-pipeline. Results land in
soak_results.json and are summarized for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.environ.get("SOAK_DIR", "/tmp/swishray_soak")
DATA = os.path.join(ROOT, "data")
SCALE = int(os.environ.get("SOAK_SCALE", "20"))

# the five most expensive pipelines by sweep cost; minhash rides
# dedup_cross (sign + LSH + verify on both sides)
PIPELINES = ["dedup_cross", "setsim_pairs", "training_pipeline",
             "revenue_rollup", "pagerank"]


def build_corpus(scale: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DATA, exist_ok=True)
    marker = os.path.join(DATA, f"_built_x{scale}.json")
    if os.path.exists(marker):
        return

    # documents: replica structure documented in the module docstring
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = t.num_rows
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    writer = None
    for k in range(scale):
        if k <= 1:
            tx = text  # replica 1 = exact duplicate of replica 0
        else:
            # interleave a replica-unique token after EVERY word:
            # kills ~all shared word-3-grams (J ~ 0 vs any other
            # replica), so near-dup structure stays realistic —
            # pairs, not 20-cliques (a weaker mutation measurably
            # exploded the candidate count in the first soak run)
            tx = [" ".join(w + f" z{k}q{i}" for i, w in
                           enumerate((s or "").split()))
                  for s in text]
        chunk = pa.table({
            "doc_id": pa.array(doc_id + k * (doc_id.max() + 1),
                               pa.int64()),
            "text": pa.array(tx, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
            "n_chars": pa.array([len(s or "") for s in tx],
                                pa.int64()),
        })
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(DATA, "documents.parquet"), chunk.schema)
        writer.write_table(chunk)
    writer.close()

    def expand(name: str, key_cols: dict[str, int]) -> None:
        src_t = pq.read_table(os.path.join(SRC, name))
        w = None
        offsets = {c: (src_t.column(c).to_numpy().max() + 1)
                   for c in key_cols}
        for k in range(scale):
            cols = {}
            for c in src_t.column_names:
                col = src_t.column(c)
                if c in key_cols:
                    cols[c] = pa.array(col.to_numpy() + k * offsets[c],
                                       col.type)
                else:
                    cols[c] = col
            chunk = pa.table(cols)
            if w is None:
                w = pq.ParquetWriter(os.path.join(DATA, name),
                                     chunk.schema)
            w.write_table(chunk)
        w.close()

    expand("lineitem.parquet", {"l_orderkey": 1})
    expand("orders.parquet", {"o_orderkey": 1})
    expand("events.parquet", {"event_id": 1, "user_id": 1})
    for small in ("region.parquet", "nation.parquet",
                  "customer.parquet", "supplier.parquet",
                  "part.parquet", "embeddings.parquet"):
        src_p = os.path.join(SRC, small)
        if os.path.exists(src_p):
            pq.write_table(pq.read_table(src_p),
                           os.path.join(DATA, small))
    with open(marker, "w") as f:
        json.dump({"scale": scale, "src": SRC}, f)


_CHILD = r"""
import json, os, resource, sys, threading, time
import ray
ray.init(address="local", num_cpus=int(os.environ.get("SOAK_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, os.environ["SOAK_REPO"])
import __ray_entry__ as e
name = sys.argv[1]
data = sys.argv[2]

# sample /proc/self/smaps_rollup: ru_maxrss counts SHARED plasma
# pages the driver merely mmaps (zero-copy block reads); the 100-TB
# "driver holds O(small) state" claim is about PRIVATE memory, so
# attribute the peak to private vs shared.
peak = {"private_mb": 0.0, "shared_mb": 0.0}
def _sample():
    while not peak.get("stop"):
        try:
            priv = shared = 0
            for line in open("/proc/self/smaps_rollup"):
                if line.startswith(("Private_Clean", "Private_Dirty")):
                    priv += int(line.split()[1])
                elif line.startswith(("Shared_Clean", "Shared_Dirty")):
                    shared += int(line.split()[1])
            peak["private_mb"] = max(peak["private_mb"], priv / 1024)
            peak["shared_mb"] = max(peak["shared_mb"], shared / 1024)
        except OSError:
            pass
        time.sleep(0.2)
sampler = threading.Thread(target=_sample, daemon=True)
sampler.start()

t0 = time.perf_counter()
res = e.queries()[name](data)
import ray.data as _rd
n = res.count() if isinstance(res, _rd.Dataset) else len(res)
wall = time.perf_counter() - t0
peak["stop"] = True
rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
# object-store spill: raylet logs its cumulative spilled bytes
spilled_mb = 0.0
sess = ray._private.worker._global_node.get_session_dir_path()
import re
for logname in ("raylet.out", "raylet.err"):
    p = os.path.join(sess, "logs", logname)
    if os.path.exists(p):
        for line in open(p, errors="replace"):
            m = re.search(r"Spilled (\d+) MiB", line)
            if m:
                spilled_mb = max(spilled_mb, float(m.group(1)))
ray.shutdown()
print(json.dumps({"rows": int(n), "wall_s": round(wall, 2),
                  "driver_peak_rss_mb": round(rss_mb, 1),
                  "driver_peak_private_mb": round(peak["private_mb"], 1),
                  "driver_peak_shared_mb": round(peak["shared_mb"], 1),
                  "spilled_mb": spilled_mb}))
"""


def run_soak() -> dict:
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    results = {}
    for name in (only or PIPELINES):
        env = dict(os.environ, SOAK_REPO=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", _CHILD, name, DATA],
                           env=env, capture_output=True, text=True)
        if r.returncode != 0:
            results[name] = {"error": r.stderr.strip()[-800:]}
        else:
            results[name] = json.loads(
                r.stdout.strip().splitlines()[-1])
        results[name]["elapsed_s"] = round(time.time() - t0, 1)
        print(name, results[name], flush=True)
    return results


if __name__ == "__main__":
    if "--scale" in sys.argv:
        SCALE = int(sys.argv[sys.argv.index("--scale") + 1])
    build_corpus(SCALE)
    import pyarrow.parquet as pq
    nd = pq.read_metadata(os.path.join(DATA, "documents.parquet")).num_rows
    print(f"corpus ready: {nd} documents (x{SCALE})", flush=True)
    if "--build-only" in sys.argv:
        sys.exit(0)
    out = run_soak()
    path = os.path.join(ROOT, "soak_results.json")
    with open(path, "w") as f:
        json.dump({"scale": SCALE, "pipelines": out}, f, indent=1)
    print("wrote", path)
