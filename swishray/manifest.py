"""Resumable partitioned output with per-partition lineage manifests.

north_rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". Design (SURVEY.md §4 checkpoint row):

  * documents are bucketed by a deterministic url-hash
    (``bucket = crc32(url) % num_buckets``) — the ONE partitioning key
    reused across stages;
  * each bucket writes its own parquet directory ``bucket=NNNN/`` plus
    a ``_manifest.json`` (row count, nwords sum, error count, bytes,
    wall seconds) written atomically AFTER the data files;
  * resume = list completed manifests, filter the input to the missing
    buckets only, run again. A killed run never re-does finished
    buckets and never trusts a bucket without its manifest.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any
from zlib import crc32

import pyarrow as pa
import pyarrow.compute as pc


def add_url_bucket(ds: Any, num_buckets: int, col: str = "url") -> Any:
    def f(batch: pa.Table) -> pa.Table:
        b = [crc32(u.encode()) % num_buckets
             for u in batch.column(col).to_pylist()]
        return batch.append_column("bucket", pa.array(b, type=pa.int32()))
    return ds.map_batches(f, batch_format="pyarrow")


def completed_buckets(out_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("bucket="):
            m = os.path.join(out_dir, name, "_manifest.json")
            if os.path.exists(m):
                done.add(int(name.split("=", 1)[1]))
    return done


def write_partitioned(extracted: Any, out_dir: str, num_buckets: int = 64,
                      resume: bool = True) -> dict:
    """Write extraction output partitioned by url-hash bucket with
    manifests; skips buckets whose manifest already exists.

    Returns a summary dict {written, skipped, rows, errors}.

    Scale note: at cluster scale each bucket is a groupby partition
    and manifests are written by the tasks themselves; in this local
    engine we iterate buckets via ``map_groups`` on the bucket key so
    the write parallelizes per bucket and stays deterministic.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_buckets(out_dir) if resume else set()
    bucketed = add_url_bucket(extracted, num_buckets)
    if done:
        done_arr = sorted(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(
                batch.column("bucket"),
                value_set=pa.array(done_arr, type=pa.int32())))
            return batch.filter(mask)
        bucketed = bucketed.map_batches(drop_done, batch_format="pyarrow")

    import pandas as pd

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        bucket = int(g["bucket"].iloc[0])
        part_dir = os.path.join(out_dir, f"bucket={bucket:04d}")
        tmp_dir = part_dir + ".tmp"
        os.makedirs(tmp_dir, exist_ok=True)
        tbl = pa.Table.from_pandas(g.drop(columns=["bucket"]),
                                   preserve_index=False)
        import pyarrow.parquet as pq
        pq.write_table(tbl, os.path.join(tmp_dir, "part-0.parquet"))
        n_err = int(g["error"].notna().sum()) if "error" in g else 0
        manifest = {
            "bucket": bucket,
            "rows": len(g),
            "errors": n_err,
            "nwords": int(g["nwords"].sum()) if "nwords" in g else None,
            "bytes": int(tbl.nbytes),
            "seconds": round(time.time() - t0, 3),
        }
        # data first, manifest last, rename atomically: a bucket with a
        # manifest is complete by construction
        with open(os.path.join(tmp_dir, "_manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.isdir(part_dir):
            import shutil
            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        return pd.DataFrame({"bucket": [bucket], "rows": [len(g)],
                             "errors": [n_err]})

    stats = bucketed.groupby("bucket").map_groups(
        write_bucket, batch_format="pandas").take_all()
    return {
        "written": len(stats),
        "skipped": len(done),
        "rows": int(sum(s["rows"] for s in stats)),
        "errors": int(sum(s["errors"] for s in stats)),
        "out_dir": out_dir,
    }


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    for b in sorted(completed_buckets(out_dir)):
        with open(os.path.join(out_dir, f"bucket={b:04d}",
                               "_manifest.json")) as f:
            out.append(json.load(f))
    return out
