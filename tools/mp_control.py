"""No-Ray scaling control: the same per-document extractor under a
plain multiprocessing.Pool at two worker counts.

Purpose (BASELINE.md "Scaling efficiency"): distinguishes the
engine/Ray pipeline's own scaling from this single box's
memory-bandwidth ceiling. If per-core throughput degrades from N to
~4N workers WITHOUT Ray in the picture, the contended-pair efficiency
number is a hardware property, not a pipeline defect — a real 4N-node
cluster runs every node at the uncontended rate.

Usage: python tools/mp_control.py [n_pages] [workers ...]
Prints one JSON line: {workers: {per_core_docs_per_s, docs_per_s}}.
"""

import json
import multiprocessing as mp
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

_EX = None
_DOCS = None


def _init(docs):
    global _EX, _DOCS
    from swishray.config import Config
    from swishray.extractor import DocumentExtractor
    _EX = DocumentExtractor(Config.default())
    _DOCS = docs


def _work(chunk):
    n = 0
    for uri, body in chunk:
        rec = _EX.extract(uri, body)
        n += rec.docinfo.nwords
    return n


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    worker_counts = [int(x) for x in sys.argv[2:]] or [8, 30]

    from swishray.synth import fixture_pages_table
    t = fixture_pages_table(n_pages, skew_big_frac=0.1)
    docs = list(zip(t.column("url").to_pylist(),
                    t.column("html").to_pylist()))
    out = {}
    for w in worker_counts:
        chunks = [docs[i::w * 4] for i in range(w * 4)]
        t0 = time.perf_counter()
        with mp.Pool(w, initializer=_init, initargs=(None,)) as pool:
            total = sum(pool.map(_work, chunks))
        dt = time.perf_counter() - t0
        out[str(w)] = {
            "docs_per_s": round(n_pages / dt, 1),
            "per_core_docs_per_s": round(n_pages / dt / w, 1),
            "total_words": total,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
