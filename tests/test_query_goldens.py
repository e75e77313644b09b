"""Frozen-row goldens for the rows-only queries (no SQL-expressible
oracle): simhash_pairs, cosine_pairs_ivf, ivf_topk. The sf0.01
expected rows are committed fixtures (tests/goldens/
query_rows_sf0.01.json) so regressions are caught even without a
DuckDB oracle. Determinism was verified by back-to-back regeneration
in fresh Ray sessions (md5-identical row dumps).

simhash_pairs golden history: regenerated when simhash_near_dups
moved to the generic hamming_near_dups banding — the old fixed
4x16-bit blocking was only complete for distance <= 3, so at the
query's max_hamming=8 it missed 268 of 500 true pairs; the new
16x4-bit blocking is complete for <= 15 and the old row set is a
strict subset of the new one (recall-only change)."""

import json
import os
import pathlib

import pytest

_GOLDEN = pathlib.Path(__file__).parent / "goldens" / \
    "query_rows_sf0.01.json"
_SF = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(_SF), reason="needs driver testdata")
@pytest.mark.parametrize("name",
                         ["simhash_pairs", "cosine_pairs_ivf",
                          "ivf_topk", "compression_stats",
                          "cm_topk", "bpe_tokens",
                          "kmeans_sizes", "semdedup"])
def test_rows_only_query_golden(ray_session, name):
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import __ray_entry__ as e

    want = json.loads(_GOLDEN.read_text())[name]
    rows = e.queries()[name](_SF).take_all()
    cols = want["columns"]
    assert sorted(rows[0].keys()) == cols
    got = sorted([r[c] for c in cols] for r in rows)
    assert got == sorted(want["rows"]), f"{name}: rows drifted"
