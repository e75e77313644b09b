"""Every pipeline must survive an ALL-EMPTY corpus (the resume-onto-
finished-partition / zero-match-filter degenerate state): no crash,
an empty or degenerate-correct result.

A full 171-query empty sweep runs out-of-band (BASELINE.md); this
test pins the classes that crashed when the contract was introduced:
joins over schema-less empty lineages, the index sink/searcher,
persisted dedup/ANN stores, embedding ops on zero vectors, file
roundtrips that write zero shards, and scalar folds over no rows.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = [
    "extract_totals", "range_filter", "dedup_exact", "hash_join",
    "left_join", "full_outer_join", "asof_join", "semi_join",
    "token_drift", "mad_outliers", "union_harmonized",
    "collocations", "impute_values", "csv_roundtrip",
    "filelist_source", "index_search", "index_upsert", "ann_topk",
    "ann_store", "ivf_topk", "cosine_pairs_ivf", "kmeans_sizes",
    "semdedup", "dedup_store", "dedup_incremental",
    "dedup_canonical", "cap_domains", "link_graph",
    "running_sum_salted", "rank_salted", "training_pipeline",
    "warc_roundtrip", "decode_images", "decode_audio", "decode_video",
    "decode_gif", "decode_webp_lossy", "decode_apng",
]


@pytest.fixture(scope="module")
def empty_sf(ray_session, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(src, f))
            pq.write_table(t.schema.empty_table(), str(dst / f))
    return str(dst)


@pytest.mark.parametrize("name", QUERIES)
def test_query_survives_empty_corpus(empty_sf, name):
    import pandas as pd

    import __ray_entry__ as e

    r = e.queries()[name](empty_sf)
    if isinstance(r, pd.DataFrame):
        n = len(r)
    elif isinstance(r, pa.Table):
        n = r.num_rows
    else:
        n = r.count()
    # scalar-fold queries legitimately return one all-zero row
    assert n <= 1
