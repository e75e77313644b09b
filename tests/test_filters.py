"""C4 / Gopher corpus filters (ops/filters.py).  The closed-form
roundtrips are also oracle-checked by the c4_clean / gopher_quality
queries() entries."""
import pyarrow as pa
import ray.data as rd

from swishray.ops.filters import c4_clean, gopher_quality

GOOD = ("This is a good long sentence that ends with punctuation "
        "marks today.")


def _c4(rows, **kw):
    ds = rd.from_items([{"k": i, "text": t}
                        for i, t in enumerate(rows)]).repartition(2)
    return c4_clean(ds, col="text", key="k", **kw).to_pandas() \
        .sort_values("k").reset_index(drop=True)


def test_c4_line_rules(ray_session):
    df = _c4(["\n".join([GOOD, "too short", GOOD, GOOD])])
    assert df.loc[0, "doc_kept"]
    assert df.loc[0, "clean_text"] == "\n".join([GOOD, GOOD, GOOD])
    assert df.loc[0, "n_lines_kept"] == 3
    assert df.loc[0, "n_lines_dropped"] == 1


def test_c4_terminal_punctuation_required(ray_session):
    noend = "This line has plenty of words but no terminal mark"
    df = _c4(["\n".join([GOOD, noend, GOOD, GOOD])])
    assert noend not in df.loc[0, "clean_text"]


def test_c4_javascript_and_min_lines(ray_session):
    js = "Please enable javascript to view this content properly."
    df = _c4(["\n".join([GOOD, js, GOOD])])  # only 2 survivors
    assert not df.loc[0, "doc_kept"]
    assert df.loc[0, "clean_text"] == ""
    assert df.loc[0, "n_lines_kept"] == 2


def test_c4_banned_substrings(ray_session):
    for bad in ("some Lorem Ipsum filler", "code with { braces }"):
        df = _c4(["\n".join([GOOD, GOOD, GOOD, bad])])
        assert not df.loc[0, "doc_kept"]


def test_c4_null_and_empty(ray_session):
    df = _c4([None, ""])
    assert list(df["doc_kept"]) == [False, False]
    assert list(df["clean_text"]) == ["", ""]


def test_gopher_rules(ray_session):
    ok = " ".join(["fine"] * 60)
    short = "only these words"
    symbols = " ".join(["####"] * 30 + ["word"] * 30)
    longwords = " ".join(["x" * 40] * 60)
    ds = rd.from_items([
        {"k": 0, "text": ok}, {"k": 1, "text": short},
        {"k": 2, "text": symbols}, {"k": 3, "text": longwords},
    ]).repartition(2)
    df = gopher_quality(ds, col="text", key="k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(df["keep"]) == [True, False, False, False]
    assert df.loc[1, "n_words"] == 3
    assert df.loc[3, "mean_word_len"] == 40.0


def test_gopher_bullet_and_ellipsis_lines(ray_session):
    bullets = "\n".join(["- item %d with several words here." % i
                         for i in range(10)] +
                        [" ".join(["pad"] * 60) + "."])
    ell = "\n".join([" ".join(["word"] * 30) + "..."] * 10)
    ds = rd.from_items([{"k": 0, "text": bullets},
                        {"k": 1, "text": ell}]).repartition(1)
    df = gopher_quality(ds, col="text", key="k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert df.loc[0, "bullet_frac"] > 0.9
    assert not df.loc[0, "keep"]
    assert df.loc[1, "ellipsis_frac"] == 1.0
    assert not df.loc[1, "keep"]
