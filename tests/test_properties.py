"""Property-based tests (hypothesis) for engine invariants.

The byte-identity oracle lives in test_conformance / the fuzz harness;
these assert structural invariants that must hold for ANY input —
the never-crash contract, token-list consistency, scrub idempotence.
"""

from hypothesis import given, settings, strategies as st

from swishray.extractor import DocumentExtractor
from swishray.text import clean_wsp, scrub_nulls, str_all_ws
from swishray.tokenizer import TokenList, tokenize_into

_ex = DocumentExtractor()


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400),
       st.sampled_from(["a.html", "a.xml", "a.txt", "a", "a.txt.gz"]))
def test_extract_never_raises(body, name):
    rec = _ex.extract(f"https://h.x/{name}", body)
    assert rec.docinfo.nwords >= 0
    assert rec.docinfo.nwords == len(rec.token_positions) or \
        not _ex.config.tokenize


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_tokenlist_invariants(s):
    tl = TokenList()
    tokenize_into(tl, s.encode("utf-8"), "m", "c")
    # parallel columns stay aligned
    n = len(tl.values)
    assert len(tl.positions) == len(tl.offsets) == len(tl.metas) == n
    # positions strictly increase; offsets are the NUL-joined arena
    assert all(b > a for a, b in zip(tl.positions, tl.positions[1:]))
    off = 0
    for v, o in zip(tl.values, tl.offsets):
        assert o == off
        off += len(v) + 1
    # values never exceed the reference's byte cap
    assert all(len(v) <= 256 for v in tl.values)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_scrub_nulls_idempotent(b):
    once = scrub_nulls(b)
    assert scrub_nulls(once) == once
    assert b"\x00" not in once


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_clean_wsp_properties(b):
    c = clean_wsp(b)
    # never starts/ends with ASCII whitespace
    assert not c[:1].strip(b" \t\n\v\f\r") == b"" or c == b""
    if c:
        assert c[0] not in b" \t\n\v\f\r"
        assert c[-1] not in b" \t\n\v\f\r"


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=" \t\n\v\f\r", max_size=50))
def test_all_ws_detects_whitespace(s):
    assert str_all_ws(s.encode())
