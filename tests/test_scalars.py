"""Scalar function library (string.c / utf8.c / times.c parity).

Unit expectations are frozen from the compiled reference
(tools/scalar_dump.c); when /tmp/refbuild/scalar_dump exists the same
cases re-verify live A/B, plus a randomized escape/unescape sweep.
"""

import os
import random
import subprocess

import pytest

from swishray.text import (date_to_string, double_to_string, escape_utf8,
                           int_to_string, long_to_string, string_to_boolean,
                           string_to_int, time_format, unescape_utf8)

DUMP = "/tmp/refbuild/scalar_dump"


def _ref(*args) -> str:
    env = dict(os.environ, LC_ALL="C.utf8")
    out = subprocess.run([DUMP, *args], env=env, capture_output=True)
    return out.stdout.decode("utf-8", "replace").rstrip("\n")


CASES_ESCAPE = [
    ("café \t tab", "caf\\u00E9 \\t tab"),
    ("a\x1fb\x7fc", "a\\x1Fb\\x7Fc"),
    ("back\\slash \U0001F600", "back\\\\slash \\U0001F600"),
    ("plain ascii", "plain ascii"),
    ("∎ math", "\\u220E math"),
]


def test_escape_utf8_frozen():
    for src, want in CASES_ESCAPE:
        assert escape_utf8(src) == want
        assert unescape_utf8(want) == src


def test_unescape_forms():
    assert unescape_utf8("hello\\u220e") == "hello∎"
    assert unescape_utf8("\\101\\x41\\q") == "AAq"
    assert unescape_utf8("\\n\\t\\a") == "\n\t\a"
    assert unescape_utf8("dangling\\") == "dangling\\"


def test_conversions_frozen():
    assert string_to_int("  -42abc") == -42
    assert string_to_int("junk") == 0
    assert date_to_string(2026, 13, 0) == "20261201"
    assert date_to_string(-5, 0, 99) == "00000131"
    assert int_to_string(-5) == "-5"
    assert long_to_string(1 << 40) == str(1 << 40)
    assert double_to_string(1.5) == "1.500000"
    assert string_to_boolean("true") is False  # reference quirk
    assert string_to_boolean("Yes") is True
    assert string_to_boolean("on") is True
    assert string_to_boolean(None) is False
    assert "1970-01-01" in time_format(0) or "1969-12-31" in time_format(0)


@pytest.mark.skipif(not os.path.exists(DUMP), reason="oracle not built")
def test_scalars_ab_vs_reference():
    for src, _ in CASES_ESCAPE:
        assert escape_utf8(src) == _ref("escape", src)
        assert unescape_utf8(_ref("escape", src)) == src
    rng = random.Random(7)
    ranges = [(32, 126), (0xA0, 0x2FFF), (0x1F300, 0x1F640)]
    for _ in range(50):
        s = "".join(chr(rng.randint(*ranges[rng.randint(0, 2)]))
                    for _ in range(rng.randint(1, 24)))
        assert escape_utf8(s) == _ref("escape", s)
    for args, fn in [((2026, 13, 0), date_to_string), ((-5, 0, 99),
                                                       date_to_string)]:
        assert fn(*args) == _ref("date", *map(str, args))
    for v in ["  -42abc", "junk", "+7", "99x"]:
        assert str(string_to_int(v)) == _ref("int", v)
    for v in ["true", "Yes", "on", "OFF", "1", "0", "x"]:
        assert str(int(string_to_boolean(v))) == _ref("bool", v)
    assert double_to_string(1.5) == _ref("double", "1.5")
    assert time_format(1700000000) == _ref("time", "1700000000")


def test_utf8_codepoint_ops():
    from swishray.text import (utf8_chr_len, utf8_codepoint, utf8_next_chr,
                               utf8_num_chrs, utf8_prev_chr)
    b = "aé€😀z".encode()
    assert utf8_num_chrs(b) == 5
    i = 0
    cps = []
    while i < len(b):
        cps.append(utf8_codepoint(b, i))
        i = utf8_next_chr(b, i)
    assert cps == [ord(c) for c in "aé€😀z"]
    # prev walks back over the same boundaries
    back = []
    j = len(b)
    while j > 0:
        j = utf8_prev_chr(b, j)
        back.append(j)
    assert back[::-1] == [0, 1, 3, 6, 10]
    assert utf8_chr_len(b, 1) == 2 and utf8_chr_len(b, 6) == 4
    import pytest
    with pytest.raises(ValueError):
        utf8_chr_len(b"\xff", 0)


@pytest.mark.skipif(not os.path.exists(DUMP), reason="oracle not built")
def test_utf8_codepoint_ops_ab_vs_reference():
    from swishray.text import utf8_chr_len, utf8_codepoint, utf8_next_chr, \
        utf8_num_chrs
    for s in ["plain", "aé€😀z", "ñandú ∎ 日本語", "x"]:
        b = s.encode()
        out = _ref("cp", s).splitlines()
        assert out[0] == f"num={utf8_num_chrs(b)}"
        mine = []
        i = 0
        while i < len(b):
            mine.append(f"{i} {utf8_chr_len(b, i)} {utf8_codepoint(b, i)}")
            i = utf8_next_chr(b, i)
        assert out[1:] == mine
