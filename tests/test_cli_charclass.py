"""swish_isw / swish_utf8 CLI analogs (__main__.cmd_isw/cmd_utf8):
A/B the 15 iswctype class reports against the compiled reference
binary when present, and pin the utf8 sequence report shape."""

import os
import re
import subprocess
import sys

import pytest

REF_ISW = "/tmp/refbuild/swish_isw"


def _run(args):
    r = subprocess.run([sys.executable, "-m", "swishray", *args],
                       capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    return r.stdout


def _classes(text):
    """{class_name: 0/1} from a swish_isw-style report."""
    out = {}
    for m in re.finditer(r"(\w+) => (\d)", text):
        out.setdefault(m.group(1), int(m.group(2)))
    return out


@pytest.mark.parametrize("cp", [32, 48, 65, 100, 233, 960, 0x4E2D,
                                0x0A, 0x2028])
def test_isw_matches_reference_binary(cp):
    if not os.path.exists(REF_ISW):
        pytest.skip("reference swish_isw not built "
                    "(tools/build_reference.sh + gcc swish_isw.c)")
    mine = _classes(_run(["isw", str(cp)]))
    env = dict(os.environ, LC_ALL="C.utf8")
    ref = subprocess.run([REF_ISW, str(cp)], capture_output=True,
                         text=True, errors="replace", env=env)
    theirs = _classes(ref.stdout)
    for t in ("alnum", "cntrl", "print", "alpha", "digit", "lower",
              "punct", "upper", "blank", "graph", "space", "xdigit",
              "ideogram", "special", "phonogram"):
        assert mine.get(t) == theirs.get(t), (cp, t, mine, theirs)


def test_utf8_report_shape():
    out = _run(["utf8", "aÉ中"])
    assert "lower:  aé中" in out
    lines = [ln for ln in out.splitlines() if ln.startswith("clen")]
    assert len(lines) == 3
    assert lines[0].startswith("clen = 1 0x61")
    assert lines[1].startswith("clen = 2 0xc3 0x89")
    assert "[0xc9] [201]" in lines[1] and "lower=é" in lines[1]
    assert lines[2].startswith("clen = 3")
    assert "word" in lines[2]


def test_utf8_file_input(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("hé")
    out = _run(["utf8", "-f", str(p)])
    assert "clen = 2 0xc3 0xa9" in out
