"""A/B fuzz harness: swishray.tokenizer vs the reference token_dump.

Dev-only; requires tools/build_reference.sh to have produced
/tmp/refbuild/token_dump. Feeds tricky byte buffers + fixture files
through both and diffs (pos, offset, len, value) streams.
"""

import base64
import pathlib
import random
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from swishray.tokenizer import TokenList, tokenize_into  # noqa: E402

TD = "/tmp/refbuild/token_dump"


def ref_tokens(data: bytes):
    out = subprocess.run([TD], input=data, capture_output=True,
                         env={"LC_ALL": "C.utf8", "PATH": "/usr/bin:/bin"}).stdout
    toks = []
    for line in out.decode().splitlines():
        pos, off, ln, val = line.split("\t")
        toks.append((int(pos), int(off), int(ln), base64.b64decode(val)))
    return toks


def my_tokens(data: bytes):
    tl = TokenList()
    tokenize_into(tl, data, "swishdefault", "swishdefault")
    return [(p, o, len(v), v) for p, o, v in
            zip(tl.positions, tl.offsets, tl.values)]


def check(data: bytes, label: str) -> bool:
    # reference reads a NUL-terminated C string; embedded NULs truncate
    data = data.split(b"\x00")[0]
    if not data.isascii():
        try:
            data.decode("utf-8")
        except UnicodeDecodeError:
            return True  # reference croaks on invalid UTF-8; engine never feeds it
    r, m = ref_tokens(data), my_tokens(data)
    if r != m:
        print(f"MISMATCH [{label}] input={data[:120]!r}")
        for i, (a, b) in enumerate(zip(r, m)):
            if a != b:
                print(f"  first diff at {i}: ref={a} mine={b}")
                break
        print(f"  ref n={len(r)} mine n={len(m)}")
        if len(r) != len(m):
            print(f"  ref tail={r[len(m):][:5]} mine tail={m[len(r):][:5]}")
        return False
    return True


CASES = [
    b"foobar", b"++foo++", b"'", b"a'", b"'a", b"x '", b"_", b"__", b"_a_b_",
    b"now is the time, ain't it? or when else might it be!",
    "布朗在迅速跳下懒狐狗".encode(), b"http://FOOBAR.COM/",
    "el zorro marrón rápido saltó sobre el perro perezoso".encode(),
    b"a\x03b", b"\x03\x03x\x03", b"x\x03", b"\x03",
    b"A" * 255, b"A" * 256, b"A" * 257, b"A" * 600, b"A" * 512 + b"!",
    "é".encode() * 130, ("é" * 127 + "e").encode(),
    ("e" * 255 + "é").encode(), ("e" * 255 + "ée").encode(),
    "中".encode() * 100, b"tab\ttab", b"  leading", b"trailing   ",
    "CÀFÉ Straße İstanbul Ǆǅǆ".encode(),
    "αβγ ΑΒΓ".encode(),
    b"e'" * 200, b"don''t", b"a_'_b",
    "é ''a! x".encode(), "é __const x".encode(),
    "é '''ab x".encode(), "é ''''abcdef x".encode(),
    "é _'_'x_'_' x".encode(), "é 'é'é x".encode(),
    "é ''中中 x".encode(), "''ab é".encode(),
    "x ''''''a é".encode(), "é ''a".encode(), "é ''".encode(),
    "é '_'".encode(), "'y0é".encode(), "'y0中".encode(),
]


def main() -> None:
    random.seed(42)
    fails = 0
    for i, c in enumerate(CASES):
        if not check(c, f"case{i}"):
            fails += 1
    # fixture files
    for f in sorted(pathlib.Path("/root/reference/src/test_docs").iterdir()):
        if f.suffix == ".gz" or not f.is_file():
            continue
        data = f.read_bytes()
        if not check(data, f.name):
            fails += 1
    # random fuzz: mixed ascii/punct/unicode
    alphabet = ("abcXYZ09'_-.,;!\x03 \t\né中αİß"
                "\U0001F600’́")
    for i in range(300):
        n = random.randint(0, 80)
        s = "".join(random.choice(alphabet) for _ in range(n))
        if not check(s.encode(), f"fuzz{i}"):
            fails += 1
            if fails > 5:
                break
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
