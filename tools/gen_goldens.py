"""Freeze reference goldens for the conformance suite.

Runs /tmp/refbuild/golden_dump (see tools/build_reference.sh) over the
reference's own test corpus under LC_ALL=C.utf8 — one process per
(document, config) case so auto-vivified config state never leaks
between documents (the engine uses per-document config semantics for
determinism; SURVEY.md §7.5 risk 3) — and writes
tests/goldens/fixtures.jsonl.

Each line: {case, doc, config (inline XML or null), flags,
            golden: <golden_dump record> | null if the reference
            crashed (rc recorded)}.
"""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
FIX = pathlib.Path("/root/reference/src/test_docs")
TC = pathlib.Path("/root/reference/src/test_configs")
OUT = REPO / "tests" / "goldens" / "fixtures.jsonl"

DOCS = [
    "t.html", "meta.html", "words.xml", "words.txt", "properties.html",
    "noindex.html", "html_broken.html", "empty_doc.html", "no_words.html",
    "inline.html", "inline.xml", "badxml.xml", "contractions.xml",
    "min.txt", "foo.txt", "has_nulls.txt", "multi_props.xml",
    "nested_meta.xml", "utf8.html", "utf.xml", "testutf.xml",
    "quickbrown.txt", "diacritic.txt", "utf8-tokens-1.txt",
    "UTF-8-demo.txt", "UTF-8-gzipped.txt.gz", "revelation.txt",
    "xmlns.xml", "latin1.html", "latin1-noencoding.html", "latin1.xml",
    "latin1.txt", "greek_and_ojibwe.txt", "empty.pdf", "UPPERlower.XML",
    "included.xml",
]

CONF_CASES = [
    ("properties.html", "properties.xml", {}),
    ("dom.xml", "dom.conf", {}),
    ("props.xml", "props.conf", {}),
    ("UPPERlower.XML", "UPPERlower.XML", {}),
    ("undeftags.xml", "undeftags-ignore.conf", {}),
    ("undeftags.xml", "undeftags-auto.conf", {}),
    ("undeftags.xml", "undeftags-index.conf", {}),
    ("xmlns.xml", "xmlns.xml", {}),
    ("meta.html", "swish.xml", {}),
    ("properties.html", "swish.xml", {}),
    # engine never follows filesystem XIncludes on its own; goldens
    # pin -X 0 ...
    ("xinclude.xml", None, {"follow_xinclude": False}),
    ("include-recursive.xml", None, {"follow_xinclude": False}),
    # ... and the resolver seam replays the reference's follow
    # semantics exactly ("_resolver" is harness wiring, not a config
    # flag: the test passes a filesystem resolver to the extractor)
    ("xinclude.xml", None, {"_resolver": "fs"}),
    ("include-recursive.xml", None, {"_resolver": "fs"}),
    # cascade_meta_context exercises the flush fan-out
    ("nested_meta.xml", None, {"cascade_meta_context": True}),
    ("dom.xml", "dom.conf", {"cascade_meta_context": True}),
    # tokenize off: buffers only
    ("meta.html", None, {"tokenize": False}),
]


def run_golden(doc: pathlib.Path, conf: pathlib.Path | None,
               flags: dict) -> tuple[dict | None, int]:
    cmd = ["/tmp/refbuild/golden_dump"]
    if conf is not None:
        cmd += ["-c", str(conf)]
    if flags.get("follow_xinclude") is False:
        cmd += ["-X", "0"]
    if flags.get("cascade_meta_context"):
        cmd += ["-C", "1"]
    if flags.get("tokenize") is False:
        cmd += ["-t", "0"]
    cmd.append(str(doc))
    r = subprocess.run(cmd, capture_output=True, env={"LC_ALL": "C.utf8"})
    lines = r.stdout.decode().splitlines()
    if not lines:
        return None, r.returncode
    return json.loads(lines[0]), r.returncode


def main() -> None:
    OUT.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with OUT.open("w") as f:
        cases = [(d, None, {}) for d in DOCS] + [
            (d, c, fl) for d, c, fl in CONF_CASES]
        for doc, conf, flags in cases:
            confpath = TC / conf if conf else None
            g, rc = run_golden(FIX / doc, confpath, flags)
            rec = {
                "case": f"{doc}" + (f"+{conf}" if conf else "")
                        + ("".join(f"+{k}={v}" for k, v in flags.items())),
                "doc": doc,
                "config": confpath.read_text() if confpath else None,
                "flags": flags,
                "rc": rc,
                "golden": g,
            }
            f.write(json.dumps(rec) + "\n")
            n += 1
    print(f"wrote {n} cases to {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
