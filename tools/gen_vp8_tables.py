#!/usr/bin/env python3
"""Generate swishray/ops/_vp8_data.py — the RFC 6386 constant tables.

The VP8 bitstream's entropy tables (default coefficient probabilities
RFC 6386 §13.4, probability-update probabilities §13.5, keyframe
B-mode probabilities §11.4, quantizer lookups §14.1) are normative
spec constants. Rather than hand-transcribing ~3,000 table entries
(one typo = undebuggable bitstream desync), this probe extracts them
from the container's libwebp shared object — the same pattern as
tools/gen_uniprops (glibc towlower parity) and the Apache MIME table:
the table IS the spec, and the system library is its authoritative
local copy.

Each table is located by an independently-known anchor (rows quoted
in RFC 6386) and validated structurally (no zero probabilities,
expected all-128 / all-255 filler groups, adjacency of the constant
cluster). A wrong offset fails loudly here, not at decode time.
"""

from __future__ import annotations

import ctypes.util
import sys

import numpy as np

OUT = "swishray/ops/_vp8_data.py"


def _find(data: bytes, pat: bytes, what: str) -> int:
    i = data.find(pat)
    if i < 0:
        raise SystemExit(f"anchor for {what} not found in libwebp")
    return i


def main() -> None:
    lib = ctypes.util.find_library("webp")
    if lib is None:
        raise SystemExit("libwebp not found")
    # find_library returns a soname; resolve via the loader's view
    import ctypes as C
    cdll = C.CDLL(lib)
    import os
    # read the mapped file path from /proc/self/maps
    path = None
    with open("/proc/self/maps") as f:
        for line in f:
            if "libwebp" in line:
                path = line.split()[-1]
                break
    if path is None or not os.path.exists(path):
        raise SystemExit("could not resolve libwebp file path")
    data = open(path, "rb").read()

    # --- default coefficient probs (§13.4): anchored by the type-0
    # band-1 ctx-0 row quoted in the RFC; the table starts one all-128
    # ctx-group (33 bytes) earlier (type-0 band-0 is unused filler).
    a = _find(data, bytes([253, 136, 254, 255, 228, 219, 128, 128,
                           128, 128, 128]), "coeff probs")
    coeff = np.frombuffer(data[a - 33:a - 33 + 1056],
                          np.uint8).reshape(4, 8, 3, 11)
    assert (coeff[0, 0] == 128).all(), "type0/band0 filler missing"
    assert (coeff != 0).all(), "zero probability in coeff table"
    assert coeff[1, 0, 0].tolist() == [198, 35, 237, 223, 193, 187,
                                       162, 160, 145, 155, 62]
    assert coeff[3, 0, 0].tolist() == [202, 24, 213, 235, 186, 191,
                                       220, 160, 240, 175, 255]

    # --- probability-update probs (§13.5): the 1056-byte mostly-255
    # table ends exactly where the B-mode table begins; anchor by its
    # type-0 band-1 ctx-0 row (RFC) and the preceding coeff-band map.
    u = _find(data, bytes([176, 246, 255, 255, 255, 255, 255, 255,
                           255, 255, 255]), "update probs")
    upd = np.frombuffer(data[u - 33:u - 33 + 1056],
                        np.uint8).reshape(4, 8, 3, 11)
    assert (upd[0, 0] == 255).all(), "type0/band0 255-filler missing"
    assert (upd != 0).all()
    bands_off = u - 33 - 32
    bands = list(data[bands_off:bands_off + 17])
    assert bands == [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7,
                     0], f"coeff band map mismatch: {bands}"

    # --- keyframe B-mode probs (§11.4): 10x10x9, anchored by [0][0].
    # libwebp's B-mode enum permutes the RFC's numbering (its
    # RD/VR/LD = 4/5/6 vs the RFC's LD/RD/VR = 4/5/6; 0-3 and 7-9
    # agree), and the [above][left] table is indexed by that enum.
    # The tree's POSITIONAL leaf order (DC,TM,VE,HE,RD,VR,LD,VL,HD,
    # HU) is identical in both, so only the context indices need
    # remapping to the RFC numbering the decoder uses.
    b = _find(data, bytes([231, 120, 48, 89, 115, 113, 120, 152,
                           112]), "bmode probs")
    raw = np.frombuffer(data[b:b + 900], np.uint8).reshape(10, 10, 9)
    perm = np.array([0, 1, 2, 3, 6, 4, 5, 7, 8, 9])  # rfc -> libwebp
    bmode = raw[np.ix_(perm, perm)]
    assert (bmode != 0).all()

    # --- quantizer lookups (§14.1): AC as uint16[128] (values reach
    # 284), DC as uint8[128]; stored adjacently (AC then DC).
    q = _find(data, b"".join(v.to_bytes(2, "little")
                             for v in range(4, 20)), "ac qlookup")
    ac_q = np.frombuffer(data[q:q + 256], "<u2").astype(np.int32)
    dc_q = np.frombuffer(data[q + 256:q + 256 + 128],
                         np.uint8).astype(np.int32)
    assert ac_q[-1] == 284 and ac_q[55] == 60, ac_q[[55, -1]]
    assert dc_q[0] == 4 and dc_q[-1] == 157 and dc_q[7] == 10

    def fmt(name: str, arr: np.ndarray) -> str:
        flat = ", ".join(str(int(v)) for v in arr.reshape(-1))
        return (f"{name} = _np.array([{flat}], _np.int32)"
                f".reshape{arr.shape}\n")

    with open(OUT, "w") as f:
        f.write('"""GENERATED by tools/gen_vp8_tables.py — RFC 6386\n'
                "normative constant tables (coefficient probabilities\n"
                "§13.4, update probabilities §13.5, keyframe B-mode\n"
                "probabilities §11.4, quantizer lookups §14.1),\n"
                "extracted from the container's libwebp (anchored and\n"
                "validated against rows quoted in the RFC). Do not\n"
                'edit by hand."""\n\n'
                "import numpy as _np\n\n")
        f.write(fmt("COEFF_PROBS", coeff))
        f.write(fmt("UPDATE_PROBS", upd))
        f.write(fmt("KF_BMODE_PROBS", bmode))
        f.write(fmt("DC_QLOOKUP", dc_q))
        f.write(fmt("AC_QLOOKUP", ac_q))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
