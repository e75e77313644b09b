"""Optional native accelerator (import-try gated, per task brief).

On first import, tries to load a prebuilt ``swishtok`` extension from
this directory; if absent and a C compiler is available, compiles it
quietly (atomic rename, safe under concurrent workers). Any failure
leaves ``swishtok = None`` and the pure-Python tokenizer runs — the
two implementations are A/B-verified identical by
tools/fuzz_tokenizer.py and the conformance suite.

Set SWISHRAY_NO_NATIVE=1 to force the pure-Python path.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

swishtok = None

_HERE = os.path.dirname(os.path.abspath(__file__))


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, "swishtok" + suffix)


def _try_build() -> bool:
    src = os.path.join(_HERE, "swishtok.c")
    out = _so_path()
    if not os.path.exists(src):
        return False
    include = sysconfig.get_paths()["include"]
    tmp = out + f".tmp.{os.getpid()}"
    cmd = ["gcc", "-O2", "-shared", "-fPIC", f"-I{include}", src, "-o", tmp]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            return False
        os.replace(tmp, out)  # atomic; concurrent builders race safely
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load():
    global swishtok
    if os.environ.get("SWISHRAY_NO_NATIVE") == "1":
        return
    try:
        if not os.path.exists(_so_path()):
            if not _try_build():
                return
        if _HERE not in sys.path:
            sys.path.insert(0, _HERE)
        import swishtok as _m  # noqa: F401
        swishtok = _m
    except Exception:
        swishtok = None


_load()
