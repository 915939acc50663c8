"""Build the native host runtime: python -m cryptonets_tpu.runtime.build"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(__file__)
SRC = os.path.join(HERE, "hostcrypto.cpp")
OUT = os.path.join(HERE, "libhostcrypto.so")


def build(verbose: bool = True) -> str | None:
    cmd = [
        os.environ.get("CXX", "c++"),
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        SRC,
        "-o",
        OUT,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
        return OUT
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            print(f"native build failed ({e}); using Python fallback",
                  file=sys.stderr)
        return None


if __name__ == "__main__":
    out = build()
    print(out or "build failed")
