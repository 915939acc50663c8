"""Decrypt-and-print debug helpers (ref `HE Wrapper/Utils.cs:102-122`
Show/Dump): peek at a flowing encrypted matrix/vector during network
debugging, matching the reference's tab-separated 4-decimal format."""

from __future__ import annotations

import numpy as np


def _rows(m) -> np.ndarray:
    dec = m.decrypt()
    dec = np.atleast_2d(np.asarray(dec, dtype=float))
    return dec


def _row_to_string(row) -> str:
    return "\t".join(f"{x:,.4f}" for x in row)


def show(m) -> None:
    """Decrypt `m` (HEMatrix/HEVector/RawMatrix) and print row per line
    (ref Utils.Show)."""
    for row in _rows(m):
        print(_row_to_string(row))


def dump(file_name: str, m) -> None:
    """Decrypt `m` and write rows to `file_name` (ref Utils.Dump)."""
    with open(file_name, "w") as f:
        for row in _rows(m):
            f.write(_row_to_string(row) + "\n")
