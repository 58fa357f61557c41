#!/usr/bin/env python
"""Generate viamd_tpu/components/rama_ref_densities.npz.

Extracts the four canonical Ramachandran reference probability-density
tables (general / glycine / proline / pre-proline, each 180×180 over
φ,ψ ∈ [-180°, 180°)) from the reference's generated data files
(/root/reference/src/components/ramachandran/density_*.inl — Top8000-
derived DATA tables, not code; the same unavoidable-data ruling as
periodic-table constants). Stored as float32 npz; ~500 KB deflated.

Run once at build time; the artifact is checked in so the package is
standalone (the reference checkout is not needed at runtime).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/components/ramachandran")
OUT = Path(__file__).resolve().parent.parent / (
    "viamd_tpu/components/rama_ref_densities.npz"
)

NAMES = {
    "gen": "density_gen.inl",
    "gly": "density_gly.inl",
    "pro": "density_pro.inl",
    "pre": "density_pre.inl",
}


def parse_inl(path: Path) -> np.ndarray:
    text = path.read_text()
    nums = re.findall(r"[-+0-9.eE]+", text.split("=", 1)[1])
    vals = np.array([float(v) for v in nums], np.float64)
    assert vals.size == 180 * 180, (path, vals.size)
    return vals.reshape(180, 180)


def main() -> None:
    tables = {k: parse_inl(REF / v) for k, v in NAMES.items()}
    for k, t in tables.items():
        s = t.sum()
        print(f"{k}: sum={s:.6f} max={t.max():.6f} nonzero={np.count_nonzero(t)}")
        # raw values as consumed by the iso thresholds (max ≈ 1, not
        # sum-normalized — the reference normalizes by den_sum for display)
        assert 0.5 < t.max() <= 1.05 and np.count_nonzero(t) > 5000, k
    np.savez_compressed(
        OUT, **{k: t.astype(np.float32) for k, t in tables.items()}
    )
    print(f"wrote {OUT} ({OUT.stat().st_size/1024:.0f} KB)")


if __name__ == "__main__":
    main()
