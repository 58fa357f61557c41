"""Value model for the script compiler.

Mirrors md_script's type system (reconstructed in SURVEY.md §2.3: int, float,
int-range, float-range, bitfield, string, up-to-dim[4] arrays, units,
structure contexts) split into the two phases of this compiler:

- StaticValue: host-resident, frame-independent — numbers, strings, ranges,
  and Selections (bitfield + structure decomposition). Computed once at
  compile time.
- DynValue: a traced jnp array (per-frame), with unit + property-kind
  metadata. Produced inside frame_fn.
- AccumSpec: distribution/volume accumulator contributions (rdf/sdf) — the
  per-frame value is an array the engine sums over frames and psums over
  shards, with normalization metadata attached.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from viamd_tpu.core.bitfield import Bitfield


@dataclass
class Selection:
    """A static atom selection with structure decomposition.

    `structures` is the list of per-structure atom index arrays (int32,
    global indices). A plain atom-set selection (element('C')) has a single
    structure covering all selected atoms; residue/chain-level selections
    (resname, residue, chain) have one structure per matched residue/chain —
    the granularity that `in` contexts and subscripts operate on.
    """

    mask: Bitfield
    structures: list  # list[np.ndarray]
    level: str = "atom"  # 'atom' | 'residue' | 'chain' | 'system'
    dynamic: bool = False  # contains within/positional predicates
    # Per-frame mask recomputation for dynamic selections: a traced
    # (x, basis, inv_basis) -> (n,) bool function built at compile time.
    # Present when the dynamic predicate supports on-device re-evaluation
    # (within with a static target, x/y/z ranges, boolean combinations);
    # consumers that can take dense per-frame weights (count/com/rdf/
    # distance_min/max) use it, mirroring the reference's is_dynamic
    # re-evaluation (viamd.cpp:1510). The static `mask` stays the
    # reference-frame evaluation for structure decomposition.
    mask_fn: Optional[Any] = None

    @property
    def n_structures(self) -> int:
        return len(self.structures)

    def single(self) -> "Selection":
        """Collapse to a single flat structure."""
        return Selection(self.mask, [self.mask.indices()], "atom",
                         self.dynamic, self.mask_fn)

    def packed(self, masses: Optional[np.ndarray] = None):
        """(S, K) padded idx + weight arrays for vmapped per-structure ops."""
        S = len(self.structures)
        K = max((len(s) for s in self.structures), default=1) or 1
        idx = np.zeros((S, K), np.int32)
        w = np.zeros((S, K), np.float32)
        for i, s in enumerate(self.structures):
            idx[i, : len(s)] = s
            w[i, : len(s)] = masses[s] if masses is not None else 1.0
        return idx, w


@dataclass
class IRange:
    """1-based inclusive integer range literal (resid(2:8), s[2:8])."""

    beg: Optional[int]
    end: Optional[int]


@dataclass
class FRange:
    beg: Optional[float]
    end: Optional[float]


@dataclass
class DynValue:
    """A traced per-frame value: jnp array + metadata."""

    data: Any  # jnp array; shape () or (S,) or (3,) or (S,3)...
    unit: str = ""
    # shape info captured at compile time (trace shapes are static anyway)
    is_coord: bool = False  # value is a 3-vector position
    # per-structure atom-index arrays when the value came from an
    # `expr in sel` context with one value per structure — the
    # MD_SCRIPT_VISUALIZE_ATOMS payload the reference's Property color
    # mapping consumes (viamd.cpp:1408-1445)
    structures: Any = None


@dataclass
class AccumSpec:
    """Metadata for an accumulated (distribution/volume) property."""

    kind: str  # 'distribution' | 'volume'
    # distribution:
    nbins: int = 0
    r_min: float = 0.0
    r_max: float = 0.0
    x_unit: str = ""
    # normalization inputs (rdf):
    count_a: float = 0.0
    count_b: float = 0.0
    # volume:
    dims: int = 0
    extent: float = 0.0
    n_structures: int = 1
    # volume vis payload (vis.sdf: structures + alignment inputs), attached
    # to the spec so it follows the PROPERTY NAME through reassignment —
    # a positional pairing with sdf() call order desynchronizes when a
    # volume property is reassigned
    vis: Any = None


@dataclass
class AccumValue:
    """Per-frame accumulator contribution (summed by the engine)."""

    data: Any  # jnp (nbins,) or (D,D,D)
    spec: AccumSpec


@dataclass
class PropertyMeta:
    """Metadata of one evaluated property (the DisplayProperty analog,
    /root/reference/src/main.cpp:1247-1489)."""

    name: str
    kind: str  # 'temporal' | 'distribution' | 'volume'
    dim: int = 1  # per-frame value count (temporal)
    unit: str = ""
    spec: Optional[AccumSpec] = None
    # per-structure atom indices when dim maps 1:1 onto `in`-context
    # structures (drives the Property color mapping, viamd.cpp:1408-1445)
    structures: Optional[list] = None
