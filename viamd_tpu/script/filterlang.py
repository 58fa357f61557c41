"""Atom-selection filter queries (the md_filter.h capability).

The reference exposes a selection query language to the GUI — `md_filter`
returning an atom bitfield + is_dynamic flag (/root/reference/src/viamd.cpp:
1510, src/main.cpp:3171) and a multi-structure variant
(shapespace.cpp:365). It shares the script front-end: a filter string is one
script expression that must evaluate to a selection.
"""

from __future__ import annotations

from typing import Optional

from viamd_tpu.core.bitfield import Bitfield
from viamd_tpu.core.system import System
from viamd_tpu.script import parser as P
from viamd_tpu.script.parser import ScriptError
from viamd_tpu.script.values import Selection


def evaluate_filter(
    expr: str,
    system: System,
    identifiers: Optional[dict[str, Bitfield]] = None,
    coords=None,
) -> tuple[Bitfield, bool]:
    """Evaluate a filter expression → (mask, is_dynamic).

    `coords` overrides the reference-frame coordinates so DYNAMIC
    selections (within / x / y / z) track the current playback frame —
    the is_dynamic re-evaluation behavior of the reference
    (viamd.cpp:1510). Raises ScriptError on parse/type errors (the GUI
    shows these as the red/green query-validity state).
    """
    sel = evaluate_filter_structures(expr, system, identifiers, coords)
    return sel.mask, sel.dynamic


def evaluate_filter_structures(
    expr: str,
    system: System,
    identifiers: Optional[dict[str, Bitfield]] = None,
    coords=None,
) -> Selection:
    """Multi-structure variant (md_filter_evaluate per-structure bitfields,
    shapespace.cpp:365): returns the full Selection with structures."""
    import numpy as np

    from viamd_tpu.script.compiler import _Compiler

    stmts = P.parse(expr)
    if len(stmts) != 1:
        raise ScriptError("filter must be a single expression")
    comp = _Compiler(system, identifiers or {})
    if coords is not None:
        comp.x0 = np.ascontiguousarray(coords, dtype=np.float32)
    import jax.numpy as jnp

    comp._trace_x = jnp.asarray(comp.x0)
    comp._trace_basis = jnp.asarray(comp.basis0)
    comp._trace_inv = jnp.asarray(comp.inv_basis0)
    val = comp.eval(stmts[0].expr)
    if not isinstance(val, Selection):
        raise ScriptError("filter expression is not a selection")
    return val
