"""VIAMD script → typed IR → per-frame JAX function.

Rebuild of md_script_ir_compile_from_source + md_script_eval_* (reference
capability: /root/reference/src/main.cpp:866,959-1035 — compile with
system+trajectory context, injected identifiers, per-frame evaluation of
temporal/distribution/volume properties with aggregates).

Compilation strategy (SURVEY.md §7 "hard parts"):
- All frame-independent subexpressions — selections, structure contexts,
  literals, table imports — are evaluated ONCE on the host at compile time
  (`Selection` values with static gather index lists / dense masks).
- The remaining dynamic graph is captured as `frame_fn(x, basis, inv_basis)
  → (temporal: dict, accum: dict)`, a pure jittable function built from
  viamd_tpu.ops kernels. The engine vmaps it over frame batches and
  shard_maps it over the device mesh; distribution (rdf) and volume (sdf)
  contributions are summed across frames / psummed across shards.
- A compile-time dry run over the reference frame (frame 0) type-checks the
  script by example and produces PropertyMeta (the DisplayProperty analog).
"""

from __future__ import annotations

import fnmatch
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viamd_tpu.core import elements as E
from viamd_tpu.core import system as S
from viamd_tpu.core.bitfield import Bitfield
from viamd_tpu.ops import com as com_ops
from viamd_tpu.ops import covariance as cov_ops
from viamd_tpu.ops import geometry as geom_ops
from viamd_tpu.ops import pbc as pbc_ops
from viamd_tpu.ops import rdf as rdf_ops
from viamd_tpu.ops import rmsd as rmsd_ops
from viamd_tpu.ops import sdf as sdf_ops
from viamd_tpu.script import parser as P
from viamd_tpu.script.parser import ScriptError
from viamd_tpu.script.values import (
    AccumSpec,
    AccumValue,
    DynValue,
    FRange,
    IRange,
    PropertyMeta,
    Selection,
)

RAD2DEG = 57.29577951308232

# Default resolutions (display side upsamples, as the reference does with its
# 512²-accumulate / 1024²-display split, ramachandran.cpp:43-44)
RDF_BINS = 128
SDF_DIMS = 64


def _pallas_route() -> tuple[bool, bool]:
    """(route through the Pallas kernels?, interpret mode?).

    Real TPUs compile the kernels; VIAMD_TPU_PALLAS_INTERPRET=1 forces
    the same routing in Pallas interpret mode so the compiler's kernel
    branches are testable on the CPU suite."""
    import os

    if jax.default_backend() == "tpu":
        return True, False
    if os.environ.get("VIAMD_TPU_PALLAS_INTERPRET") == "1":
        return True, True
    return False, False


@dataclass
class CompiledScript:
    """Result of compiling a script against a system."""

    frame_fn: Callable  # (x, basis, inv_basis) -> (temporal, accum) dicts
    properties: list[PropertyMeta]
    selections: dict[str, Selection]  # named selections (vis payload source)
    source: str
    warnings: list[str] = field(default_factory=list)
    # geometry payload (md_script_vis_eval_payload capability,
    # main.cpp:6540-6575): atom-index primitives the app layer draws as
    # overlay geometry (the immediate-draw path of the reference)
    visualization: dict = field(default_factory=dict)

    def property(self, name: str) -> PropertyMeta:
        for p in self.properties:
            if p.name == name:
                return p
        raise KeyError(name)


def compile_script(
    src: str,
    system: S.System,
    identifiers: Optional[dict[str, Bitfield]] = None,
    atom_shard: "Optional[tuple[str, int]] | None" = None,
) -> CompiledScript:
    """Compile script text against a system (reference frame = system coords).

    `identifiers` injects stored selections as script identifiers, mirroring
    main.cpp:860-863.

    `atom_shard=(axis_name, n_devices)`: intra-frame atom-axis (tensor)
    parallelism — the cell-list RDF kernel slab-shards its B planes over
    that mesh axis and psums (ops.pallas_rdf slab_shard). The returned
    frame_fn then REQUIRES tracing inside a shard_map whose mesh has
    `axis_name` (the Evaluator's 2D frames×atoms mesh); it cannot run
    meshless.
    """
    stmts = P.parse(src)
    comp = _Compiler(system, identifiers or {}, atom_shard=atom_shard)
    return comp.compile(stmts, src)


class _Compiler:
    def __init__(
        self,
        system: S.System,
        identifiers: dict[str, Bitfield],
        atom_shard: "Optional[tuple[str, int]]" = None,
    ):
        self.atom_shard = atom_shard
        self.sys = system
        self.n = system.natoms
        self.x0 = np.ascontiguousarray(system.coords(), dtype=np.float32)
        self.masses = system.mass.astype(np.float32)
        basis = np.asarray(system.cell.basis, np.float32)
        self.basis0 = basis
        self.inv_basis0 = np.asarray(system.cell.inv_basis, np.float32)
        self.injected = identifiers
        # state during a walk
        self.env: dict[str, Any] = {}
        self.context: Optional[Selection] = None
        self.static_cache: dict[int, Any] = {}
        self.tracing = False
        self._trace_x = None
        self._trace_basis = None
        self._trace_inv = None
        self.warnings: list[str] = []
        self.vis: dict = {
            "points": [], "lines": [], "angles": [], "dihedrals": [],
            "triangles": [], "text": [], "sdf": []
        }

    # -- public -------------------------------------------------------------
    def compile(self, stmts: list[P.Assign], src: str) -> CompiledScript:
        def frame_fn(x, basis, inv_basis):
            temporal, accum, _ = self._run(stmts, x, basis, inv_basis)
            t_out = {
                k: jnp.atleast_1d(v.data).reshape(-1).astype(jnp.float32)
                for k, v in temporal.items()
            }
            a_out = {k: v.data for k, v in accum.items()}
            return t_out, a_out

        # Abstract dry run (no device execution): type-checks the script by
        # example shapes + captures units/specs/selections via side effects
        # of the trace.
        meta: dict[str, Any] = {}

        def probe(x, basis, inv_basis):
            temporal, accum, selections = self._run(stmts, x, basis, inv_basis)
            meta["units"] = {k: v.unit for k, v in temporal.items()}
            meta["structures"] = {
                k: v.structures for k, v in temporal.items()
            }
            meta["specs"] = {k: v.spec for k, v in accum.items()}
            meta["selections"] = selections
            t_out = {
                k: jnp.atleast_1d(v.data).reshape(-1).astype(jnp.float32)
                for k, v in temporal.items()
            }
            a_out = {k: v.data for k, v in accum.items()}
            return t_out, a_out

        probe_fn = probe
        if self.atom_shard is not None:
            # the frame graph now contains psums over the atoms mesh axis;
            # the dry-run probe must trace inside a shard_map that binds it
            ax, ndev = self.atom_shard
            from jax.sharding import Mesh
            from jax.sharding import PartitionSpec as PS

            if len(jax.devices()) < ndev:
                raise ScriptError(
                    f"atom_shard declares {ndev} devices on axis '{ax}' "
                    f"but only {len(jax.devices())} exist"
                )
            mesh_p = Mesh(np.array(jax.devices()[:ndev]), (ax,))
            probe_fn = jax.shard_map(
                probe, mesh=mesh_p,
                in_specs=(PS(), PS(), PS()), out_specs=PS(),
                check_vma=False,
            )
        t_shapes, _a_shapes = jax.eval_shape(
            probe_fn,
            jax.ShapeDtypeStruct((self.n, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, 3), jnp.float32),
        )
        props: list[PropertyMeta] = []
        for name, sh in t_shapes.items():
            props.append(
                PropertyMeta(
                    name=name,
                    kind="temporal",
                    dim=int(np.prod(sh.shape)) if sh.shape else 1,
                    unit=meta["units"][name],
                    structures=meta["structures"].get(name),
                )
            )
        for name, spec in meta["specs"].items():
            props.append(
                PropertyMeta(
                    name=name,
                    kind=spec.kind,
                    dim=spec.nbins or spec.dims,
                    unit=spec.x_unit,
                    spec=spec,
                )
            )
        selections = meta["selections"]

        return CompiledScript(
            frame_fn=frame_fn,
            properties=props,
            selections=selections,
            source=src,
            warnings=list(self.warnings),
            visualization={
                k: dict(v) if isinstance(v, dict) else list(v)
                for k, v in self.vis.items()
            },
        )

    # -- walking ------------------------------------------------------------
    def _run(self, stmts, x, basis, inv_basis, collect_meta: bool = False):
        self.env = {}
        for name, bf in self.injected.items():
            self.env[name] = Selection(bf, [bf.indices()], "atom")
        self.context = None
        self.vis = {"points": [], "lines": [], "angles": [], "dihedrals": [],
            "triangles": [], "text": [], "sdf": []}
        self._trace_x = x
        self._trace_basis = basis
        self._trace_inv = inv_basis
        temporal: dict[str, DynValue] = {}
        accum: dict[str, AccumValue] = {}
        selections: dict[str, Selection] = {}
        import os

        barrier = os.environ.get("VIAMD_TPU_PROP_BARRIER", "1") == "1"
        for stmt in stmts:
            val = self.eval(stmt.expr)
            if barrier and isinstance(val, (DynValue, AccumValue)):
                # fence each property's subgraph so XLA schedules them
                # back-to-back instead of interleaving — on TPU the
                # interleaved schedule measured +0.19 ms/frame at the
                # headline config (fused 3.54 vs barriered 3.35 ms,
                # tools/exp_composition.py r4); set
                # VIAMD_TPU_PROP_BARRIER=0 to let XLA interleave
                if isinstance(val, DynValue):
                    val = DynValue(
                        jax.lax.optimization_barrier(val.data),
                        val.unit, val.is_coord, structures=val.structures,
                    )
                else:
                    val = AccumValue(
                        jax.lax.optimization_barrier(val.data), val.spec
                    )
            names = stmt.targets
            parts = self._destructure(val, names, stmt)
            for nm, v in zip(names, parts):
                self.env[nm] = v
                if nm.startswith("$"):
                    continue
                if isinstance(v, Selection):
                    selections[nm] = v
                elif isinstance(v, DynValue):
                    temporal[nm] = v
                elif isinstance(v, AccumValue):
                    accum[nm] = v
                    if v.spec is not None and v.spec.vis is not None:
                        # name-keyed vis.sdf mirror: the order-based list
                        # desynchronizes under property reassignment
                        self.vis.setdefault("sdf_by_name", {})[nm] = (
                            v.spec.vis
                        )
                elif isinstance(v, (int, float)):
                    temporal[nm] = DynValue(jnp.float32(v))
                elif isinstance(v, np.ndarray):
                    temporal[nm] = DynValue(jnp.asarray(v, jnp.float32))
        return temporal, accum, selections

    def _destructure(self, val, names, stmt):
        if len(names) == 1:
            return [val]
        if isinstance(val, DynValue):
            d = val.data
            if d.shape and d.shape[-1] == len(names):
                return [
                    DynValue(d[..., i], val.unit,
                             structures=val.structures)
                    for i in range(len(names))
                ]
        raise ScriptError(
            f"cannot destructure value into {len(names)} names",
            stmt.line,
            stmt.col,
        )

    def eval(self, node: P.Node):
        method = getattr(self, f"_eval_{type(node).__name__}")
        return method(node)

    # -- literals / identifiers ---------------------------------------------
    def _eval_Num(self, node: P.Num):
        return node.value

    def _eval_Str(self, node: P.Str):
        return node.value

    def _eval_Ident(self, node: P.Ident):
        name = node.name
        if name in self.env:
            return self.env[name]
        fn = NULLARY.get(name)
        if fn is not None:
            return fn(self, node)
        if name in BUILTINS:
            raise ScriptError(
                f"'{name}' requires arguments", node.line, node.col
            )
        raise ScriptError(f"undefined identifier '{name}'", node.line, node.col)

    def _eval_RangeLit(self, node: P.RangeLit):
        beg = self.eval(node.beg) if node.beg is not None else None
        end = self.eval(node.end) if node.end is not None else None
        if isinstance(beg, float) or isinstance(end, float):
            return FRange(beg, end)
        return IRange(beg, end)

    def _eval_ArrayLit(self, node: P.ArrayLit):
        items = [self.eval(i) for i in node.items]
        if all(isinstance(i, (int, float)) for i in items):
            return np.asarray(items, np.float32)
        if all(isinstance(i, DynValue) for i in items):
            return DynValue(jnp.stack([i.data for i in items], -1))
        raise ScriptError("mixed array literal", node.line, node.col)

    # -- operators -----------------------------------------------------------
    def _eval_UnOp(self, node: P.UnOp):
        v = self.eval(node.operand)
        if node.op == "-":
            if isinstance(v, (int, float, np.ndarray)):
                return -v
            if isinstance(v, DynValue):
                return DynValue(-v.data, v.unit)
        if node.op == "not":
            sel = self._as_selection(v, node)
            inv = ~sel.mask
            mfn = None
            if sel.mask_fn is not None:
                inner = sel.mask_fn
                mfn = lambda x, b, i: ~inner(x, b, i)  # noqa: E731
            if self.context is not None:
                inv = inv & self.context.mask
                if mfn is not None:
                    ctx_bools = jnp.asarray(self.context.mask.to_bools())
                    inner2 = mfn
                    mfn = lambda x, b, i: inner2(x, b, i) & ctx_bools  # noqa: E731
            return self._regroup(inv, dynamic=sel.dynamic, mask_fn=mfn)
        raise ScriptError(f"bad operand for {node.op}", node.line, node.col)

    def _eval_BinOp(self, node: P.BinOp):
        op = node.op
        lhs = self.eval(node.lhs)
        rhs = self.eval(node.rhs)
        if op in ("and", "or"):
            a = self._as_selection(lhs, node)
            b = self._as_selection(rhs, node)
            m = a.mask & b.mask if op == "and" else a.mask | b.mask
            return self._regroup(
                m, dynamic=a.dynamic or b.dynamic,
                mask_fn=_compose_mask_fns(op, a, b),
            )
        # arithmetic / comparisons on numbers + dyn values
        def as_data(v):
            if isinstance(v, DynValue):
                return v.data
            if isinstance(v, (int, float, np.ndarray)):
                return v
            raise ScriptError(
                f"operator '{op}' not applicable", node.line, node.col
            )

        a, b = as_data(lhs), as_data(rhs)
        fns = {
            "+": lambda: a + b,
            "-": lambda: a - b,
            "*": lambda: a * b,
            "/": lambda: a / b,
            "<": lambda: a < b,
            ">": lambda: a > b,
            "<=": lambda: a <= b,
            ">=": lambda: a >= b,
            "==": lambda: a == b,
            "!=": lambda: a != b,
        }
        out = fns[op]()
        if isinstance(lhs, DynValue) or isinstance(rhs, DynValue):
            unit = lhs.unit if isinstance(lhs, DynValue) else (
                rhs.unit if isinstance(rhs, DynValue) else ""
            )
            return DynValue(jnp.asarray(out, jnp.float32), unit)
        return out

    def _eval_InExpr(self, node: P.InExpr):
        ctx = self.eval(node.context)
        ctx = self._as_selection(ctx, node)
        if ctx.dynamic:
            # structure contexts are frozen at compile time (static gather
            # indices); a per-frame-varying context would change structure
            # COUNT and shapes under jit — typed error, not a silent freeze
            # (the reference's is_dynamic selections are likewise barred
            # from property structure contexts, viamd.cpp:1510 re-evaluates
            # display filters only)
            raise ScriptError(
                "'in' context must be static: dynamic selections "
                "(within/x/y/z) cannot form structure contexts — bind the "
                "selection statically or use it directly in "
                "count/com/rdf/distance_min/distance_max",
                node.line, node.col,
            )
        if ctx.n_structures == 0:
            raise ScriptError("'in' context matches nothing", node.line, node.col)
        prev = self.context
        self.context = ctx
        try:
            val = self.eval(node.expr)
        finally:
            self.context = prev
        if (
            isinstance(val, DynValue)
            and val.structures is None
            and getattr(val.data, "shape", ())
            and val.data.shape[0] == ctx.n_structures
        ):
            # one value per context structure → carry the atom groups for
            # the Property color mapping (viamd.cpp:1408-1445)
            val = DynValue(
                val.data, val.unit, val.is_coord,
                structures=list(ctx.structures),
            )
        return val

    def _eval_Subscript(self, node: P.Subscript):
        base = self.eval(node.base)
        idx = self.eval(node.index)
        if isinstance(base, Selection):
            s = base.structures
            if isinstance(idx, IRange):
                beg = (idx.beg or 1) - 1
                end = idx.end if idx.end is not None else len(s)
                sub = s[beg:end]
            elif isinstance(idx, int):
                if not (1 <= idx <= len(s)):
                    raise ScriptError(
                        f"index {idx} out of range [1,{len(s)}]",
                        node.line, node.col,
                    )
                sub = [s[idx - 1]]
            else:
                raise ScriptError("bad selection index", node.line, node.col)
            if not sub:
                raise ScriptError("empty selection slice", node.line, node.col)
            mask = Bitfield.from_indices(
                self.n, np.concatenate(sub) if sub else []
            )
            return Selection(mask, sub, base.level, base.dynamic)
        if isinstance(base, DynValue):
            if isinstance(idx, int):
                return DynValue(base.data[..., idx - 1], base.unit)
            if isinstance(idx, IRange):
                beg = (idx.beg or 1) - 1
                end = idx.end if idx.end is not None else base.data.shape[-1]
                return DynValue(base.data[..., beg:end], base.unit)
        if isinstance(base, np.ndarray):
            if isinstance(idx, int):
                return base[..., idx - 1]
            if isinstance(idx, IRange):
                beg = (idx.beg or 1) - 1
                end = idx.end if idx.end is not None else base.shape[-1]
                return base[..., beg:end]
        raise ScriptError("subscript not supported here", node.line, node.col)

    def _eval_Call(self, node: P.Call):
        fn = BUILTINS.get(node.func)
        if fn is None:
            raise ScriptError(
                f"unknown function '{node.func}'", node.line, node.col
            )
        args = [self.eval(a) for a in node.args]
        try:
            return fn(self, node, args)
        except ScriptError:
            raise
        except (TypeError, ValueError, IndexError) as e:
            raise ScriptError(
                f"{node.func}: {e}", node.line, node.col
            ) from e

    # -- helpers -------------------------------------------------------------
    def _as_selection(self, v, node) -> Selection:
        if isinstance(v, Selection):
            return v
        raise ScriptError(
            "expected an atom selection", getattr(node, "line", 0),
            getattr(node, "col", 0),
        )

    def _regroup(self, mask: Bitfield, dynamic=False, mask_fn=None) -> Selection:
        """Selection from a raw mask: structures grouped by residue when the
        mask spans whole residues, else a single flat structure."""
        idx = mask.indices()
        return Selection(mask, [idx] if idx.size else [], "atom", dynamic,
                         mask_fn)

    def residue_selection(self, res_mask: np.ndarray, dynamic=False) -> Selection:
        """Selection at residue granularity from a per-residue bool mask."""
        structures = []
        all_idx = []
        offs = self.sys.res_offsets
        for r in np.nonzero(res_mask)[0]:
            ats = np.arange(offs[r], offs[r + 1], dtype=np.int32)
            structures.append(ats)
            all_idx.append(ats)
        mask = Bitfield.from_indices(
            self.n, np.concatenate(all_idx) if all_idx else []
        )
        sel = Selection(mask, structures, "residue", dynamic)
        return self._clip_to_context(sel)

    def atom_selection(
        self, atom_mask: np.ndarray, dynamic=False, mask_fn=None
    ) -> Selection:
        bf = Bitfield.from_bools(atom_mask)
        sel = Selection(bf, [bf.indices()] if bf.any() else [], "atom",
                        dynamic, mask_fn)
        return self._clip_to_context(sel)

    def _clip_to_context(self, sel: Selection) -> Selection:
        """Inside an `in` context, selections restrict to the context mask
        (per-structure intersection when the context drives a mapped eval)."""
        if self.context is None:
            return sel
        m = sel.mask & self.context.mask
        # per-frame masks intersect the (static) context on device
        mfn = None
        if sel.mask_fn is not None:
            ctx_bools = jnp.asarray(self.context.mask.to_bools())
            inner = sel.mask_fn
            mfn = lambda x, b, i: inner(x, b, i) & ctx_bools  # noqa: E731
        if sel.level == "residue":
            structures = [
                s[np.isin(s, m.indices())] for s in sel.structures
            ]
            structures = [s for s in structures if s.size]
            return Selection(m, structures, sel.level, sel.dynamic, mfn)
        idx = m.indices()
        return Selection(m, [idx] if idx.size else [], sel.level,
                         sel.dynamic, mfn)

    def position_of(self, v, node) -> Any:
        """Coerce an argument to a (3,) position (traced).

        int → 1-based global atom index (or context-relative inside `in`);
        Selection → mass-weighted COM; DynValue coord passes through.
        """
        x = self._trace_x
        if isinstance(v, int):
            gi = self._resolve_atom_index(v, node)
            return x[gi]
        if isinstance(v, Selection):
            if v.dynamic and v.mask_fn is not None:
                # per-frame COM position for a dynamic selection
                w = v.mask_fn(
                    x, self._trace_basis, self._trace_inv
                ).astype(jnp.float32) * jnp.asarray(self.masses)
                return com_ops.com(x, w, self._trace_basis, self._trace_inv)
            self.static_warn(v, "position")
            idx = v.mask.indices()
            w = np.zeros(self.n, np.float32)
            w[idx] = self.masses[idx]
            return com_ops.com(
                x, jnp.asarray(w), self._trace_basis, self._trace_inv
            )
        if isinstance(v, DynValue) and v.is_coord:
            return v.data
        raise ScriptError(
            "expected an atom index, selection, or position",
            node.line, node.col,
        )

    def _resolve_atom_index(self, i: int, node) -> int:
        if self.context is not None:
            # relative 1-based index within each context structure is handled
            # by mapped builtins; a bare resolve uses the first structure
            raise ScriptError(
                "atom-index arguments inside 'in' must be used by a mappable "
                "function (distance/angle/dihedral)",
                node.line, node.col,
            )
        if not (1 <= i <= self.n):
            raise ScriptError(
                f"atom index {i} out of range [1,{self.n}]", node.line, node.col
            )
        return i - 1

    def context_structures(self) -> list[np.ndarray]:
        if self.context is None:
            return [np.arange(self.n, dtype=np.int32)]
        return self.context.structures

    def dense_weights(self, sel: Selection, masses=True) -> np.ndarray:
        w = np.zeros(self.n, np.float32)
        idx = sel.mask.indices()
        w[idx] = self.masses[idx] if masses else 1.0
        return w

    def dyn_weights(self, sel: Selection, masses=True):
        """(n,) per-frame f32 weights (traced). Dynamic selections with a
        mask_fn recompute against the CURRENT frame — the is_dynamic
        re-evaluation of viamd.cpp:1510 inside property eval; static
        selections embed their compile-time mask as a constant."""
        if sel.dynamic and sel.mask_fn is not None:
            m = sel.mask_fn(
                self._trace_x, self._trace_basis, self._trace_inv
            ).astype(jnp.float32)
            return m * jnp.asarray(self.masses) if masses else m
        return jnp.asarray(self.dense_weights(sel, masses))

    def static_warn(self, sel: Selection, what: str):
        """Record that a dynamic selection is consumed by a static-only
        path (reference-frame freeze)."""
        if sel.dynamic:
            msg = (f"{what}: dynamic selection evaluated on the reference "
                   "frame (static path)")
            if msg not in self.warnings:
                self.warnings.append(msg)


def _compose_mask_fns(op: str, a: Selection, b: Selection):
    """Per-frame mask for a boolean combination of selections. Built when
    at least one side recomputes per frame; the static side participates
    as a constant dense mask."""
    if a.mask_fn is None and b.mask_fn is None:
        return None

    def side(s: Selection):
        if s.mask_fn is not None:
            return s.mask_fn
        const = jnp.asarray(s.mask.to_bools())
        return lambda x, bs, i: const

    fa, fb = side(a), side(b)
    if op == "and":
        return lambda x, bs, i: fa(x, bs, i) & fb(x, bs, i)
    return lambda x, bs, i: fa(x, bs, i) | fb(x, bs, i)


def _within_mask_traced(x, idx, cut: float, basis, inv):
    """(n,) bool: atoms within `cut` of any target atom, CURRENT frame.

    Dense min-image distance-to-target, chunked over the query axis via
    lax.map so peak memory stays O(chunk·|target|) — the on-device
    per-frame re-evaluation of within() (viamd.cpp:1510 is_dynamic)."""
    idx = jnp.asarray(idx, jnp.int32)
    xt = x[idx]
    n = x.shape[0]
    m = int(idx.shape[0])
    chunk = max(128, (1 << 22) // max(m, 1))
    cut2 = jnp.float32(cut * cut)

    def dist2_block(xc):
        d = xc[:, None, :] - xt[None, :, :]
        dd = pbc_ops.min_image(d.reshape(-1, 3), basis, inv).reshape(d.shape)
        return jnp.min(jnp.sum(dd * dd, -1), axis=1)

    if chunk >= n:
        return dist2_block(x) <= cut2
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    d2 = jax.lax.map(dist2_block, xp.reshape(-1, chunk, 3)).reshape(-1)[:n]
    return d2 <= cut2


# ---------------------------------------------------------------------------
# builtin registry
# ---------------------------------------------------------------------------

BUILTINS: dict[str, Callable] = {}
NULLARY: dict[str, Callable] = {}


def builtin(name):
    def deco(fn):
        BUILTINS[name] = fn
        return fn

    return deco


def nullary(name):
    def deco(fn):
        NULLARY[name] = fn
        return fn

    return deco


# -- nullary selections ------------------------------------------------------


@nullary("all")
def _all(c: _Compiler, node):
    if c.context is not None:
        return c.context
    return Selection(
        Bitfield.full(c.n), [np.arange(c.n, dtype=np.int32)], "system"
    )


@nullary("atoms")
def _atoms(c: _Compiler, node):
    base = c.context.mask.indices() if c.context else np.arange(c.n)
    return Selection(
        Bitfield.from_indices(c.n, base),
        [np.asarray([i], np.int32) for i in base],
        "atom",
    )


@nullary("residues")
def _residues(c: _Compiler, node):
    return c.residue_selection(np.ones(c.sys.nres, bool))


@nullary("chains")
def _chains(c: _Compiler, node):
    structures = []
    offs = c.sys.chain_offsets
    for ci in range(c.sys.nchains):
        structures.append(np.arange(offs[ci], offs[ci + 1], dtype=np.int32))
    mask = Bitfield.full(c.n)
    sel = Selection(mask, structures, "chain")
    return c._clip_to_context(sel)


def _flag_nullary(flag):
    def fn(c: _Compiler, node):
        return c.atom_selection((c.sys.flags & flag) != 0)

    return fn


NULLARY["water"] = _flag_nullary(S.FLAG_WATER)
NULLARY["ion"] = _flag_nullary(S.FLAG_ION)
NULLARY["protein"] = _flag_nullary(S.FLAG_AMINO)
NULLARY["nucleic"] = _flag_nullary(S.FLAG_NUCLEIC)
NULLARY["backbone"] = _flag_nullary(S.FLAG_BACKBONE)
NULLARY["sidechain"] = _flag_nullary(S.FLAG_SIDECHAIN)
NULLARY["hetero"] = _flag_nullary(S.FLAG_HETERO)


# -- selection functions -----------------------------------------------------


def _match_labels(table, patterns) -> set[int]:
    """Label-table ids matching any of the (glob-capable) string patterns."""
    out = set()
    for pat in patterns:
        if not isinstance(pat, str):
            raise TypeError(f"expected string, got {pat!r}")
        for i, lab in enumerate(table.labels):
            if lab == pat or fnmatch.fnmatchcase(lab.upper(), pat.upper()):
                out.add(i)
    return out


@builtin("element")
def _element(c: _Compiler, node, args):
    zs = set()
    for a in args:
        if isinstance(a, str):
            z = E.symbol_to_z(a) or E.name_to_z(a)
            if not z:
                raise ScriptError(
                    f"unknown element '{a}'", node.line, node.col
                )
            zs.add(z)
        elif isinstance(a, int):
            zs.add(a)
        else:
            raise ScriptError("element: expects symbols", node.line, node.col)
    mask = np.isin(c.sys.element, list(zs))
    return c.atom_selection(mask)


@builtin("name")
def _name(c: _Compiler, node, args):
    ids = _match_labels(c.sys.atom_names, args)
    return c.atom_selection(np.isin(c.sys.atom_name_id, list(ids)))


BUILTINS["type"] = _name
BUILTINS["label"] = _name


@builtin("resname")
def _resname(c: _Compiler, node, args):
    ids = _match_labels(c.sys.res_names, args)
    res_mask = np.isin(c.sys.res_name_id, list(ids))
    return c.residue_selection(res_mask)


@builtin("resid")
def _resid(c: _Compiler, node, args):
    res_mask = np.zeros(c.sys.nres, bool)
    rid = c.sys.res_id
    for a in args:
        if isinstance(a, int):
            res_mask |= rid == a
        elif isinstance(a, IRange):
            beg = a.beg if a.beg is not None else int(rid.min())
            end = a.end if a.end is not None else int(rid.max())
            res_mask |= (rid >= beg) & (rid <= end)
        else:
            raise ScriptError("resid: expects ints/ranges", node.line, node.col)
    return c.residue_selection(res_mask)


@builtin("residue")
def _residue(c: _Compiler, node, args):
    """1-based residue *sequence* indices (not author resid)."""
    res_mask = np.zeros(c.sys.nres, bool)
    for a in args:
        if isinstance(a, int):
            if not (1 <= a <= c.sys.nres):
                raise ScriptError(
                    f"residue index {a} out of range", node.line, node.col
                )
            res_mask[a - 1] = True
        elif isinstance(a, IRange):
            beg = (a.beg or 1) - 1
            end = a.end if a.end is not None else c.sys.nres
            res_mask[beg:end] = True
        else:
            raise ScriptError("residue: expects ints/ranges", node.line, node.col)
    return c.residue_selection(res_mask)


@builtin("chain")
def _chain(c: _Compiler, node, args):
    structures = []
    offs = c.sys.chain_offsets
    chosen = np.zeros(c.sys.nchains, bool)
    for a in args:
        if isinstance(a, str):
            ids = _match_labels(c.sys.chain_labels, [a])
            chosen |= np.isin(c.sys.chain_id, list(ids))
        elif isinstance(a, int):
            if 1 <= a <= c.sys.nchains:
                chosen[a - 1] = True
        elif isinstance(a, IRange):
            beg = (a.beg or 1) - 1
            end = a.end if a.end is not None else c.sys.nchains
            chosen[beg:end] = True
    all_idx = []
    for ci in np.nonzero(chosen)[0]:
        ats = np.arange(offs[ci], offs[ci + 1], dtype=np.int32)
        structures.append(ats)
        all_idx.append(ats)
    mask = Bitfield.from_indices(
        c.n, np.concatenate(all_idx) if all_idx else []
    )
    return c._clip_to_context(Selection(mask, structures, "chain"))


@builtin("atom")
def _atom(c: _Compiler, node, args):
    """1-based atom indices/ranges (context-relative inside `in`)."""
    ctx_structs = c.context.structures if c.context else None
    mask = np.zeros(c.n, bool)
    if ctx_structs is None:
        for a in args:
            if isinstance(a, int):
                mask[c._resolve_atom_index(a, node)] = True
            elif isinstance(a, IRange):
                beg = (a.beg or 1) - 1
                end = a.end if a.end is not None else c.n
                mask[beg:end] = True
    else:
        for s in ctx_structs:
            for a in args:
                if isinstance(a, int):
                    if 1 <= a <= len(s):
                        mask[s[a - 1]] = True
                elif isinstance(a, IRange):
                    beg = (a.beg or 1) - 1
                    end = a.end if a.end is not None else len(s)
                    mask[s[beg:end]] = True
    bf = Bitfield.from_bools(mask)
    return Selection(bf, [bf.indices()] if bf.any() else [], "atom")


@builtin("atoms")
def _atoms(c: _Compiler, node, args):
    """Plural structure builtin (reference identifier list,
    ext/ImGuiColorTextEdit/TextEditor.cpp:3320): atoms(sel|indices) at
    per-ATOM structure granularity — `prop in atoms(...)` maps per atom.
    Range form selects 1-based indices like atom(); selection form
    re-contexts the selection's atoms one-structure-per-atom."""
    dynamic = False
    if not args:
        mask = np.ones(c.n, bool)
    else:
        mask = np.zeros(c.n, bool)
        sels, rest = [], []
        for a in args:
            (sels if isinstance(a, Selection) else rest).append(a)
        for s in sels:
            mask |= s.mask.to_bools()
            dynamic |= s.dynamic
        if rest:
            mask |= _atom(c, node, rest).mask.to_bools()
    bf = Bitfield.from_bools(mask)
    sel = Selection(
        bf,
        [np.array([i], np.int32) for i in bf.indices()],
        "atom",
        dynamic,
    )
    return c._clip_to_context(sel)


def _promoted_res_mask(c: _Compiler, sel: Selection) -> np.ndarray:
    res_mask = np.zeros(c.sys.nres, bool)
    idx = sel.mask.indices()
    if idx.size:
        res_mask[c.sys.atom_res_idx[idx]] = True
    return res_mask


@builtin("residues")
def _residues(c: _Compiler, node, args):
    """residues(sel|indices): the residues touched, one structure per
    residue (reference identifier list, TextEditor.cpp:3320). A selection
    argument promotes to whole residues (completes partial residues);
    ranges behave like residue()."""
    if not args:
        return c.residue_selection(np.ones(c.sys.nres, bool))
    res_mask = np.zeros(c.sys.nres, bool)
    dynamic = False
    rest = []
    for a in args:
        if isinstance(a, Selection):
            res_mask |= _promoted_res_mask(c, a)
            dynamic |= a.dynamic
        else:
            rest.append(a)
    if rest:
        res_mask |= _promoted_res_mask(c, _residue(c, node, rest))
    return c.residue_selection(res_mask, dynamic=dynamic)


@builtin("chains")
def _chains(c: _Compiler, node, args):
    """chains(sel|ids|indices): the chains touched, one structure per
    chain (reference identifier list, TextEditor.cpp:3320). A selection
    argument promotes to whole chains; strings/ints/ranges behave like
    chain()."""
    chosen = np.zeros(c.sys.nchains, bool)
    dynamic = False
    rest = []
    if not args:
        chosen[:] = True
    for a in args:
        if isinstance(a, Selection):
            idx = a.mask.indices()
            ci = c.sys.atom_chain_idx[idx]
            chosen[ci[ci >= 0]] = True
            dynamic |= a.dynamic
        else:
            rest.append(a)
    if rest:
        sub = _chain(c, node, rest)
        idx = sub.mask.indices()
        ci = c.sys.atom_chain_idx[idx]
        chosen[ci[ci >= 0]] = True
    offs = c.sys.chain_offsets
    structures = []
    all_idx = []
    for ci in np.nonzero(chosen)[0]:
        ats = np.arange(offs[ci], offs[ci + 1], dtype=np.int32)
        structures.append(ats)
        all_idx.append(ats)
    mask = Bitfield.from_indices(
        c.n, np.concatenate(all_idx) if all_idx else []
    )
    return c._clip_to_context(
        Selection(mask, structures, "chain", dynamic)
    )


@builtin("within")
def _within(c: _Compiler, node, args):
    """within(cutoff, sel): atoms within cutoff Å of sel.

    Dynamic (viamd.cpp:1510 is_dynamic): the static mask below is the
    reference-frame evaluation (structure decomposition, filters at the
    ref frame); when the TARGET selection is static, a per-frame traced
    mask_fn is attached so property consumers (count/com/rdf/
    distance_min/max) re-evaluate against each frame's coordinates.
    Structure contexts reject dynamic selections with a typed error
    (_eval_InExpr).
    """
    if len(args) != 2:
        raise ScriptError("within(cutoff, selection)", node.line, node.col)
    cutoff, sel = args
    if isinstance(sel, (int, float)) and isinstance(cutoff, Selection):
        cutoff, sel = sel, cutoff
    if not isinstance(sel, Selection) or not isinstance(cutoff, (int, float)):
        raise ScriptError("within(cutoff, selection)", node.line, node.col)
    idx = sel.mask.indices()
    if not idx.size:
        return c.atom_selection(np.zeros(c.n, bool), dynamic=True)
    # host-side distance check on the reference frame. A KD-tree with
    # periodic boxsize handles the orthorhombic case in O(n log n); the
    # general (triclinic/aperiodic) fallback chunks the query side so
    # memory stays O(chunk·|sel|) instead of O(n·|sel|).
    x = c.x0
    cut = float(cutoff)
    try:
        from scipy.spatial import cKDTree
    except ImportError:
        cKDTree = None
    if c.sys.cell.is_orthorhombic and cKDTree is not None:
        box = np.asarray(c.sys.cell.extent(), np.float64)
        xw = np.mod(x.astype(np.float64), box)  # boxsize requires [0, L)
        # np.mod(-1e-16, L) == L exactly — boxsize requires strictly < L
        xw[xw >= box] = 0.0
        tree = cKDTree(xw[idx], boxsize=box)
        hits = tree.query_ball_point(xw, r=cut, return_length=True)
        mask = np.asarray(hits) > 0
    else:
        # pure NumPy: this reference-frame evaluation runs INSIDE the
        # compile-time probe trace, where any jnp op would be staged as a
        # tracer (omnistaging) and poison the host-side mask
        mask = np.zeros(c.n, bool)
        xs = x[idx].astype(np.float64)
        B = np.asarray(c.basis0, np.float64)
        Iv = np.asarray(c.inv_basis0, np.float64)
        periodic = bool(np.abs(np.linalg.det(B)) > 1e-12)
        chunk = max(1, (1 << 24) // max(idx.size, 1))
        for beg in range(0, c.n, chunk):
            d = x[beg : beg + chunk, None, :].astype(np.float64) - xs[None]
            if periodic:
                f = d @ Iv  # row-vector convention (ops.pbc.cellmul)
                f -= np.round(f)
                d = f @ B
            dist2 = (d * d).sum(-1).min(axis=1)
            mask[beg : beg + chunk] = dist2 <= cut * cut
    if sel.dynamic:
        # dynamic target: per-frame recomputation would need a per-frame
        # candidate set (O(n²) dense) — freeze the target and warn
        c.warnings.append(
            "within(): dynamic target selection — target evaluated on the "
            "reference frame"
        )
        mfn = None
    else:
        tgt_idx = idx.copy()
        mfn = lambda xx, bb, ii: _within_mask_traced(  # noqa: E731
            xx, tgt_idx, cut, bb, ii
        )
    return c.atom_selection(mask, dynamic=True, mask_fn=mfn)


def _axis_sel(axis):
    def fn(c: _Compiler, node, args):
        if len(args) != 1 or not isinstance(args[0], (IRange, FRange)):
            raise ScriptError(
                f"{'xyz'[axis]}(min:max) expects a range", node.line, node.col
            )
        r = args[0]
        v = c.x0[:, axis]
        lo = r.beg if r.beg is not None else -np.inf
        hi = r.end if r.end is not None else np.inf
        flo, fhi = jnp.float32(lo), jnp.float32(hi)
        mfn = lambda xx, bb, ii: (  # noqa: E731 — per-frame axis range
            (xx[:, axis] >= flo) & (xx[:, axis] <= fhi)
        )
        return c.atom_selection((v >= lo) & (v <= hi), dynamic=True,
                                mask_fn=mfn)

    return fn


BUILTINS["x"] = _axis_sel(0)
BUILTINS["y"] = _axis_sel(1)
BUILTINS["z"] = _axis_sel(2)


@builtin("count")
def _count(c: _Compiler, node, args):
    sel = c._as_selection(args[0] if args else None, node)
    if sel.dynamic and sel.mask_fn is not None:
        # per-frame count — e.g. count(within(5, resname("LIG"))) as a
        # genuine time series (viamd.cpp:1510 is_dynamic semantics)
        m = sel.mask_fn(c._trace_x, c._trace_basis, c._trace_inv)
        return DynValue(jnp.sum(m.astype(jnp.float32)))
    c.static_warn(sel, "count")
    return DynValue(jnp.float32(sel.mask.popcount()))


# -- geometry ----------------------------------------------------------------


def _mapped_indices(c: _Compiler, raw_args, node, arity):
    """Resolve atom-index args to (S,) global index arrays (context-mapped)."""
    structs = c.context_structures() if c.context else None
    cols = []
    for a in raw_args:
        if not isinstance(a, int):
            return None  # not the pure-index form
        cols.append(a)
    if len(cols) != arity:
        raise ScriptError(
            f"expected {arity} atom indices", node.line, node.col
        )
    if c.context is None:
        idx = [np.asarray([c._resolve_atom_index(a, node)], np.int32) for a in cols]
        return idx
    out = [[] for _ in range(arity)]
    for s in structs:
        for k, a in enumerate(cols):
            if not (1 <= a <= len(s)):
                raise ScriptError(
                    f"relative atom index {a} out of range for a structure "
                    f"of {len(s)} atoms",
                    node.line, node.col,
                )
            out[k].append(s[a - 1])
    return [np.asarray(o, np.int32) for o in out]


def _require_atoms(name: str, node, *sels):
    """Compile-time empty-selection check (selections are static): the
    geometric reductions below produce garbage on zero atoms (min over
    nothing = inf, shape weights of nothing, …) — reject with a located
    error like the reference's typed compile errors (main.cpp:868-930)."""
    for s in sels:
        if s.mask.popcount() == 0:
            raise ScriptError(
                f"{name}: selection matches no atoms", node.line, node.col
            )


@builtin("distance")
def _distance(c: _Compiler, node, args):
    if len(args) != 2:
        raise ScriptError("distance(a, b)", node.line, node.col)
    idx = _mapped_indices(c, args, node, 2)
    x, b, ib = c._trace_x, c._trace_basis, c._trace_inv
    if idx is not None:
        c.vis["lines"].extend(zip(idx[0].tolist(), idx[1].tolist()))
        d = geom_ops.distance(x, jnp.asarray(idx[0]), jnp.asarray(idx[1]), b, ib)
        return DynValue(d[0] if d.shape[0] == 1 else d, unit="Å")
    pa = c.position_of(args[0], node)
    pb = c.position_of(args[1], node)
    dv = pbc_ops.min_image(pa - pb, b, ib)
    return DynValue(jnp.sqrt(jnp.maximum(jnp.sum(dv * dv), 0.0)), unit="Å")


@builtin("distance_min")
def _distance_min(c: _Compiler, node, args):
    a = c._as_selection(args[0], node)
    bsel = c._as_selection(args[1], node)
    _require_atoms("distance_min", node, a, bsel)
    dmin, _ = geom_ops.distance_min_max(
        c._trace_x,
        c.dyn_weights(a, masses=False),
        c.dyn_weights(bsel, masses=False),
        c._trace_basis, c._trace_inv,
    )
    return DynValue(dmin, unit="Å")


@builtin("distance_max")
def _distance_max(c: _Compiler, node, args):
    a = c._as_selection(args[0], node)
    bsel = c._as_selection(args[1], node)
    _require_atoms("distance_max", node, a, bsel)
    _, dmax = geom_ops.distance_min_max(
        c._trace_x,
        c.dyn_weights(a, masses=False),
        c.dyn_weights(bsel, masses=False),
        c._trace_basis, c._trace_inv,
    )
    return DynValue(dmax, unit="Å")


@builtin("distance_pair")
def _distance_pair(c: _Compiler, node, args):
    a = c._as_selection(args[0], node)
    bsel = c._as_selection(args[1], node)
    _require_atoms("distance_pair", node, a, bsel)
    c.static_warn(a, "distance_pair")
    c.static_warn(bsel, "distance_pair")
    ia = a.mask.indices()
    ib_ = bsel.mask.indices()
    if ia.size * ib_.size > 65536:
        raise ScriptError(
            f"distance_pair: {ia.size}×{ib_.size} pairs is too many for a "
            "temporal property (cap 65536)",
            node.line, node.col,
        )
    x, b, ib = c._trace_x, c._trace_basis, c._trace_inv
    d = pbc_ops.pair_distances(x[jnp.asarray(ia)], x[jnp.asarray(ib_)], b, ib)
    return DynValue(d.reshape(-1), unit="Å")


@builtin("angle")
def _angle(c: _Compiler, node, args):
    idx = _mapped_indices(c, args, node, 3)
    if idx is None:
        pos = [c.position_of(a, node) for a in args]
        x = jnp.stack(pos)
        a = geom_ops.angle(
            x, jnp.asarray([0]), jnp.asarray([1]), jnp.asarray([2]),
            c._trace_basis, c._trace_inv,
        )[0]
        return DynValue(a * RAD2DEG, unit="deg")
    c.vis["angles"].extend(
        zip(idx[0].tolist(), idx[1].tolist(), idx[2].tolist())
    )
    a = geom_ops.angle(
        c._trace_x,
        jnp.asarray(idx[0]), jnp.asarray(idx[1]), jnp.asarray(idx[2]),
        c._trace_basis, c._trace_inv,
    )
    a = a * RAD2DEG
    return DynValue(a[0] if a.shape[0] == 1 else a, unit="deg")


@builtin("dihedral")
def _dihedral(c: _Compiler, node, args):
    idx = _mapped_indices(c, args, node, 4)
    if idx is None:
        pos = [c.position_of(a, node) for a in args]
        x = jnp.stack(pos)
        d = geom_ops.dihedral(
            x, jnp.asarray([0]), jnp.asarray([1]), jnp.asarray([2]),
            jnp.asarray([3]), c._trace_basis, c._trace_inv,
        )[0]
        return DynValue(d * RAD2DEG, unit="deg")
    c.vis["dihedrals"].extend(
        zip(idx[0].tolist(), idx[1].tolist(), idx[2].tolist(), idx[3].tolist())
    )
    d = geom_ops.dihedral(
        c._trace_x,
        jnp.asarray(idx[0]), jnp.asarray(idx[1]),
        jnp.asarray(idx[2]), jnp.asarray(idx[3]),
        c._trace_basis, c._trace_inv,
    )
    d = d * RAD2DEG
    return DynValue(d[0] if d.shape[0] == 1 else d, unit="deg")


@builtin("com")
def _com(c: _Compiler, node, args):
    sel = c._as_selection(args[0] if args else NULLARY["all"](c, node), node)
    _require_atoms("com", node, sel)
    if c.context is not None and c.context.n_structures > 1:
        idx, w = Selection(
            sel.mask, c.context.structures, "atom"
        ).packed(c.masses)
        # per context structure: COM of (structure ∩ sel)
        selb = sel.mask.to_bools()
        w = w * selb[idx]
        coms = jax.vmap(
            lambda ii, ww: com_ops.com(
                c._trace_x[ii], ww, c._trace_basis, c._trace_inv
            )
        )(jnp.asarray(idx), jnp.asarray(w))
        c.static_warn(sel, "com (structure context)")
        return DynValue(coms, unit="Å", is_coord=True)
    w = c.dyn_weights(sel)  # per-frame mass weights for dynamic selections
    p = com_ops.com(c._trace_x, w, c._trace_basis, c._trace_inv)
    return DynValue(p, unit="Å", is_coord=True)


@builtin("plane")
def _plane(c: _Compiler, node, args):
    """Best-fit plane of a selection → (nx, ny, nz, d) coefficients."""
    sel = c._as_selection(args[0], node)
    _require_atoms("plane", node, sel)
    c.static_warn(sel, "plane")
    w = jnp.asarray(c.dense_weights(sel))
    x, b, ib = c._trace_x, c._trace_basis, c._trace_inv
    cm, vals, vecs = cov_ops.principal_axes(x, w, b, ib)
    normal = vecs[:, 2]  # smallest-eigenvalue axis
    d = -jnp.sum(normal * cm)
    return DynValue(jnp.concatenate([normal, d[None]]), unit="")


@builtin("rmsd")
def _rmsd(c: _Compiler, node, args):
    sel = c._as_selection(args[0], node)
    _require_atoms("rmsd", node, sel)
    c.static_warn(sel, "rmsd")
    structs = (
        c.context.structures
        if c.context is not None and c.context.n_structures > 1
        else [sel.mask.indices()]
    )
    ref = c.x0
    outs = []
    for s in structs:
        idx = s if len(structs) > 1 else sel.mask.indices()
        w = c.masses[idx]
        p = c._trace_x[jnp.asarray(idx)]
        q = jnp.asarray(ref[idx])
        outs.append(rmsd_ops.rmsd(p, q, jnp.asarray(w), align=True))
    v = jnp.stack(outs) if len(outs) > 1 else outs[0]
    return DynValue(v, unit="Å")


@builtin("shape_weights")
def _shape_weights(c: _Compiler, node, args):
    sel = c._as_selection(args[0], node)
    _require_atoms("shape_weights", node, sel)
    c.static_warn(sel, "shape_weights")
    structs = sel.structures if sel.n_structures > 1 else None
    if c.context is not None and c.context.n_structures > 1:
        structs = c.context.structures
    x, b, ib = c._trace_x, c._trace_basis, c._trace_inv
    if structs is None:
        w = jnp.asarray(c.dense_weights(sel))
        sw = cov_ops.shape_weights(x, w, b, ib)
        return DynValue(sw, unit="")
    packed = Selection(sel.mask, structs, sel.level).packed(c.masses)
    idx, w = packed
    sw = jax.vmap(
        lambda ii, ww: cov_ops.shape_weights(x[ii], ww, b, ib)
    )(jnp.asarray(idx), jnp.asarray(w))
    return DynValue(sw, unit="")


@builtin("rdf")
def _rdf(c: _Compiler, node, args):
    if len(args) != 3:
        raise ScriptError("rdf(sel_a, sel_b, cutoff)", node.line, node.col)
    a = c._as_selection(args[0], node)
    bsel = c._as_selection(args[1], node)
    cutoff = float(args[2])
    if (a.dynamic and a.mask_fn is not None) or (
        bsel.dynamic and bsel.mask_fn is not None
    ):
        # per-frame selections: dense masked histogram with PER-FRAME
        # normalization (selection sizes vary frame to frame, so each
        # frame contributes H_f/(Na_f·Nb_f) and the spec counts become 1 —
        # rdf_normalize then yields the frame-averaged g(r)). The
        # cell-list kernels need static gather indices, so dynamic rdf
        # rides the dense path; it is exact for any cell.
        wa_t = c.dyn_weights(a, masses=False)
        wb_t = c.dyn_weights(bsel, masses=False)
        dense = (
            rdf_ops.pair_dist_histogram
            if jax.default_backend() == "tpu"
            else rdf_ops.pair_dist_histogram_scatter
        )
        hist = dense(
            c._trace_x, wa_t, wb_t,
            c._trace_basis, c._trace_inv, RDF_BINS, cutoff,
        )
        na, nb = jnp.sum(wa_t), jnp.sum(wb_t)
        hist = hist / jnp.maximum(na * nb, 1.0)
        spec = AccumSpec(
            kind="distribution", nbins=RDF_BINS, r_min=0.0, r_max=cutoff,
            x_unit="Å", count_a=1.0, count_b=1.0,
        )
        return AccumValue(hist, spec)
    wa = c.dense_weights(a, masses=False)
    wb = c.dense_weights(bsel, masses=False)
    # Large periodic systems route through the O(n·k) cell-list kernel
    # (ops.neighbors): orthorhombic cells bin in cartesian space,
    # triclinic ones in fractional space (TPU only). Small or aperiodic
    # systems use the tiled dense path.
    use_cl = False
    tri = False
    idx_a = a.mask.indices()
    idx_b = bsel.mask.indices()
    pl_route, pl_interp = _pallas_route()
    if (
        c.sys.cell.is_periodic
        and not c.sys.cell.is_orthorhombic
        and c.n >= 4096
    ):
        # TRICLINIC cell-list path: fractional-space binning + single-round
        # fractional min-image (same semantics as the dense path's
        # ops.pbc.min_image). TPU routes through the Pallas kernel; other
        # backends use the XLA cell-list scan with the same fractional
        # math (pair_dist_histogram_cl basis mode) — without this, skewed
        # boxes — rhombic dodecahedron / truncated octahedron, the most
        # common production cells — fell back to the O(n²) dense pair
        # histogram.
        from viamd_tpu.ops.neighbors import choose_grid_triclinic

        B0 = np.asarray(c.sys.cell.basis, np.float64)
        radius = 1
        dims, cap_a = choose_grid_triclinic(B0, cutoff, idx_a.size, radius=1)
        _, cap_b = choose_grid_triclinic(B0, cutoff, idx_b.size, radius=1)
        use_cl = tri = min(dims) >= 3
        # static offset-class bin skipping needs cartesian cell widths;
        # fractional cells have none (anisotropic reach) — disabled
        box_np = None
    elif c.sys.cell.is_orthorhombic and c.n >= 4096:
        from viamd_tpu.ops.neighbors import choose_grid, choose_grid_r

        box_np = c.sys.cell.extent()
        # radius-1 grid (cells ≥ cutoff wide) wins on TPU when the box
        # allows it: per-cell occupancy λ is ~8× that of a radius-2 grid,
        # so the Poisson capacity overhead (the padding the kernel burns
        # VPU time on) amortizes — measured 2.7× at 100k atoms. Fall back
        # to radius-2 (cells ≥ cutoff/2) for boxes under 3 cutoffs.
        radius = 1
        dims, cap_a = choose_grid_r(box_np, cutoff, idx_a.size, radius=1)
        _, cap_b = choose_grid_r(box_np, cutoff, idx_b.size, radius=1)
        if min(dims) < 3:
            radius = 2
            dims, cap_a = choose_grid(box_np, cutoff, idx_a.size)
            _, cap_b = choose_grid(box_np, cutoff, idx_b.size)
        use_cl = min(dims) >= (3 if radius == 1 else 5)
    if use_cl:
        box = jnp.diagonal(c._trace_basis)
        use_pallas = pl_route and RDF_BINS % 128 == 0
        if use_pallas:
            from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
            from viamd_tpu.ops.rdf import snap_capacity, stencil_offsets

            # same-selection RDF: half-stencil + doubled histogram (exact)
            sym = bool(
                idx_a.size == idx_b.size and np.array_equal(idx_a, idx_b)
            )
            # snap the B capacity DOWN to the kernel's 128-lane quantum
            # when the Poisson tail still clears 3.5σ (e.g. 14×62=868→896
            # burns 28 dead lanes; 14×54=756→768 drops ~3e-4 of cell
            # draws — the documented capacity-drop semantics, same as the
            # reference's fixed-size GPU cell lists) — 1.17× kernel win
            S_off = len(stencil_offsets(radius, sym))
            lam_b = idx_b.size / max(int(np.prod(dims)), 1)
            cap_b = snap_capacity(cap_b, lam_b, S_off)
            # slab streaming when the B neighborhood planes would exceed
            # a 2 GiB live budget (the 100M-atom scale the reference
            # reasons about, main.cpp:1134-1138): bounds plane memory to
            # slab windows at identical results
            from viamd_tpu.ops.rdf import choose_slab_rows

            slab_rows = choose_slab_rows(dims, S_off, cap_b, radius)
            # two-level one-hot MXU binning: 1.92 vs 3.87 ms/frame for the
            # unrolled block loop at the headline config, identical
            # histograms (tools/exp_binmode.py; docs/PERF.md r3)
            bin_mode = os.environ.get("VIAMD_TPU_RDF_BIN_MODE", "mxu")
            hist = pair_dist_histogram_pl(
                c._trace_x, jnp.asarray(idx_a), jnp.asarray(idx_b),
                box, RDF_BINS, cutoff, dims, cap_a, cap_b,
                radius=radius, symmetric=sym,
                widths=(
                    None
                    if tri
                    else tuple(float(w) for w in box_np / np.array(dims))
                ),
                slab_rows=None if c.atom_shard else slab_rows,
                basis=c._trace_basis if tri else None,
                interpret=pl_interp,
                slab_shard=c.atom_shard,
                bin_mode=bin_mode,
            )
            if c.atom_shard is not None:
                # intra-frame atom-axis parallelism: each device computed
                # its slab window's partial histogram — reduce over the
                # atoms mesh axis (requires tracing inside shard_map)
                hist = jax.lax.psum(hist, c.atom_shard[0])
        else:
            hist = rdf_ops.pair_dist_histogram_cl(
                c._trace_x, jnp.asarray(idx_a), jnp.asarray(idx_b),
                box, RDF_BINS, cutoff, dims, cap_a, cap_b,
                radius=radius,
                basis=c._trace_basis if tri else None,
                inv_basis=c._trace_inv if tri else None,
            )
    else:
        # dense all-pairs: TPU rides the compare-CDF formulation (no
        # native scatter); host backends scatter-add over the
        # selection-compacted (na, nb) block — ~50× at the 1ALA-500
        # regime (BASELINE config #1 runs the script on CPU), plus the
        # sparse-selection pair cut (192×128 of 448² for the reference
        # default script)
        if jax.default_backend() == "tpu":
            hist = rdf_ops.pair_dist_histogram(
                c._trace_x, jnp.asarray(wa), jnp.asarray(wb),
                c._trace_basis, c._trace_inv, RDF_BINS, cutoff,
            )
        else:
            hist = rdf_ops.pair_dist_histogram_scatter_idx(
                c._trace_x, jnp.asarray(idx_a), jnp.asarray(idx_b),
                jnp.asarray(np.asarray(wa)[np.asarray(idx_a)]),
                jnp.asarray(np.asarray(wb)[np.asarray(idx_b)]),
                c._trace_basis, c._trace_inv, RDF_BINS, cutoff,
            )
    spec = AccumSpec(
        kind="distribution",
        nbins=RDF_BINS,
        r_min=0.0,
        r_max=cutoff,
        x_unit="Å",
        count_a=float(wa.sum()),
        count_b=float(wb.sum()),
    )
    return AccumValue(hist, spec)


@builtin("sdf")
def _sdf(c: _Compiler, node, args):
    if len(args) != 3:
        raise ScriptError("sdf(ref_sel, target_sel, extent)", node.line, node.col)
    ref_sel = c._as_selection(args[0], node)
    target = c._as_selection(args[1], node)
    extent = float(args[2])
    c.static_warn(ref_sel, "sdf (reference structures)")
    c.static_warn(target, "sdf (target)")
    structs = ref_sel.structures
    idx, w, refc = sdf_ops.make_structure_inputs(
        [np.asarray(s) for s in structs], c.masses, c.x0
    )
    # vis payload (vis.sdf.{extent, structures, matrices} capability,
    # density_volume.cpp:180-270): enough to recompute per-frame
    # world→reference matrices host-side (ops.sdf.sdf_reference_frames)
    # and draw reference structures. Attached to the AccumSpec below so
    # it follows the property NAME (also mirrored into the
    # CompiledScript.visualization["sdf"] list, in sdf() call order).
    vis_rec = {
        "extent": float(args[2]),
        "structures": [np.asarray(s) for s in structs],
        "struct_idx": np.asarray(idx),
        "struct_w": np.asarray(w),
        "ref_centered": np.asarray(refc),
    }
    c.vis["sdf"].append(vis_rec)
    tw = c.dense_weights(target, masses=False)
    # Large systems: few structures over many targets route through the
    # sort-free (S, n_t) bounding-sphere pair test (ops.sdf
    # sdf_accumulate_pairs — replaces a 10.6 ms 667k-atom cell-list sort
    # with ~0.6 ms of fused VPU compares at config #4, docs/PERF.md r5);
    # many-structure selections keep the cell-list route, whose sort
    # amortizes over structures.
    use_cl = False
    tri_basis = None
    idx_t = target.mask.indices()
    use_pairs = (
        c.sys.cell.is_periodic
        and c.n >= 8192
        and idx_t.size > 0
        and len(structs) > 0
        and len(structs) * int(idx_t.size) <= 150_000_000
    )
    if use_pairs:
        ortho = c.sys.cell.is_orthorhombic
        if ortho:
            box_np = c.sys.cell.extent()
            B0p = None
        else:
            B0p = np.asarray(c.sys.cell.basis, np.float64)
            det = abs(np.linalg.det(B0p))
            box_np = np.full(3, det ** (1.0 / 3.0))
        cnt0 = sdf_ops.sdf_frame0_ball_count(
            np.asarray(c.x0)[np.asarray(idx_t)], np.asarray(c.x0),
            np.asarray(idx), np.asarray(w), box_np, extent, SDF_DIMS,
            basis=B0p,
        )
        pair_cap = sdf_ops.sdf_pair_capacity(
            len(structs), int(idx_t.size), box_np, extent, SDF_DIMS,
            per_struct_count=cnt0,
        )
        # global pre-splat compaction on top of the per-structure ball
        # caps: only ~37% of the coverage ball lands in the ±extent cube,
        # and splat HBM traffic scales with slot count
        support0 = sdf_ops.sdf_frame0_support_count(
            np.asarray(c.x0)[np.asarray(idx_t)], np.asarray(c.x0),
            np.asarray(idx), np.asarray(w), np.asarray(refc),
            box_np, extent, SDF_DIMS, basis=B0p,
        )
        compact_cap = sdf_ops.sdf_compact_capacity(
            len(structs), int(idx_t.size), box_np, extent, SDF_DIMS,
            support_count=support0,
        )
        grid = sdf_ops.sdf_accumulate_pairs(
            c._trace_x, jnp.asarray(tw),
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
            extent, SDF_DIMS, c._trace_basis, c._trace_inv,
            jnp.asarray(idx_t), pair_cap, compact_cap=compact_cap,
        )
        spec = AccumSpec(
            kind="volume",
            dims=SDF_DIMS,
            extent=extent,
            x_unit="Å",
            n_structures=len(structs),
            vis=vis_rec,
        )
        return AccumValue(grid, spec)
    if c.sys.cell.is_periodic and c.n >= 8192:
        from viamd_tpu.ops.neighbors import (
            choose_grid_r, choose_grid_triclinic,
        )

        ortho = c.sys.cell.is_orthorhombic
        if ortho:
            box_np = c.sys.cell.extent()
            # cell width ≥ √3·extent ⇒ a 27-cell stencil covers the
            # coverage ball; the cell list bins only TARGET atoms (smaller
            # sort + tighter Poisson capacity — fewer dead candidates).
            # 3.5σ tail: candidate rows (the gather + splat input) scale
            # linearly with the cap here (no lane quantum on the XLA side)
            # and the ~3e-4 per-draw drop rate matches the rdf path
            cl_dims, cl_cap = choose_grid_r(
                box_np, 1.7320508 * extent, idx_t.size, radius=1, tail=3.5
            )
            frac0 = None
        else:
            # TRICLINIC: bin in fractional space (same XLA machinery);
            # volume-equivalent box for the uniform Poisson floor
            B0 = np.asarray(c.sys.cell.basis, np.float64)
            det = abs(np.linalg.det(B0))
            box_np = np.full(3, det ** (1.0 / 3.0))
            cl_dims, cl_cap = choose_grid_triclinic(
                B0, 1.7320508 * extent, idx_t.size, radius=1, tail=3.5
            )
            frac0 = np.asarray(c.x0) @ np.linalg.inv(B0)
        # the Poisson cap assumes uniform target density; clustered
        # selections (within(r, ref) etc.) concentrate targets into few
        # cells — floor the capacity by the frame-0 MEASURED max cell
        # occupancy ×1.5 (+slack for drift) so the cell list never
        # silently drops the cluster
        if idx_t.size:
            xt0 = np.asarray(c.x0)[np.asarray(idx_t)]
            f0 = (
                np.mod(xt0 / box_np, 1.0)
                if ortho
                else np.mod(frac0[np.asarray(idx_t)], 1.0)
            )
            cell3 = np.floor(f0 * np.array(cl_dims)).astype(np.int64)
            cell3 = np.minimum(cell3, np.array(cl_dims) - 1)
            flat = (
                cell3[:, 0] * cl_dims[1] + cell3[:, 1]
            ) * cl_dims[2] + cell3[:, 2]
            occ0 = int(np.bincount(flat).max()) if flat.size else 0
            cl_cap = max(cl_cap, int(1.5 * occ0) + 8)
        if ortho:
            stencil = sdf_ops.make_sdf_stencil(
                extent, box_np / np.array(cl_dims)
            )
        else:
            stencil = sdf_ops.make_sdf_stencil_triclinic(
                extent, B0, cl_dims
            )
            tri_basis = True
        span = int(stencil.max() - stencil.min()) + 1
        use_cl = span <= min(cl_dims)
    if use_cl:
        # pre-splat compaction: the stencil ball over-covers the ±extent
        # cube ~25× at headline scale; pack in-support points into a
        # static buffer so splat HBM traffic tracks REAL points, not
        # candidate slots. Sized from BOTH the uniform Poisson floor and
        # the frame-0 exact in-support count (clustered target
        # selections like within(r, ref) far exceed bulk density)
        support0 = sdf_ops.sdf_frame0_support_count(
            np.asarray(c.x0)[np.asarray(idx_t)], np.asarray(c.x0),
            np.asarray(idx), np.asarray(w), np.asarray(refc),
            box_np, extent, SDF_DIMS,
            basis=None if tri_basis is None else B0,
        )
        compact_cap = sdf_ops.sdf_compact_capacity(
            len(structs), int(idx_t.size), box_np, extent, SDF_DIMS,
            support_count=support0,
        )
        grid = sdf_ops.sdf_accumulate_cl(
            c._trace_x, jnp.asarray(tw),
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
            extent, SDF_DIMS, jnp.diagonal(c._trace_basis),
            cl_dims, cl_cap, stencil,
            idx_t=jnp.asarray(idx_t),
            compact_cap=compact_cap,
            basis=None if tri_basis is None else c._trace_basis,
        )
    else:
        grid = sdf_ops.sdf_accumulate(
            c._trace_x, jnp.asarray(tw),
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
            extent, SDF_DIMS, c._trace_basis, c._trace_inv,
        )
    spec = AccumSpec(
        kind="volume",
        dims=SDF_DIMS,
        extent=extent,
        x_unit="Å",
        n_structures=len(structs),
        vis=vis_rec,
    )
    return AccumValue(grid, spec)


# -- math --------------------------------------------------------------------


def _math1(jfn, nfn):
    def fn(c: _Compiler, node, args):
        (v,) = args
        if isinstance(v, (int, float, np.ndarray)):
            return nfn(v)
        if isinstance(v, DynValue):
            return DynValue(jfn(v.data), v.unit)
        raise ScriptError("expected numeric argument", node.line, node.col)

    return fn


for _nm, _jf, _nf in [
    ("sqrt", jnp.sqrt, np.sqrt),
    ("cbrt", jnp.cbrt, np.cbrt),
    ("abs", jnp.abs, np.abs),
    ("floor", jnp.floor, np.floor),
    ("ceil", jnp.ceil, np.ceil),
    ("cos", jnp.cos, np.cos),
    ("sin", jnp.sin, np.sin),
    ("tan", jnp.tan, np.tan),
    ("asin", jnp.arcsin, np.arcsin),
    ("acos", jnp.arccos, np.arccos),
    ("atan", jnp.arctan, np.arctan),
    ("log", jnp.log, np.log),
    ("exp", jnp.exp, np.exp),
    ("log2", jnp.log2, np.log2),
    ("exp2", jnp.exp2, np.exp2),
    ("log10", jnp.log10, np.log10),
]:
    BUILTINS[_nm] = _math1(_jf, _nf)


def _math2(jfn, nfn):
    def fn(c: _Compiler, node, args):
        a, b = args
        if isinstance(a, DynValue) or isinstance(b, DynValue):
            av = a.data if isinstance(a, DynValue) else a
            bv = b.data if isinstance(b, DynValue) else b
            return DynValue(jfn(av, bv))
        return nfn(a, b)

    return fn


BUILTINS["pow"] = _math2(jnp.power, np.power)
BUILTINS["atan2"] = _math2(jnp.arctan2, np.arctan2)


@builtin("dot")
def _dot(c, node, args):
    a, b = args
    av = a.data if isinstance(a, DynValue) else jnp.asarray(a)
    bv = b.data if isinstance(b, DynValue) else jnp.asarray(b)
    return DynValue(jnp.sum(av * bv, axis=-1))


@builtin("cross")
def _cross(c, node, args):
    a, b = args
    av = a.data if isinstance(a, DynValue) else jnp.asarray(a)
    bv = b.data if isinstance(b, DynValue) else jnp.asarray(b)
    return DynValue(jnp.cross(av, bv))


def _vecn(n):
    def fn(c, node, args):
        if len(args) != n:
            raise ScriptError(f"vec{n} expects {n} args", node.line, node.col)
        vals = [
            a.data if isinstance(a, DynValue) else jnp.float32(a) for a in args
        ]
        return DynValue(jnp.stack(vals, axis=-1), is_coord=(n == 3))

    return fn


BUILTINS["vec2"] = _vecn(2)
BUILTINS["vec3"] = _vecn(3)
BUILTINS["vec4"] = _vecn(4)
BUILTINS["mul"] = _math2(jnp.multiply, np.multiply)


@builtin("import")
def _import(c: _Compiler, node, args):
    """import("table.xvg"/".csv"/".edr") → static column array
    (viamd.h:86 SCRIPT_IMPORT_FILE_EXTENSIONS, viamd.cpp:2833-2858)."""
    (path,) = args
    if not isinstance(path, str):
        raise ScriptError("import(path)", node.line, node.col)
    if path.endswith(".edr"):
        from viamd_tpu.io.edr import read_edr

        cols, _names = read_edr(path)
    elif path.endswith(".xvg"):
        from viamd_tpu.io.xvg import read_xvg

        cols, _meta = read_xvg(path)
    elif path.endswith(".csv"):
        from viamd_tpu.io.csv import read_csv

        cols, _hdr = read_csv(path)
    else:
        raise ScriptError(f"import: unsupported file '{path}'", node.line, node.col)
    return np.asarray(cols, np.float32)
