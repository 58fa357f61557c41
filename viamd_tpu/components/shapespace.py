"""Shapespace component: per-structure shape descriptors over the trajectory.

Rebuild of src/components/shapespace/shapespace.cpp (reference: filter →
per-structure bitfields (md_filter_evaluate :365), per frame per structure:
PBC-aware COM → deperiodize → 3×3 covariance → eigenvalues →
(linear, planar, isotropic) weights (:388-440) → barycentric scatter plot +
XVG/CSV export).

TPU formulation: structures pack into padded (S,K) index/weight tables once
(static selections), the weights kernel vmaps over structures inside the
frame program, and frames run through the standard Evaluator dispatch path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from viamd_tpu.app.events import EventType


class ShapespaceComponent:
    name = "shapespace"

    def __init__(self, session):
        self.session = session
        self.filter = "all"
        self._result: Optional[np.ndarray] = None  # (F, S, 3)
        session.events.subscribe(EventType.SYSTEM_INIT, self._invalidate)
        session.events.subscribe(EventType.TRAJECTORY_INIT, self._invalidate)

    def _invalidate(self, _ev=None):
        self._result = None

    def evaluate(
        self, filter_expr: Optional[str] = None, frame_range=None,
        progress=None, interrupt=None,
    ) -> np.ndarray:
        """(F, S, 3) (lin, plan, iso) weights per frame per structure."""
        session = self.session
        if filter_expr is not None:
            self.filter = filter_expr
        from viamd_tpu.script.filterlang import evaluate_filter_structures

        sel = evaluate_filter_structures(
            self.filter, session.system, session.stored_selections
        )
        if sel.n_structures == 0:
            raise ValueError(f"filter '{self.filter}' matches nothing")

        import jax
        import jax.numpy as jnp

        from viamd_tpu.ops import covariance as cov_ops
        from viamd_tpu.ops.pbc import inv_basis_of

        idx, w = sel.packed(session.system.mass)
        idxj, wj = jnp.asarray(idx), jnp.asarray(w)

        @jax.jit
        def frame_weights(x, basis):
            inv = inv_basis_of(basis)
            return jax.vmap(
                lambda ii, ww: cov_ops.shape_weights(x[ii], ww, basis, inv)
            )(idxj, wj)

        traj = session.trajectory
        if traj is None:
            coords = session.system.coords()[None]
            cells = np.asarray(session.system.cell.basis)[None]
            frames = [0]
        else:
            frames = (
                list(frame_range)
                if frame_range is not None
                else list(range(traj.num_frames))
            )
            coords, cells = traj.load_frames(frames)
        rows = []
        for k in range(len(frames)):
            if interrupt is not None and interrupt():
                break
            rows.append(frame_weights(jnp.asarray(coords[k]), jnp.asarray(cells[k])))
            if progress:
                progress((k + 1) / len(frames))
        self._result = np.asarray(jnp.stack(rows)) if rows else np.zeros((0, len(idx), 3), np.float32)
        return self._result

    @property
    def result(self) -> Optional[np.ndarray]:
        return self._result

    def scatter_points(self) -> np.ndarray:
        """(F·S, 2) barycentric plot coordinates in the shape triangle
        (linear at (0,0), planar at (1,0), isotropic at (0.5, √3/2))."""
        if self._result is None:
            self.evaluate()
        w = self._result.reshape(-1, 3)
        corners = np.array(
            [[0.0, 0.0], [1.0, 0.0], [0.5, 0.8660254]], np.float32
        )
        return w @ corners

    def export_csv(self, path_or_buf):
        """Per-frame per-structure weights → CSV (the shapespace export)."""
        from viamd_tpu.io.csv import write_csv

        if self._result is None:
            self.evaluate()
        F, S, _ = self._result.shape
        cols = [np.repeat(np.arange(F), S)]
        header = ["frame"]
        flat = self._result.reshape(F * S, 3)
        for name, c in zip(("lin", "plan", "iso"), flat.T):
            cols.append(c)
            header.append(name)
        write_csv(path_or_buf, np.stack(cols), header)

    def export_xvg(self, path_or_buf):
        """Per-frame per-structure weights → XVG (the reference exports
        both XVG and CSV from the shapespace window, shapespace.cpp)."""
        from viamd_tpu.io.xvg import write_xvg

        if self._result is None:
            self.evaluate()
        F, S, _ = self._result.shape
        flat = self._result.reshape(F * S, 3)
        cols = np.concatenate(
            [np.repeat(np.arange(F), S)[None].astype(np.float64), flat.T]
        )
        write_xvg(
            path_or_buf, cols,
            title="shape space weights",
            xaxis="frame", yaxis="weight",
            legends=["lin", "plan", "iso"],
        )
