"""Trajectory evaluation engine: chunked, jitted, vmapped, mesh-sharded.

Rebuild of md_script_eval_* (reference capability: SURVEY.md §3.4 — eval
objects sized to the trajectory, parallel frame-range evaluation,
interruption, progress, completed-frame masks, aggregates)."""

from viamd_tpu.eval.engine import Evaluator, EvalResult, evaluate

__all__ = ["Evaluator", "EvalResult", "evaluate"]
