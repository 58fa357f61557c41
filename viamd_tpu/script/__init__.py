"""The VIAMD analysis scripting language, compiled to JAX compute graphs.

TPU-native rebuild of mdlib's md_script.h (reference capability surface:
SURVEY.md §2.3/§3.4 — IR compile with system+trajectory context, per-frame
property evaluation, temporal/distribution/volume properties, aggregates,
visualization payloads) and md_filter.h (atom-selection queries returning
bitfields).

Architecture difference from the reference (interpreted per-frame IR walk on
a CPU thread pool): here the typed IR partial-evaluates all static
(frame-independent) subexpressions — selections, structure contexts, constant
math — on the host, then emits ONE pure per-frame function
`frame_fn(x, basis, inv_basis) -> {prop: value}` built from viamd_tpu.ops
kernels with static gather indices/masks baked in. The eval engine jits,
vmaps over frame batches, and shard_maps over the ICI mesh.
"""

from viamd_tpu.script.compiler import compile_script, CompiledScript
from viamd_tpu.script.parser import parse, ScriptError
from viamd_tpu.script.filterlang import evaluate_filter

__all__ = [
    "compile_script",
    "CompiledScript",
    "parse",
    "ScriptError",
    "evaluate_filter",
]
