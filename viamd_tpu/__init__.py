"""viamd_tpu — a TPU-native molecular-dynamics visual-analysis framework.

A from-scratch rebuild of the capabilities of VIAMD (scanberg/viamd): molecular
system + trajectory data model, file-format loaders, the VIAMD analysis
scripting language compiled to JAX compute graphs, Pallas analysis kernels
(PBC distances, RDF/SDF, density volumes, shape-space eigen analysis), a
headless Pallas volume ray-marcher / molecule renderer, and a workspace layer —
all designed TPU-first: jit + vmap over trajectory frames, shard_map over an
ICI device mesh for multi-chip trajectory sweeps.

Reference capability map: /root/reference (scanberg/viamd); see SURVEY.md.
"""

__version__ = "0.1.0"

from viamd_tpu.core.bitfield import Bitfield
from viamd_tpu.core.system import System, UnitCell


def __getattr__(name):
    # lazy heavyweight entry points: `viamd_tpu.Session()` /
    # `viamd_tpu.load_file(...)` without importing jax at package import
    if name == "Session":
        from viamd_tpu.app.session import Session

        return Session
    if name == "load_file":
        from viamd_tpu.io import load_file

        return load_file
    raise AttributeError(f"module 'viamd_tpu' has no attribute '{name}'")


__all__ = [
    "Bitfield", "Session", "System", "UnitCell", "load_file", "__version__",
]
