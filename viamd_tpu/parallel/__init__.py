"""Device-mesh parallelism helpers.

TPU-native replacement for the reference's single-node parallelism
(enkiTS thread pool over frame ranges / atom ranges, SURVEY.md §2.4):
frames are the data-parallel axis sharded over ICI; histogram/volume
accumulators all-reduce across shards.
"""

from viamd_tpu.parallel.mesh import frames_mesh, shard_batch, mesh_devices

__all__ = ["frames_mesh", "shard_batch", "mesh_devices"]
