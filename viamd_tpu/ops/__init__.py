"""Analysis kernels: PBC geometry, reductions, histograms, densities.

TPU-native rebuild of mdlib's md_util.h analysis layer (SURVEY.md §2.3):
every kernel is a pure function over float32 arrays, jittable and vmappable
over trajectory frames; hot pairwise paths have Pallas implementations.
Host-only helpers (bond inference at load time) stay NumPy.
"""
