"""Core host-side data model: system schema, bitfields, unit cell, elements.

TPU-native counterpart of mdlib's L0/L1 layers (reference: ext/mdlib core/*,
md_system.h — see SURVEY.md §1-2). Host metadata lives in NumPy; per-frame
coordinate state moves to device as JAX arrays in the eval engine.
"""
