#!/usr/bin/env python
"""Probe which Mosaic constructs crash the remote compile helper.

Each probe is a minimal Pallas kernel exercising ONE construct from the
bin-loop variants that failed with HTTP 500 (pack8 / mxu / factored), at
tiny shapes so VMEM pressure cannot be the cause unless stated.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

R, C = 128, 256  # tiny tile


def _run(name, kernel, out_shape=None, nin=1):
    x = jnp.asarray(np.random.RandomState(0).rand(R, C).astype(np.float32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape
            or jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(*([x] * nin))
        s = float(jnp.sum(out))
        print(f"{name:28s} OK  sum={s:.1f}", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def p_varshift(x_ref, o_ref):
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    sv = jnp.left_shift(jnp.int32(1), jnp.left_shift(b & 3, 3))
    o_ref[...] = sv.astype(jnp.float32)


def p_constshift(x_ref, o_ref):
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    f = b & 3
    sv = jnp.where(
        f == 0, 1, jnp.where(f == 1, 1 << 8, jnp.where(f == 2, 1 << 16,
                                                       1 << 24))
    )
    o_ref[...] = sv.astype(jnp.float32)


def p_dot_t(x_ref, o_ref):
    # C(8,S) contract F(16,S) over dim 1 (transposed-RHS matmul)
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    S = R * C
    blkf = jnp.reshape(b >> 4, (1, S))
    subf = jnp.reshape(b & 15, (1, S))
    Cm = (blkf == jax.lax.broadcasted_iota(jnp.int32, (8, S), 0)).astype(
        jnp.bfloat16)
    Fm = (subf == jax.lax.broadcasted_iota(jnp.int32, (16, S), 0)).astype(
        jnp.bfloat16)
    h = jax.lax.dot_general(Cm, Fm, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = jnp.zeros((R, C), jnp.float32)
    o_ref[0:8, 0:16] = h


def p_dot_plain(x_ref, o_ref):
    # C(8,S) @ F(S,16) standard orientation
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    S = R * C
    blkf = jnp.reshape(b >> 4, (1, S))
    subf = jnp.reshape(b & 15, (S, 1))
    Cm = (blkf == jax.lax.broadcasted_iota(jnp.int32, (8, S), 0)).astype(
        jnp.bfloat16)
    Fm = (subf == jax.lax.broadcasted_iota(jnp.int32, (S, 16), 1)).astype(
        jnp.bfloat16)
    h = jnp.dot(Cm, Fm, preferred_element_type=jnp.float32)
    o_ref[...] = jnp.zeros((R, C), jnp.float32)
    o_ref[0:8, 0:16] = h


def p_bf16_mul_reduce(x_ref, o_ref):
    # the factored variant's WG * SJ product + sublane reduce
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    w = jnp.ones((R, C), jnp.bfloat16)
    sj = jnp.where((b & 15) == 3, w, jnp.bfloat16(0))
    wg = ((b >> 4) == 2).astype(jnp.bfloat16)
    r = jnp.sum(wg * sj, axis=0, keepdims=True, dtype=jnp.bfloat16)
    o_ref[...] = jnp.zeros((R, C), jnp.float32)
    o_ref[0:1, :] = r.astype(jnp.float32)


def p_int32_sum_axis0(x_ref, o_ref):
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    s = jnp.sum(jnp.where(b == 3, jnp.int32(257), 0), axis=0, keepdims=True)
    o_ref[...] = jnp.zeros((R, C), jnp.float32)
    o_ref[0:1, :] = s.astype(jnp.float32)


def p_bf16_mul_reduce_f32(x_ref, o_ref):
    # same product but f32 accumulate
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    w = jnp.ones((R, C), jnp.bfloat16)
    sj = jnp.where((b & 15) == 3, w, jnp.bfloat16(0))
    wg = ((b >> 4) == 2).astype(jnp.bfloat16)
    r = jnp.sum((wg * sj).astype(jnp.float32), axis=0, keepdims=True)
    o_ref[...] = jnp.zeros((R, C), jnp.float32)
    o_ref[0:1, :] = r


def p_bf16_where_reduce(x_ref, o_ref):
    # the shipped base construct (no product): should pass
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    w = jnp.ones((R, C), jnp.bfloat16)
    r = jnp.sum(jnp.where(b == 3, w, jnp.bfloat16(0)), axis=0,
                keepdims=True, dtype=jnp.bfloat16)
    o_ref[...] = jnp.zeros((R, C), jnp.float32)
    o_ref[0:1, :] = r.astype(jnp.float32)


def p_scratch4(x_ref, o_ref, scratch):
    # 4-row sublane-slice scratch writes (pack8's unpack store)
    b = (x_ref[...] * 12.8).astype(jnp.int32)
    for k in range(4):
        word = jnp.sum(jnp.where(b == k, jnp.int32(257), 0), axis=0,
                       keepdims=True)
        blk = jnp.concatenate([word & 0xFF, (word >> 8) & 0xFF,
                               (word >> 16) & 0xFF, (word >> 24) & 0xFF],
                              0).astype(jnp.float32)
        scratch[k * 4:(k + 1) * 4, :] = blk
    o_ref[...] = jnp.zeros((R, C), jnp.float32)
    o_ref[0:16, :] = scratch[0:16, :]


def _run_scratch(name, kernel):
    x = jnp.asarray(np.random.RandomState(0).rand(R, C).astype(np.float32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
            scratch_shapes=[pltpu.VMEM((16, C), jnp.float32)],
        )(x)
        print(f"{name:28s} OK  sum={float(jnp.sum(out)):.1f}", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or [
        "varshift", "constshift", "dot_t", "dot_plain", "bf16_mul_reduce",
        "int32_sum_axis0",
    ]
    probes = {
        "bf16_mul_reduce_f32": p_bf16_mul_reduce_f32,
        "bf16_where_reduce": p_bf16_where_reduce,
        "varshift": p_varshift,
        "constshift": p_constshift,
        "dot_t": p_dot_t,
        "dot_plain": p_dot_plain,
        "bf16_mul_reduce": p_bf16_mul_reduce,
        "int32_sum_axis0": p_int32_sum_axis0,
    }
    for k in which:
        if k == "scratch4":
            _run_scratch(k, p_scratch4)
        else:
            _run(k, probes[k])