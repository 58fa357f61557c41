"""Slot-count roofline for the headline RDF kernel (VERDICT r4 #3b).

Establishes how close the shipped Pallas pair-histogram kernel runs to
the hardware floor:

1. measures the chip's attainable VPU rate with elementwise
   microkernels shaped like the kernel's actual op mix (f32 FMA chain;
   int compare + bf16 cast chain);
2. counts the kernel's PROCESSED pair slots per frame exactly (same
   cell list + occupancy gating as the kernel: per-block merged-pass
   count x 128 A-rows x Cc candidate lanes);
3. counts VPU ops/slot from the mxu-mode kernel body (documented
   below);
4. compares slots x ops/slot / VPU_rate against the measured kernel
   time.

All timings are K-iteration jitted fori_loops with the input perturbed
by the carry, null-loop subtracted (CLAUDE.md timing discipline).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 32
N_WATERS = 33_334  # the bench.py headline config


def loop_time(body, *args):
    """Seconds/iter for body(x) in a K-loop, carry-perturbed."""

    @jax.jit
    def many(x0, *rest):
        def step(i, carry):
            xi = x0 + carry * 1e-30
            return jnp.sum(body(xi, *rest)).astype(jnp.float32) + carry * 0

        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

    float(many(*args))  # compile + drain
    t0 = time.time()
    float(many(*args))
    return (time.time() - t0) / K


def measure_vpu_rates():
    """Attainable VPU throughput for the kernel's two op families.

    Work per iteration must dwarf the ~31 ms tunnel RTT split over K and
    the HBM stream of the operand (the r5 first cut used 33 M ops/iter —
    BELOW the noise floor, producing negative null-subtracted rates).
    Sizes here give ≳5×10⁸ ops/iter (≳0.5 ms at a 1 Tops/s VPU)."""
    R = 256
    x = jnp.ones((8, 2048 * 128), jnp.float32) * 1.00001  # 2M els, 8 MB

    def fma_chain(x):
        y = x
        for _ in range(R):
            y = y * 1.0000001 + 0.0000001
        return y

    null = loop_time(lambda x: x[:1, :1], x)
    t = loop_time(fma_chain, x) - null
    fma_ops = R * x.size  # FMA = 1 issued op/lane (mul+add fused)
    fma_rate = fma_ops / t

    # int32 compare + bf16 cast chain (the one-hot binning op mix)
    xi = jnp.arange(x.size, dtype=jnp.int32).reshape(8, -1)

    def cmp_chain(x):
        acc = jnp.zeros(x.shape, jnp.bfloat16)
        for r in range(R):
            acc = acc + (x == r).astype(jnp.bfloat16)
        return acc

    t2 = loop_time(cmp_chain, xi) - null
    cmp_rate = (R * xi.size) / t2  # compare+cast+add counted as ONE slot-op
    return fma_rate, cmp_rate


def headline_kernel_accounting():
    """Processed slots/frame + measured kernel time at the headline config."""
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import build_cell_list, choose_grid_r
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.rdf import snap_capacity, stencil_offsets

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box_np = np.asarray(sys_.cell.extent())
    box = jnp.asarray(box_np, jnp.float32)
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))
    dims, cap = choose_grid_r(box_np, 10.0, idx_o.size, radius=1)
    offs = stencil_offsets(1, True)
    S_off = len(offs)
    lam = idx_o.size / float(np.prod(dims))
    cap_b = snap_capacity(cap, lam, S_off)
    widths = tuple(float(w) for w in box_np / np.array(dims))

    # mirror the kernel's static config (ka, merged passes, M=1)
    ka = 8 if cap <= 64 else 16
    n_pass = -(-cap // ka)
    cap_a_pad = n_pass * ka
    G = 128 // ka

    # exact processed-slot count: per cell block (G cells), passes run
    # while block max occupancy > pass * ka; each pass touches 128 A rows
    # x Cc lanes. Cc = padded S_off*cap_b lane width.
    cl = build_cell_list(x[idx_o], box, dims, cap_a_pad)
    occ = np.asarray(cl.starts[1:] - cl.starts[:-1])
    ncells = occ.size
    occ_pad = np.pad(occ, (0, (-ncells) % G))
    blk_occ = occ_pad.reshape(-1, G).max(axis=1)
    Cc = -(-S_off * cap_b // 128) * 128
    passes = np.ceil(np.minimum(blk_occ, cap_a_pad) / ka).astype(np.int64)
    slots = int(passes.sum()) * 128 * Cc

    def full(xx):
        # bin_mode="mxu" = the production route (script compiler default)
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, 128, 10.0, dims, cap_a_pad, cap_b,
            radius=1, symmetric=True, widths=widths, bin_mode="mxu",
        )

    null = loop_time(lambda x: x[:1, :1] * 0.0, x)
    t_full = loop_time(full, x) - null

    # cell-list + table/planes prep (everything before the pallas_call)
    def prep(xx):
        cl = build_cell_list(xx[idx_o], box, dims, cap_a_pad)
        return cl.starts.astype(jnp.float32)

    t_prep = loop_time(prep, x) - null
    return slots, t_full, t_prep, dict(
        dims=dims, cap_b=cap_b, cap_a_pad=cap_a_pad, S_off=S_off, ka=ka,
        n_pass=n_pass, Cc=Cc, ncells=ncells, lam=lam,
    )


def main():
    fma_rate, cmp_rate = measure_vpu_rates()
    print(f"VPU attainable: f32 FMA {fma_rate/1e9:.1f} Gop/s, "
          f"compare+cast {cmp_rate/1e9:.1f} Gop/s", flush=True)

    slots, t_full, t_prep, cfg = headline_kernel_accounting()
    t_kernel = t_full - t_prep
    print(f"config: {cfg}", flush=True)
    print(f"slots/frame {slots/1e6:.1f} M  rdf full {t_full*1e3:.2f} ms  "
          f"prep {t_prep*1e3:.2f} ms  kernel ~{t_kernel*1e3:.2f} ms  "
          f"→ {slots/t_kernel/1e9:.2f} Gslot/s", flush=True)

    # VPU ops per slot, counted from _hist_kernel mxu mode
    # (viamd_tpu/ops/pallas_rdf.py):
    #   dx,dy,dz subtractions                       3
    #   dist: 2 FMA + 1 mul + sqrt(~4 VPU ops)      7
    #   bin_id: mul + f32→i32 cast                  2
    #   blk_c shift, sub_c and, id cmp/or/where     5
    #   coarse one-hot: NC=8 compare+cast           8   (cmp family)
    #   fine one-hot: 16 compare+cast              16   (cmp family)
    # arithmetic family ≈ 17 ops, compare family ≈ 24 ops.
    # The (NC,Sc)@(16,Sc)ᵀ bf16 contraction adds NC·16=128 MXU MACs/slot
    # — ≲0.05 ms over the whole frame at the MXU's ~100 T MAC/s, so the
    # floor model is VPU-only.
    arith_ops, cmp_ops = 17, 24
    floor = slots * (arith_ops / fma_rate + cmp_ops / cmp_rate)
    print(f"roofline floor: {floor*1e3:.2f} ms "
          f"(arith {slots*arith_ops/fma_rate*1e3:.2f} + "
          f"one-hot {slots*cmp_ops/cmp_rate*1e3:.2f})", flush=True)
    print(f"kernel vs floor: {floor / t_kernel * 100:.0f}% of "
          f"speed-of-light", flush=True)


if __name__ == "__main__":
    main()
