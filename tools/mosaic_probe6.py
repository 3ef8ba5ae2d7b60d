#!/usr/bin/env python
"""Probe 6: the mega-kernel's two core patterns, at production scale.

Probe 5 established that VMEM 2D arrays pad the lane dim to 128, so
narrow [M, F] buffers cost M*512 bytes — the crashes were VMEM OOM.
Patterns that respect the padding:

  pgat   lane-packed gather: idx [M/G, G<=128] (G static-lane scalar
         reads per packed row), table [S, <=128] (one slot per row, all
         fields in lanes), out [M/G, G*F] written at static lane offsets.
         M=131072, S=98304, F=32, G=4: VMEM 50+17+17 MB.
  pcum   exact flat [98304] i32 prefix sum: transpose + sublane scan +
         row-offset broadcast (all static slicing, no rolls).
  gat1d  scalar read from a 1D VMEM ref (layout probe).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "bench_data", "xla_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

i32 = jnp.int32


def report(name, ok, note):
    print(f"{name:8s} {'PASS' if ok else 'FAIL':4s} {note}", flush=True)


def steady(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return out, (time.time() - t0) / reps


def p_pgat():
    M, S, F, G = 131072, 98304, 32, 4
    MR = M // G

    def kern(tbl_ref, idx_ref, o_ref):
        def body(r, _):
            for k in range(G):
                j = idx_ref[r, k]
                o_ref[pl.ds(r, 1), k * F:(k + 1) * F] = tbl_ref[
                    pl.ds(j, 1), :F
                ]
            return 0

        jax.lax.fori_loop(0, MR, body, 0)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((MR, G * F), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(tbl, idx)

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (S, F)), i32)
    idx = jnp.asarray(rng.integers(0, S, (MR, G)), i32)
    try:
        out, dt = steady(f, tbl, idx)
        want = np.asarray(tbl)[np.asarray(idx).reshape(-1)].reshape(MR, G * F)
        ok = np.array_equal(np.asarray(out), want)
        report("pgat", ok, f"M={M} F={F} G={G} {dt*1e9/M:.2f} ns/gather "
               f"({dt*1e3:.3f} ms)")
    except Exception as e:
        report("pgat", False, str(e)[:200])


def p_pcum():
    R, C = 768, 128  # 98304 flat

    def kern(x_ref, o_ref):
        x = x_ref[:]
        xt = x.T  # [C, R]; xt[c, r] = x[r, c]
        s = 1
        while s < C:
            xt = xt + jnp.concatenate(
                [jnp.zeros((s, R), i32), xt[: C - s, :]], axis=0
            )
            s *= 2
        lane_pref = xt.T  # inclusive prefix along lanes within each row
        rowsum = lane_pref[:, C - 1:C]  # [R, 1]
        s = 1
        rp = rowsum
        while s < R:
            rp = rp + jnp.concatenate(
                [jnp.zeros((s, 1), i32), rp[: R - s, :]], axis=0
            )
            s *= 2
        excl_row = rp - rowsum  # exclusive row prefix
        o_ref[:] = lane_pref + excl_row
    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 5, (R, C)), i32)
    try:
        out, dt = steady(f, x)
        want = np.cumsum(np.asarray(x).reshape(-1), dtype=np.int32).reshape(R, C)
        ok = np.array_equal(np.asarray(out), want)
        report("pcum", ok, f"[{R*C}] inclusive {dt*1e6:.1f} us/call")
    except Exception as e:
        report("pcum", False, str(e)[:200])


def p_gat1d():
    S, M = 98304, 8192

    def kern(tbl_ref, idx_ref, o_ref):
        def body(i, _):
            j = idx_ref[i, 0]
            o_ref[pl.ds(i, 1), 0] = tbl_ref[j]
            return 0

        jax.lax.fori_loop(0, M, body, 0)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, 1), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (S,)), i32)
    idx = jnp.asarray(rng.integers(0, S, (M, 1)), i32)
    try:
        out, dt = steady(f, tbl, idx)
        want = np.asarray(tbl)[np.asarray(idx)[:, 0]]
        ok = np.array_equal(np.asarray(out)[:, 0], want)
        report("gat1d", ok, f"1D table scalar reads {dt*1e9/M:.2f} ns/idx")
    except Exception as e:
        report("gat1d", False, str(e)[:200])


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for n in sys.argv[1:] or ["pgat", "pcum", "gat1d"]:
        {"pgat": p_pgat, "pcum": p_pcum, "gat1d": p_gat1d}[n]()
