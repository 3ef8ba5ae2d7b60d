#!/usr/bin/env python
"""Mosaic capability + cost probes for the mega-kernel (docs/MEGAKERNEL.md).

Each probe compiles a tiny Pallas kernel on the real TPU and reports
PASS/FAIL plus a steady-state per-call time (median of a scanned chain,
loop-carried so XLA cannot hoist the work).  Run serially — never while
another TPU process is live (CLAUDE.md: runs share one chip).

Probes:
  take0   take_along_axis(x, idx, axis=0) in-kernel (sublane gather)
  take1   take_along_axis(x, idx, axis=1) in-kernel (lane gather)
  flatg   arbitrary flat gather tbl[idx] via replicated-column take0
  sloop   scalar fori-loop gather (dynamic row slices, idx from SMEM)
  cumsum  jnp.cumsum along lanes in-kernel
  roll    pltpu.roll lane butterfly (bitonic building block)
  sort    jax.lax.sort in-kernel (expect FAIL)
  vmem    big VMEM scratch ceiling (how many MB compile+run)
  dots    3 chained f32 dots in one kernel (round-2 crash re-probe)
"""

import functools
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
f32 = jnp.float32



from jax import lax


def dyn_gather(x, idx, axis):
    """take_along_axis with i32 indices (jnp's version casts to i64 under
    x64, which Mosaic rejects).  Lowers to tpu.dynamic_gather."""
    if axis == 0:
        dn = lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
            operand_batching_dims=(1,), start_indices_batching_dims=(1,))
    else:
        dn = lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return lax.gather(x, idx[..., None], dn, slice_sizes=(1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def timeit(fn, *args, iters=30):
    """Steady-state per-call seconds: chain the op output->input under a
    fori_loop so nothing is hoisted; median of 5 outer reps."""
    out = fn(*args)  # compile + correctness handle
    jax.block_until_ready(out)

    @jax.jit
    def chain(x0, rest):
        def body(_, x):
            y = fn(x, *rest)
            # keep same structure as x for the carry
            return y

        return jax.lax.fori_loop(0, iters, body, x0)

    x0, rest = args[0], args[1:]
    r = chain(x0, rest)
    jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x0, rest))
        ts.append((time.perf_counter() - t0) / iters)
    return out, float(np.median(ts))


def report(name, ok, note):
    print(f"{name:8s} {'PASS' if ok else 'FAIL':4s} {note}", flush=True)


def probe(name):
    def deco(f):
        def run():
            try:
                f()
            except Exception as e:
                msg = str(e).replace("\n", " | ")[:300]
                report(name, False, msg)

        return run

    return deco


# ---------------------------------------------------------------- take0
@probe("take0")
def p_take0():
    G, C = 8192, 128

    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = dyn_gather(x_ref[:], idx_ref[:], 0)

    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (G, C)), i32)
    idx = jnp.asarray(rng.integers(0, G, (G, C)), i32)

    def step(x, idx):
        y = f(x & 0x7FFFFF, idx)
        return y

    out, dt = timeit(step, x, idx)
    want = np.take_along_axis(np.asarray(x) & 0x7FFFFF, np.asarray(idx), 0)
    ok = np.array_equal(np.asarray(out), want)
    report("take0", ok, f"G={G} {dt*1e9/(G*C):.2f} ns/idx ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- take1
@probe("take1")
def p_take1():
    G, C = 1024, 1024

    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = dyn_gather(x_ref[:], idx_ref[:], 1)

    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (G, C)), i32)
    idx = jnp.asarray(rng.integers(0, C, (G, C)), i32)

    def step(x, idx):
        return f(x & 0x7FFFFF, idx)

    out, dt = timeit(step, x, idx)
    want = np.take_along_axis(np.asarray(x) & 0x7FFFFF, np.asarray(idx), 1)
    ok = np.array_equal(np.asarray(out), want)
    report("take1", ok, f"C={C} {dt*1e9/(G*C):.2f} ns/idx ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- flatg
@probe("flatg")
def p_flatg():
    # arbitrary flat gather out[i] = tbl[idx[i]], tbl [N] laid as
    # [N, 128] replicated?  too fat.  Instead: two-level — lane-gather
    # within rows of the [Gt, 128] table at idx%128 for EVERY table row,
    # then sublane-gather the right row.  Cost O(Gt x M/128) — try the
    # cheap variant first: table replicated to [N, 8] sublane-gather.
    N, M = 4096, 131072  # table entries, queries
    Gm, C = M // 128, 128

    def kern(tbl_ref, idx_ref, o_ref):
        # tbl_ref [N, 128]: column j holds tbl (replicated);
        # sublane gather: o[i, j] = tbl[idx[i, j], j] = tbl[idx[i, j]]
        tb = tbl_ref[:]
        ix = idx_ref[:]
        out = jnp.zeros((Gm, C), i32)
        # one take0 per Gm-block of queries? take0 needs idx shape == x
        # shape.  Pad idx to [N, 128] blocks.
        for s in range(0, Gm, N):
            blk = ix[s : s + N, :]
            out = out.at[s : s + N, :].set(
                dyn_gather(tb, blk, 0)[: min(N, Gm - s)]
            )
        o_ref[:] = out

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Gm, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    rng = np.random.default_rng(0)
    tbl1 = rng.integers(0, 1 << 20, (N,)).astype(np.int32)
    tbl = jnp.asarray(np.broadcast_to(tbl1[:, None], (N, 128)).copy())
    idx = jnp.asarray(rng.integers(0, N, (Gm, C)), i32)

    def step(idx, tbl):
        return f(tbl, idx & (N - 1))

    out, dt = timeit(step, idx, tbl)
    want = tbl1[np.asarray(idx) & (N - 1)]
    ok = np.array_equal(np.asarray(out), want)
    report("flatg", ok, f"N={N} M={M} {dt*1e9/M:.2f} ns/idx ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- sloop
@probe("sloop")
def p_sloop():
    # scalar-loop gather: M dynamic row reads from a [G, F] VMEM table,
    # indices read as scalars from SMEM
    G, F, M = 8192, 8, 8192

    def kern(idx_ref, tbl_ref, o_ref):
        def body(i, _):
            j = idx_ref[i]
            o_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, M, body, 0)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, F), i32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tbl)

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (G, F)), i32)
    idx = jnp.asarray(rng.integers(0, G, (M,)), i32)

    def step(tbl, idx):
        return f(tbl & 0x7FFFFF, idx)

    out, dt = timeit(step, tbl, idx)
    want = (np.asarray(tbl) & 0x7FFFFF)[np.asarray(idx)]
    ok = np.array_equal(np.asarray(out), want)
    report("sloop", ok, f"M={M} F={F} {dt*1e9/M:.2f} ns/idx ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- cumsum
@probe("cumsum")
def p_cumsum():
    G, C = 1024, 1024

    def kern(x_ref, o_ref):
        x = x_ref[:]
        lane = jax.lax.broadcasted_iota(i32, (G, C), 1)
        s = 1
        while s < C:
            sh = pltpu.roll(x, np.int32(s), 1)
            x = x + jnp.where(lane >= s, sh, 0)
            s *= 2
        o_ref[:] = x

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 3, (G, C)), i32)

    def step(x):
        return f(x & 3)

    out, dt = timeit(step, x)
    want = np.cumsum(np.asarray(x) & 3, axis=1, dtype=np.int32)
    ok = np.array_equal(np.asarray(out), want)
    report("cumsum", ok, f"{dt*1e9/(G*C):.3f} ns/elem ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- roll
@probe("roll")
def p_roll():
    G, C = 1024, 128

    def kern(x_ref, o_ref):
        x = x_ref[:]
        # one bitonic butterfly stage at stride 4 on lanes
        s = 4
        up = pltpu.roll(x, np.int32(C - s), 1)
        dn = pltpu.roll(x, np.int32(s), 1)
        lane = jax.lax.broadcasted_iota(i32, (G, C), 1)
        hi = (lane & s) != 0
        partner = jnp.where(hi, dn, up)
        lo = jnp.minimum(x, partner)
        hi_v = jnp.maximum(x, partner)
        o_ref[:] = jnp.where(hi, hi_v, lo)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (G, C)), i32)

    def step(x):
        return f(x & 0x7FFFFF)

    out, dt = timeit(step, x)
    xa = np.asarray(x) & 0x7FFFFF
    up = np.roll(xa, -4, 1)
    dn = np.roll(xa, 4, 1)
    lane = np.arange(C)[None, :]
    hi = (lane & 4) != 0
    partner = np.where(hi, dn, up)
    want = np.where(hi, np.maximum(xa, partner), np.minimum(xa, partner))
    ok = np.array_equal(np.asarray(out), want)
    report("roll", ok, f"{dt*1e9/(G*C):.3f} ns/elem ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- sort
@probe("sort")
def p_sort():
    G, C = 256, 1024

    def kern(x_ref, o_ref):
        o_ref[:] = jax.lax.sort(x_ref[:], dimension=1)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (G, C)), i32)

    def step(x):
        return f(x & 0x7FFFFF)

    out, dt = timeit(step, x)
    want = np.sort(np.asarray(x) & 0x7FFFFF, axis=1)
    ok = np.array_equal(np.asarray(out), want)
    report("sort", ok, f"{dt*1e9/(G*C):.3f} ns/elem ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- vmem
@probe("vmem")
def p_vmem():
    for mb in (32, 64, 96, 110):
        R = mb * 1024 * 1024 // (128 * 4)

        def kern(x_ref, o_ref, scr):
            scr[0, :] = x_ref[0, :] * 2
            o_ref[:] = scr[0, :].reshape(1, 128) + scr[R - 1, :].reshape(1, 128)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, 128), f32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((R, 128), f32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024
                ),
            )(x)

        try:
            out = f(jnp.ones((1, 128), f32))
            jax.block_until_ready(out)
            report("vmem", True, f"{mb} MB scratch ok")
        except Exception as e:
            report("vmem", False, f"{mb} MB: {str(e)[:120]}")
            break


# ---------------------------------------------------------------- dots
@probe("dots")
def p_dots():
    N = 256

    def kern(a_ref, b_ref, o_ref):
        x = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=f32)
        y = jnp.dot(x, b_ref[:], preferred_element_type=f32)
        z = jnp.dot(y, b_ref[:], preferred_element_type=f32)
        o_ref[:] = z

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, N), f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(N, N)), f32)
    b = jnp.asarray(np.eye(N), f32)
    out = f(a, b)
    jax.block_until_ready(out)
    ok = np.allclose(np.asarray(out), np.asarray(a), atol=1e-4)
    report("dots", ok, "3 chained f32 dots compile + run")


ALL = {
    "take0": p_take0, "take1": p_take1, "flatg": p_flatg,
    "sloop": p_sloop, "cumsum": p_cumsum, "roll": p_roll,
    "sort": p_sort, "vmem": p_vmem, "dots": p_dots,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for n in names:
        ALL[n]()
