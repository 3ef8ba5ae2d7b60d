#!/usr/bin/env python
"""Probe 5: bisect the scalar-gather-loop compile crash (probe4 sgat).

M=8192/F=8/S=8192 compiles; M=131072/S=98304 crashes the remote Mosaic
compiler (HTTP 500).  Vary M (loop trips), S (table rows), F (row width)
independently to find the wall, and try grid-split variants (loop per
grid step) as the workaround.
"""

import os
import sys

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


def try_one(tag, M, S, F):
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(tbl, idx)

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (S, F)), i32)
    idx = jnp.asarray(rng.integers(0, S, (M, 1)), i32)
    try:
        out = f(tbl, idx)
        jax.block_until_ready(out)
        ok = np.array_equal(np.asarray(out), np.asarray(tbl)[np.asarray(idx)[:, 0]])
        print(f"{tag:24s} PASS ok={ok}", flush=True)
        return True
    except Exception as e:
        print(f"{tag:24s} FAIL {str(e)[:120]}", flush=True)
        return False


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    # vary M with S=F small
    for M in (16384, 32768, 65536, 131072):
        try_one(f"M={M} S=8192 F=8", M, 8192, 8)
    # vary S with M small
    for S in (32768, 98304):
        try_one(f"M=8192 S={S} F=8", 8192, S, 8)
    # combined production shape once the walls are known
    try_one("M=131072 S=98304 F=8", 131072, 98304, 8)
    try_one("M=131072 S=98304 F=16", 131072, 98304, 16)


def try_grid(tag, M, S, F, NB):
    MB = M // NB

    def kern(tbl_ref, idx_ref, o_ref):
        def body(i, _):
            j = idx_ref[i, 0]
            o_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, MB, body, 0)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            kern,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((S, F), lambda b: (np.int32(0), np.int32(0))),
                pl.BlockSpec((MB, 1), lambda b: (b, np.int32(0))),
            ],
            out_specs=pl.BlockSpec((MB, F), lambda b: (b, np.int32(0))),
            out_shape=jax.ShapeDtypeStruct((M, F), i32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(tbl, idx)

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (S, F)), i32)
    idx = jnp.asarray(rng.integers(0, S, (M, 1)), i32)
    try:
        out = f(tbl, idx)
        jax.block_until_ready(out)
        ok = np.array_equal(np.asarray(out), np.asarray(tbl)[np.asarray(idx)[:, 0]])
        print(f"{tag:24s} PASS ok={ok}", flush=True)
        return True
    except Exception as e:
        print(f"{tag:24s} FAIL {str(e)[:120]}", flush=True)
        return False


def try_split(tag, M, S, F, PARTS):
    MP = M // PARTS

    def kern(tbl_ref, idx_ref, o_ref):
        def mk(base):
            def body(i, _):
                j = idx_ref[base + i, 0]
                o_ref[pl.ds(base + i, 1), :] = tbl_ref[pl.ds(j, 1), :]
                return 0

            return body

        for p in range(PARTS):
            jax.lax.fori_loop(0, MP, mk(np.int32(p * MP)), 0)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, F), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(tbl, idx)

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (S, F)), i32)
    idx = jnp.asarray(rng.integers(0, S, (M, 1)), i32)
    try:
        out = f(tbl, idx)
        jax.block_until_ready(out)
        ok = np.array_equal(np.asarray(out), np.asarray(tbl)[np.asarray(idx)[:, 0]])
        print(f"{tag:24s} PASS ok={ok}", flush=True)
        return True
    except Exception as e:
        print(f"{tag:24s} FAIL {str(e)[:120]}", flush=True)
        return False
