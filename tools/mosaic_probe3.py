#!/usr/bin/env python
"""Mosaic probe set 3: where does the ~1 ms/call floor come from?

Probe set 2 saw roll/transp/sscan/dma all cost ~1.0 ms/call regardless
of size while sgatv/sloop cost ~2 us — something about those calls hits
a slow path.  Candidates: whole-array VMEM param copies, non-gridded
dispatch, output->carry copies.  This set times a trivial +1 copy kernel
across sizes and input styles:

  vp<N>   whole-array VMEM params, grid=(), N MB
  gr<N>   gridded BlockSpec rows (512-row blocks), N MB
  an<N>   ANY memory space params + explicit async_copy to VMEM scratch
  empty   [8,128] in/out (pure dispatch overhead)
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


def run(name, f, x, mb):
    try:
        out, dt = timeit(f, x)
        gbs = 2 * mb / 1e3 / dt
        print(f"{name:8s} {dt*1e6:8.1f} us  {gbs:6.0f} GB/s", flush=True)
    except Exception as e:
        print(f"{name:8s} FAIL {str(e)[:200]}", flush=True)


def vmem_param(R, C):
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
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(x)

    return f


def gridded(R, C, BR=512):
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] + np.int32(1)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, C), lambda r: (r, np.int32(0)))],
            out_specs=pl.BlockSpec((BR, C), lambda r: (r, np.int32(0))),
            out_shape=jax.ShapeDtypeStruct((R, C), i32),
        )(x)

    return f


def anycopy(R, C):
    def kern(x_hbm, o_hbm, scr, sem_i, sem_o):
        cp_in = pltpu.make_async_copy(x_hbm, scr, sem_i)
        cp_in.start()
        cp_in.wait()
        scr[:] = scr[:] + np.int32(1)
        cp_out = pltpu.make_async_copy(scr, o_hbm, sem_o)
        cp_out.start()
        cp_out.wait()

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((R, C), i32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(x)

    return f


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    C = 1024
    run("empty", vmem_param(8, 128), jnp.zeros((8, 128), i32), 8 * 128 * 4 / 1e6)
    for mb, R in ((1, 256), (4, 1024), (16, 4096), (27, 6656)):
        x = jnp.zeros((R, C), i32)
        run(f"vp{mb}", vmem_param(R, C), x, R * C * 4 / 1e6)
    for mb, R in ((1, 256), (4, 1024), (16, 4096), (27, 6656)):
        x = jnp.zeros((R, C), i32)
        run(f"gr{mb}", gridded(R, C), x, R * C * 4 / 1e6)
    for mb, R in ((1, 256), (4, 1024), (16, 4096), (27, 6656)):
        x = jnp.zeros((R, C), i32)
        run(f"an{mb}", anycopy(R, C), x, R * C * 4 / 1e6)
