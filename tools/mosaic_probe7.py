#!/usr/bin/env python
"""Probe 7: trace-grounded dynamic-store cost + pcum bisect.

sscat: out[pos[i], :32] = val[i, :32] (dynamic store addresses), traced.
cumT:  transpose-based lane prefix alone (pcum stage 1) — bisect crash.
cumR:  lane prefix via 7 roll stages (fallback recipe), correctness+time.
"""

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
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


def traced_span(f, *args, iters=20):
    """Median device duration of the while-loop body per iteration."""
    out = f(*args)
    jax.block_until_ready(out)

    @jax.jit
    def chain(x, rest):
        return jax.lax.fori_loop(
            0, iters, lambda _, v: f(v, *rest), x
        )

    r = chain(args[0], args[1:])
    jax.block_until_ready(r)
    tdir = tempfile.mkdtemp(prefix="probe7_")
    try:
        jax.profiler.start_trace(tdir)
        jax.block_until_ready(chain(args[0], args[1:]))
        jax.profiler.stop_trace()
        evs = []
        for path in glob.glob(
            os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True
        ):
            with gzip.open(path, "rt") as fh:
                evs.extend(json.load(fh).get("traceEvents", []))
        wh = [e["dur"] for e in evs
              if e.get("ph") == "X" and e.get("name", "").startswith("while")]
        return out, (max(wh) / iters / 1e6 if wh else float("nan"))
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


def p_sscat():
    G, F, M = 32768, 32, 32768

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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(val, pos)

    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.integers(0, 1 << 20, (M, F)), i32)
    pos = jnp.asarray(rng.permutation(G).reshape(M, 1), i32)

    def step(val, pos):
        return f(val & 0x7FFFFF, pos)

    try:
        out, dt = traced_span(step, val, pos)
        want = np.zeros((G, F), np.int32)
        want[np.asarray(pos)[:, 0]] = np.asarray(val) & 0x7FFFFF
        ok = np.array_equal(np.asarray(out), want)
        print(f"sscat    {'PASS' if ok else 'FAIL'} M={M} "
              f"{dt*1e9/M:.2f} ns/store ({dt*1e3:.3f} ms traced)", flush=True)
    except Exception as e:
        print(f"sscat    FAIL {str(e)[:200]}", flush=True)


def p_cumT():
    R, C = 768, 128

    def kern(x_ref, o_ref):
        xt = x_ref[:].T  # [C, R]
        s = 1
        while s < C:
            xt = xt + jnp.concatenate(
                [jnp.zeros((s, R), i32), xt[: C - s, :]], axis=0
            )
            s *= 2
        o_ref[:] = xt.T

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
        out, dt = traced_span(lambda v: f(v & 7), x)
        want = np.cumsum(np.asarray(x) & 7, axis=1, dtype=np.int32)
        ok = np.array_equal(np.asarray(out), want)
        print(f"cumT     {'PASS' if ok else 'FAIL'} lane-prefix via T "
              f"{dt*1e6:.1f} us/call", flush=True)
    except Exception as e:
        print(f"cumT     FAIL {str(e)[:200]}", flush=True)


def p_cumR():
    R, C = 768, 128

    def kern(x_ref, o_ref):
        x = x_ref[:]
        lane = jax.lax.broadcasted_iota(i32, (R, C), 1)
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
            out_shape=jax.ShapeDtypeStruct((R, C), i32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 5, (R, C)), i32)
    try:
        out, dt = traced_span(lambda v: f(v & 7), x)
        want = np.cumsum(np.asarray(x) & 7, axis=1, dtype=np.int32)
        ok = np.array_equal(np.asarray(out), want)
        print(f"cumR     {'PASS' if ok else 'FAIL'} lane-prefix via roll "
              f"{dt*1e6:.1f} us/call", flush=True)
    except Exception as e:
        print(f"cumR     FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for n in sys.argv[1:] or ["sscat", "cumT", "cumR"]:
        {"sscat": p_sscat, "cumT": p_cumT, "cumR": p_cumR}[n]()
