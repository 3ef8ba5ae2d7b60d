#!/usr/bin/env python
"""Mosaic probe set 4: trace-grounded timings (the only trustworthy kind).

Probe sets 2/3 produced inconsistent wall timings (the remote tunnel +
XLA keeping loop carries VMEM-resident make block_until_ready wall time
meaningless at the us scale).  This set runs each candidate primitive in
a 30-deep chained fori loop under jax.profiler.trace and reports REAL
per-op device durations parsed from the trace.

Reported per probe: median device time of the pallas kernel op itself,
plus the median of any copy/fusion ops adjacent in the loop body
(the HBM<->VMEM streaming tax), plus the whole-loop device span / 30.
"""

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

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
ITERS = 30


def trace_run(name, fn, x0):
    """Run chain(x0) under a trace; parse per-op device durations."""
    out = fn(x0)
    jax.block_until_ready(out)

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, ITERS, lambda _, v: fn(v), x)

    r = chain(x0)
    jax.block_until_ready(r)

    tdir = tempfile.mkdtemp(prefix=f"probe4_{name}_")
    try:
        jax.profiler.start_trace(tdir)
        jax.block_until_ready(chain(x0))
        jax.profiler.stop_trace()
        evs = []
        for path in glob.glob(
            os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True
        ):
            with gzip.open(path, "rt") as f:
                data = json.load(f)
            evs.extend(data.get("traceEvents", []))
        # device-side complete events with durations, grouped by op name
        from collections import defaultdict

        byname = defaultdict(list)
        for e in evs:
            if e.get("ph") == "X" and "dur" in e and e.get("name"):
                byname[e["name"]].append(e["dur"])
        # kernel ops: custom-call / kernel names containing 'kern'
        rows = []
        for nm, durs in sorted(byname.items()):
            tot = sum(durs)
            if tot < 20:  # ignore sub-20us totals
                continue
            rows.append((tot, len(durs), float(np.median(durs)), nm))
        rows.sort(reverse=True)
        print(f"== {name}: top device ops (total_us, n, med_us, name)")
        for tot, n, med, nm in rows[:6]:
            print(f"   {tot:9.0f} {n:5d} {med:9.1f}  {nm[:90]}")
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


def mk_vp(R, C, body=None):
    body = body or (lambda x: x + np.int32(1))

    def kern(x_ref, o_ref):
        o_ref[:] = body(x_ref[:])

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


def probe_dma27():
    R, C = 6656, 1024
    trace_run("dma27", mk_vp(R, C), jnp.ones((R, C), i32))


def probe_sgat():
    # production-shaped scalar gather: SC=131072 indices into [S=98304, 8]
    S, F, M = 98304, 8, 131072

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

    def step(tbl):
        out = f(tbl, idx)
        return out[:S]  # feed back as next table

    # correctness once
    out = f(tbl, idx)
    want = np.asarray(tbl)[np.asarray(idx)[:, 0]]
    ok = np.array_equal(np.asarray(out), want)
    print(f"sgat131k correctness: {ok}")
    trace_run("sgat131k", step, tbl)


def probe_transp():
    R, C = 768, 128
    trace_run("transp", mk_vp(R, C, lambda x: x.T.T + np.int32(1)),
              jnp.ones((R, C), i32))


def probe_sscan():
    R, C = 768, 128

    def body(x):
        s = 1
        while s < R:
            x = x + jnp.concatenate(
                [jnp.zeros((s, C), i32), x[: R - s, :]], axis=0
            )
            s *= 2
        return x & np.int32(3)

    trace_run("sscan", mk_vp(R, C, body), jnp.ones((R, C), i32))


def probe_roll():
    R, C = 1024, 128

    def body(x):
        return pltpu.roll(x, np.int32(4), 1) + np.int32(1)

    trace_run("roll", mk_vp(R, C, body), jnp.ones((R, C), i32))


ALL = {
    "dma27": probe_dma27,
    "sgat": probe_sgat,
    "transp": probe_transp,
    "sscan": probe_sscan,
    "roll": probe_roll,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:
            print(f"{n} FAIL {str(e)[:300]}")
