#!/usr/bin/env python
"""Trace-grounded timing of ops/stepkern.py kernels at production scale.

Usage: python tools/stepkern_time.py [ring ...]

Each kernel runs 30x in a chained fori loop under jax.profiler; the
reported number is the kernel custom-call's median device duration from
the trace (wall times over the remote tunnel are meaningless).
"""

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, "bench_data", "xla_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def trace_ops(chain_fn, x0):
    r = chain_fn(x0)
    jax.block_until_ready(r)
    tdir = tempfile.mkdtemp(prefix="stepkern_")
    try:
        jax.profiler.start_trace(tdir)
        jax.block_until_ready(chain_fn(x0))
        jax.profiler.stop_trace()
        evs = []
        for path in glob.glob(
            os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True
        ):
            with gzip.open(path, "rt") as fh:
                evs.extend(json.load(fh).get("traceEvents", []))
        byname = defaultdict(list)
        for e in evs:
            if e.get("ph") == "X" and "dur" in e and e.get("name"):
                byname[e["name"]].append(e["dur"])
        rows = sorted(
            (
                (sum(d), len(d), float(np.median(d)), n)
                for n, d in byname.items()
                if sum(d) > 50 and not n.startswith("$")
            ),
            reverse=True,
        )
        for tot, n, med, nm in rows[:8]:
            print(f"  {tot:9.0f}us {n:4d} {med:8.1f}us  {nm[:80]}",
                  flush=True)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


def time_ring():
    from uncalled_tpu.ops.stepkern import ring_assemble

    S, RING = 98304, 23
    rng = np.random.default_rng(0)
    old = jnp.asarray(rng.normal(size=(S, RING)).astype(np.float32))
    rsrc = jnp.asarray(rng.integers(-1, S, S).astype(np.int32))
    rslot = jnp.asarray(rng.integers(-1, RING, S).astype(np.int32))
    rval = jnp.asarray(rng.normal(size=S).astype(np.float32))
    keep = jnp.asarray(rng.integers(0, 2, S).astype(bool))

    f = jax.jit(ring_assemble)
    t0 = time.time()
    out = f(old, rsrc, rslot, rval, keep)
    jax.block_until_ready(out)
    print(f"ring: compile+run {time.time() - t0:.1f}s", flush=True)
    ring_rows = np.asarray(old)[np.clip(np.asarray(rsrc), 0, S - 1)]
    base = np.where(
        (np.asarray(rsrc) >= 0)[:, None], ring_rows, np.float32(0)
    )
    iota = np.arange(RING)[None, :]
    want = np.where(
        np.asarray(keep)[:, None],
        np.where(
            iota == np.asarray(rslot)[:, None],
            np.asarray(rval)[:, None], base,
        ),
        np.float32(0),
    ).astype(np.float32)
    ok = np.array_equal(np.asarray(out).view(np.int32), want.view(np.int32))
    print(f"ring: exact={ok}", flush=True)

    @jax.jit
    def chain(ring):
        return jax.lax.fori_loop(
            0, 30, lambda _, r: f(r, rsrc, rslot, rval, keep), ring
        )

    trace_ops(chain, old)


KERNELS = {"ring": time_ring}

if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for n in sys.argv[1:] or list(KERNELS):
        KERNELS[n]()
