#!/usr/bin/env python
"""Loop-carried pooled-engine step timing (+ knockout attribution).

Times ms/event of the pooled engine's advance program on the honest
bench index with the state loop-carried through a fori-style host loop
(donated buffers, block_until_ready) — the measurement recipe from
docs/PERF.md ("never closure-constant inputs").

Env knobs:
  POOLT_B (256)  POOLT_T (16)  POOLT_ITERS (8)  POOLT_SLOTS (384)
  UNCALLED_POOL_KNOCKOUT=sort,tracker,...  (stage stubs, see pooled.py)

Prints one line:  <tag>  <ms_per_event>
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B = int(os.environ.get("POOLT_B", 256))
T = int(os.environ.get("POOLT_T", 16))
ITERS = int(os.environ.get("POOLT_ITERS", 8))
SLOTS = int(os.environ.get("POOLT_SLOTS", 384))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(REPO, "bench_data", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, REPO)
    import bench as benchmod

    prefix, _ = benchmod.ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.mapping.pooled import PooledEngine
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(prefix)
    conf = Conf()
    conf.engine.batch_reads = B
    conf.engine.pool_slots_per_read = SLOTS
    eng = PooledEngine(fmi, load_default(), load_uncl(prefix + ".uncl"), conf)

    rng = np.random.default_rng(0)
    state = eng.fresh_state()
    state = eng.reset_slots(state, np.ones((B,), bool))
    means = rng.normal(90.0, 12.0, size=(B, T)).astype(np.float32)
    on = np.ones((B, T), bool)

    # warm (compile)
    state = eng.advance(state, means, on)
    jax.block_until_ready(state["evt_i"])

    t0 = time.time()
    for _ in range(ITERS):
        state = eng.advance(state, means, on)
    jax.block_until_ready(state["evt_i"])
    dt = time.time() - t0
    tag = os.environ.get("UNCALLED_POOL_KNOCKOUT", "full") or "full"
    print(f"{tag}\t{dt / (ITERS * T) * 1000:.2f} ms/event", flush=True)


if __name__ == "__main__":
    main()
