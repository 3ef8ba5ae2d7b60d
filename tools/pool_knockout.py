#!/usr/bin/env python
"""Sequential knockout sweep of the pooled event step, one process.

Each variant re-traces the advance program with a stage stubbed
(pooled._KNOCKOUT) and times it loop-carried.  Compiles dominate
(~10-30 min/program over the tunnel) so the sweep runs the few
informative variants only; results print incrementally.

Env: POOLT_B / POOLT_T / POOLT_ITERS / POOLT_SLOTS as pool_step_time;
POOLK_VARIANTS comma-of-colon list, default
"full:,notrk:tracker_full,nosort:sort,nogath:gathers,nocompact:compact".
(tracker_full FORCES the worst-case R-trip while_loop, so
 notrk - full = R x per-iteration cost; the synthetic state otherwise
 runs the tracker at zero trips.)
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
VARIANTS = [
    v.split(":") for v in os.environ.get(
        "POOLK_VARIANTS",
        "full:,notrk:tracker_full,nosort:sort,bsort:bitonic,"
        "nogath:gathers,nocompact:compact",
    ).split(",")
]


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(REPO, "bench_data", "xla_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as benchmod

    prefix, _ = benchmod.ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping import pooled
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(prefix)
    model = load_default()
    thr = load_uncl(prefix + ".uncl")
    rng = np.random.default_rng(0)
    means = rng.normal(90.0, 12.0, size=(B, T)).astype(np.float32)
    on = np.ones((B, T), bool)

    for tag, stages in VARIANTS:
        over = {}
        if stages == "bitonic":  # param A/B, not a knockout stub
            stages, over = "", {"sort_mode": "bitonic"}
        pooled._KNOCKOUT = frozenset(stages.split("|")) - {""}
        conf = Conf()
        conf.engine.batch_reads = B
        conf.engine.pool_slots_per_read = SLOTS
        eng = pooled.PooledEngine(fmi, model, thr, conf, **over)
        state = eng.fresh_state()
        state = eng.reset_slots(state, np.ones((B,), bool))
        t0 = time.time()
        state = eng.advance(state, means, on)
        jax.block_until_ready(state["evt_i"])
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(ITERS):
            state = eng.advance(state, means, on)
        jax.block_until_ready(state["evt_i"])
        dt = time.time() - t0
        print(
            f"{tag}\t{dt / (ITERS * T) * 1000:.2f} ms/event"
            f"\t(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
