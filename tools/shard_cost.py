#!/usr/bin/env python
"""Measured cost model for the idx-sharded engine (VERDICT r4 #8).

The >=80%% multi-chip scaling claim previously rested on "no hot-path
collectives" reasoning alone; this tool puts numbers behind it:

  mode=cpu   (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_\
device_count=8): step time of the (1, 8) idx-sharded pooled engine vs
             the unsharded engine at PRODUCTION pool shapes on the same
             host — isolates the sharded FORMULATION tax (masked
             shard-local gathers + psum combine) from device count,
             since all 8 virtual shards share the same silicon.
  mode=tpu   (one real chip): the same comparison on a (1, 1) mesh —
             the shard_map/psum machinery at idx=1, i.e. the pure
             program-structure overhead on real hardware.

Also prints the ANALYTIC per-event ICI budget of idx sharding: the occ
and SA answers are psum-combined one-hot partials, so the wire bytes
per event are output_bytes x (idx-1)/idx per collective hop, compared
against v5e ICI (~45 GB/s/link) and the measured step time.

Results land in docs/SCALE.md.

Usage: [BENCH_B=64] [BENCH_T=8] [BENCH_ITERS=3] python tools/shard_cost.py cpu|tpu
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
B = int(os.environ.get("BENCH_B", 64 if MODE == "cpu" else 256))
T = int(os.environ.get("BENCH_T", 8))
ITERS = int(os.environ.get("BENCH_ITERS", 3))
SLOTS = int(os.environ.get("BENCH_SLOTS", 384))


def _time_engine(eng, B, T, iters):
    import jax

    rng = np.random.default_rng(0)
    state = eng.fresh_state()
    state = eng.reset_slots(state, np.ones((B,), bool))
    m = rng.normal(90.0, 12.0, size=(B, T)).astype(np.float32)
    on = np.ones((B, T), bool)
    state = eng.advance(state, m, on)  # compile
    np.asarray(jax.device_get(state["evt_i"]))
    t0 = time.time()
    for _ in range(iters):
        state = eng.advance(state, m, on)
    # block_until_ready does NOT block on the remote axon backend
    # (handles report ready before execution finishes — the 0.15
    # ms/event artifact); a device_get of a real value does.
    np.asarray(jax.device_get(state["evt_i"]))
    return (time.time() - t0) / (iters * T) * 1000.0


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu" or MODE == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(REPO, "bench_data", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as benchmod

    prefix, _ = benchmod.ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.mapping.pooled import PooledEngine
    from uncalled_tpu.parallel import ShardedPooledEngine
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(prefix)
    threshes = load_uncl(prefix + ".uncl")
    model = load_default()
    conf = Conf()
    conf.engine.batch_reads = B
    conf.engine.pool_slots_per_read = SLOTS

    n_dev = len(jax.devices())
    idx_shards = n_dev if MODE == "cpu" else 1
    mesh = jax.make_mesh((1, idx_shards), ("dp", "idx"))

    # the sharded engine pins mxu/kernels off; compare like with like
    base = PooledEngine(
        fmi, model, threshes, conf,
        mxu=False, sort_mode="flat", tracker_kernel=False, stepkern=False,
        sortkern=False, sampled_sa=True,
    )
    ms_base = _time_engine(base, B, T, ITERS)
    print(f"unsharded pooled step: {ms_base:8.2f} ms/event "
          f"(B={B} S={base.params.S} T={T}, {MODE})", flush=True)

    sh = ShardedPooledEngine(fmi, model, threshes, conf, mesh=mesh)
    ms_sh = _time_engine(sh, B, T, ITERS)
    ovh = (ms_sh / ms_base - 1) * 100
    print(f"idx-sharded (1x{idx_shards}) step: {ms_sh:8.2f} ms/event "
          f"-> formulation overhead {ovh:+.1f}%", flush=True)

    # ---- analytic ICI budget per event (occ + SA psum combines) ------
    p = base.params
    SC, RT = p.SC, p.RT
    # occ: 2 bucket-row answers per candidate, 8 lanes i32 each
    occ_bytes = SC * 2 * 8 * 4
    # SA: one sampled-SA walk answer per seed row
    sa_bytes = RT * 4
    for n_idx in (2, 4, 8):
        wire = (occ_bytes + sa_bytes) * (n_idx - 1) / n_idx
        us = wire / 45e9 * 1e6  # one ICI link, v5e ~45 GB/s
        print(
            f"analytic ICI: idx={n_idx}: {wire/1e6:6.2f} MB/event psum "
            f"traffic ~= {us:6.0f} us/event at 45 GB/s "
            f"({us/10/1000*100:.1f}% of a 10 ms step)", flush=True,
        )


if __name__ == "__main__":
    main()
