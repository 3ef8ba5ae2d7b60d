#!/usr/bin/env python
"""Replicate the BatchMapper block loop's device interaction pattern on
real read means and attribute per-block wall to its components.

The pooled advance program measured 22.5 ms/event loop-carried on real
data, but the full bench spent ~96 ms/event in rung0 — the gap lives in
the loop structure (readout pack + device_get + reset_slots every
block), not the step program.  PROBE_MODE picks the structure:

  adv        advance only (the pool_step_time baseline)
  adv+ro     + readout pack & device_get per block
  adv+reset  + reset_slots per block (mask all-False)
  full       + both (the BatchMapper pattern)

Env: POOLT_B/POOLT_T/POOLT_ITERS/POOLT_SLOTS as pool_step_time.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B = int(os.environ.get("POOLT_B", 256))
T = int(os.environ.get("POOLT_T", 32))
ITERS = int(os.environ.get("POOLT_ITERS", 8))
SLOTS = int(os.environ.get("POOLT_SLOTS", 384))
MODE = os.environ.get("PROBE_MODE", "full")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(REPO, "bench_data", "xla_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as benchmod

    prefix, reads_npz = benchmod.ensure_assets()

    from uncalled_tpu import native
    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.batch import normalize_events
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.mapping.pooled import PooledEngine
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(prefix)
    conf = Conf()
    conf.engine.batch_reads = B
    conf.engine.pool_slots_per_read = SLOTS
    eng = PooledEngine(fmi, load_default(), load_uncl(prefix + ".uncl"), conf)

    d = np.load(reads_npz, allow_pickle=True)
    slot_means = []
    for i in range(B):
        ev = native.detect_events(
            d[f"sig_{i}"], conf.event_detector.min_mean,
            conf.event_detector.max_mean,
        )
        nm, _, _ = normalize_events(
            ev["mean"], conf.normalizer.tgt_mean, conf.normalizer.tgt_stdv
        )
        slot_means.append(nm)
    feed = [0] * B
    blocks = []
    for _ in range(ITERS + 1):
        m = np.zeros((B, T), np.float32)
        on_ = np.zeros((B, T), bool)
        for b in range(B):
            nxt = slot_means[b][feed[b] : feed[b] + T]
            if len(nxt) == 0:
                feed[b] = 0
                nxt = slot_means[b][:T]
            m[b, : len(nxt)] = nxt
            on_[b, : len(nxt)] = True
            feed[b] += len(nxt)
        blocks.append((m, on_))

    state = eng.fresh_state()
    state = eng.reset_slots(state, np.ones((B,), bool))
    nomask = np.zeros((B,), bool)

    # warm every program the loop touches
    state = eng.advance(state, *blocks[0])
    h = eng.readout_start(state)
    eng.readout_get(h)
    state = eng.reset_slots(state, nomask)
    jax.block_until_ready(state["evt_i"])

    t = {"adv": 0.0, "ro_start": 0.0, "ro_get": 0.0, "reset": 0.0}
    t0 = time.time()
    for mb, ob in blocks[1:]:
        t1 = time.time()
        state = eng.advance(state, mb, ob)
        t["adv"] += time.time() - t1
        if MODE in ("adv+ro", "full"):
            t1 = time.time()
            h = eng.readout_start(state)
            t["ro_start"] += time.time() - t1
            t1 = time.time()
            eng.readout_get(h)
            t["ro_get"] += time.time() - t1
        if MODE in ("adv+reset", "full"):
            t1 = time.time()
            state = eng.reset_slots(state, nomask)
            t["reset"] += time.time() - t1
    jax.block_until_ready(state["evt_i"])
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "mode": MODE,
                "ms_per_event": round(dt / (ITERS * T) * 1000, 2),
                "per_block_s": {k: round(v / ITERS, 3) for k, v in t.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
