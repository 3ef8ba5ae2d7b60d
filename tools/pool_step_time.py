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
    over = {}
    if os.environ.get("POOLT_MXU") is not None:
        over["mxu"] = bool(int(os.environ["POOLT_MXU"]))
    if os.environ.get("POOLT_SORT"):
        over["sort_mode"] = os.environ["POOLT_SORT"]
    eng = PooledEngine(
        fmi, load_default(), load_uncl(prefix + ".uncl"), conf, **over
    )

    rng = np.random.default_rng(0)
    state = eng.fresh_state()
    state = eng.reset_slots(state, np.ones((B,), bool))

    # POOLT_REAL=1: feed REAL normalized event means from the bench read
    # set (per-read sequential blocks) instead of synthetic noise, so the
    # pool/tracker see the true path populations.  Distinguishes
    # data-dependent step cost from loop-structure cost.
    real = bool(int(os.environ.get("POOLT_REAL", "0")))
    if real:
        import json as _json

        from uncalled_tpu.mapping.batch import normalize_events
        from uncalled_tpu.poremodel import load_default as _ld
        from uncalled_tpu import native

        _, reads_npz = benchmod.ensure_assets()
        d = np.load(reads_npz, allow_pickle=True)
        meta = _json.loads(str(d["meta"]))
        conf2 = Conf()
        blocks = []
        slot_means = []
        for i in range(B):
            ev = native.detect_events(
                d[f"sig_{i}"], conf2.event_detector.min_mean,
                conf2.event_detector.max_mean,
            )
            nm, _, _ = normalize_events(
                ev["mean"], conf2.normalizer.tgt_mean,
                conf2.normalizer.tgt_stdv,
            )
            slot_means.append(nm)
        feed = [0] * B
        for _ in range(ITERS + 1):
            m = np.zeros((B, T), np.float32)
            on_ = np.zeros((B, T), bool)
            for b in range(B):
                nxt = slot_means[b][feed[b] : feed[b] + T]
                if len(nxt) == 0:  # wrap: restart the read's stream
                    feed[b] = 0
                    nxt = slot_means[b][: T]
                m[b, : len(nxt)] = nxt
                on_[b, : len(nxt)] = True
                feed[b] += len(nxt)
            blocks.append((m, on_))
    else:
        m = rng.normal(90.0, 12.0, size=(B, T)).astype(np.float32)
        on_ = np.ones((B, T), bool)
        blocks = [(m, on_)] * (ITERS + 1)

    # warm (compile)
    state = eng.advance(state, *blocks[0])
    np.asarray(jax.device_get(state["evt_i"]))  # real sync (see below)

    prof_dir = os.environ.get("POOLT_PROFILE")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)
    t0 = time.time()
    for mb, ob in blocks[1:]:
        state = eng.advance(state, mb, ob)
    # block_until_ready does NOT block on the remote axon backend (the
    # 0.05 ms/event wall artifact) — device_get of a value does
    np.asarray(jax.device_get(state["evt_i"]))
    dt = time.time() - t0
    if prof_dir:
        jax.profiler.stop_trace()
    tag = os.environ.get("UNCALLED_POOL_KNOCKOUT", "full") or "full"
    tag += "+real" if real else ""
    print(f"{tag}\t{dt / (ITERS * T) * 1000:.2f} ms/event", flush=True)


if __name__ == "__main__":
    main()
