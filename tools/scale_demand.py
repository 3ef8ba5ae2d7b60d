#!/usr/bin/env python
"""Demand-tail evidence at scale (VERDICT r3 item 6).

Maps >=256 simulated reads against the repeat-heavy 100 Mb genome
(tools/scale_test.py assets: Markov base composition + transposon
family at ~0.5-3%% divergence + rRNA-like operon x7 + tandem repeats)
through the production BatchMapper at bench pool constants, and prints
the per-read demand distribution (flags/valid/paths/rows/clusters),
the POOL-GLOBAL high-water (dm_pool vs capacity), and the eject
histogram — the sizing evidence for CL/R/RE/RT beyond the 4.7 Mb
bench genome (reference limits: /root/reference/README.md:242-246).

Run on the chip:      python tools/scale_demand.py [n_reads]
Run on CPU (slow):    JAX_PLATFORMS=cpu python tools/scale_demand.py 32
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
DATA = os.path.join(REPO, "bench_data", "scale")


def ensure_reads(fa, n):
    reads_npz = os.path.join(DATA, f"sreads_demand_{n}.npz")
    if not os.path.exists(reads_npz):
        from uncalled_tpu.testing.simulate import simulate_reads

        t0 = time.time()
        reads = simulate_reads(fa, n, seed=17,
                               read_len_bp=(800, 6000), mismatch=True)
        print(f"simulated {n} reads: {time.time()-t0:.0f}s", flush=True)
        np.savez_compressed(
            reads_npz,
            **{f"sig_{i}": r.signal for i, r in enumerate(reads)},
            meta=json.dumps(
                [[r.id, r.ref_name, r.ref_start, r.ref_end, r.fwd]
                 for r in reads]
            ),
        )
    return reads_npz


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(REPO, "bench_data", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scale_test

    prefix, _ = scale_test.ensure_assets()
    reads_npz = ensure_reads(prefix + ".fa", N_READS)

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.batch import BatchMapper
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(prefix)
    uncl = os.path.join(REPO, "bench_data", "rgen_4700000.uncl")
    if not os.path.exists(uncl):
        import bench as benchmod

        benchmod.ensure_assets()
    threshes = load_uncl(uncl)
    model = load_default()

    d = np.load(reads_npz, allow_pickle=True)
    meta = json.loads(str(d["meta"]))
    reads = [scale_test._Read(m[0], d[f"sig_{i}"]) for i, m in
             enumerate(meta)]
    truth = {m[0]: m for m in meta}

    # the BENCH constants (batch.py/config defaults), so the measured
    # tails speak directly to the production pool sizing
    conf = Conf()
    conf.engine.pooled = True
    conf.engine.batch_reads = min(256, max(8, N_READS))

    t0 = time.time()
    bm = BatchMapper(fmi, model, threshes, conf, sampled_sa=True)
    pafs = list(bm.map_reads(reads))
    dt = time.time() - t0

    n_mapped = sum(p.is_mapped for p in pafs)
    correct = 0
    for p in pafs:
        m = truth.get(p.rd_name)
        if p.is_mapped and m and p.rf_st - 2000 <= m[3] and \
                m[2] <= p.rf_en + 2000:
            correct += 1

    # demand distribution across ALL rungs that saw reads
    def walk(m):
        while m is not None:
            yield m
            for dm_ in ([m._drain_mapper] if m._drain_mapper else []):
                yield from walk(dm_)
            m = m._next_mapper

    demand, hw, ejects = {}, {}, {}
    for i, m in enumerate(walk(bm)):
        demand.update(m.demand)
        for rid, w in m.ovf_why.items():
            ejects[w] = ejects.get(w, 0) + 1
        if m.pool_hw.any():
            p = m.eng.params
            hw[f"m{i}_B{p.B}"] = {
                "hw": [int(x) for x in m.pool_hw],
                "cap": [p.SC, p.SC, p.S, p.RE, p.RT],
            }

    dmv = np.array(list(demand.values()))
    stats = {}
    for i, k in enumerate(("flags", "valid", "paths", "rows",
                           "clusters")[: dmv.shape[1]]):
        stats[k] = [int(np.percentile(dmv[:, i], 50)),
                    int(np.percentile(dmv[:, i], 99)),
                    int(dmv[:, i].max())]

    print(json.dumps({
        "metric": "scale_demand_100Mb",
        "n_reads": len(pafs),
        "mapped": n_mapped,
        "correct_frac": round(correct / max(n_mapped, 1), 4),
        "wall_s": round(dt, 1),
        "demand_p50_p99_max": stats,
        "pool_hw": hw,
        "eject_why": {str(k): v for k, v in ejects.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
