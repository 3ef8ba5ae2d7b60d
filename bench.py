#!/usr/bin/env python
"""Benchmark: batch-map simulated nanopore reads against an E. coli-scale
reference on the available accelerator; prints ONE JSON line.

Metric: reads/sec/chip end-to-end (host event detection + device mapping).
Default config (P=1024 path budget, B=256 slots) measured 100% mapped /
100% position-correct on the simulated read set; the full-parity budgets
(P=10000 etc.) are available via BENCH_* env knobs and measured ~2-4x slower
at identical accuracy on this set.
Baseline: the reference's published E. coli numbers -- mean 140.99 ms/read at
16 CPU threads (reference README.md:216) => ~113.5 reads/s aggregate.

The benchmark assets (4.7 Mb random-genome index + fitted .uncl thresholds +
simulated reads) are built once into bench_data/ and reused. A persistent XLA
compilation cache makes repeat runs skip the large first-compile.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, "bench_data")

REF_BP = int(os.environ.get("BENCH_REF_BP", 4_700_000))
N_READS = int(os.environ.get("BENCH_READS", 256))
N_WARM = int(os.environ.get("BENCH_WARM", 8))
BATCH = int(os.environ.get("BENCH_BATCH", 256))
EVT_BLOCK = int(os.environ.get("BENCH_EVT_BLOCK", 32))
PATHS = int(os.environ.get("BENCH_PATHS", 1024))
SEED_ROWS = int(os.environ.get("BENCH_SEED_ROWS", 64))
CLUSTERS = int(os.environ.get("BENCH_CLUSTERS", 512))
BASELINE_READS_PER_SEC = 16 / 0.14099  # reference: 16 threads, 140.99 ms/read


def ensure_assets():
    os.makedirs(DATA, exist_ok=True)
    prefix = os.path.join(DATA, f"ecoli_{REF_BP}")
    fa = prefix + ".fa"
    if not os.path.exists(prefix + ".utidx.npz"):
        rng = np.random.default_rng(42)
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, REF_BP))
        with open(fa, "w") as f:
            f.write(">bench_ref\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80] + "\n")
        from uncalled_tpu.index.build import build_index
        from uncalled_tpu.index.parameterize import build_uncl

        fmi = build_index(fa)
        fmi.save(prefix)
        build_uncl(fmi, prefix)
    reads_npz = os.path.join(DATA, f"reads_{REF_BP}_{N_READS}.npz")
    if not os.path.exists(reads_npz):
        from uncalled_tpu.testing.simulate import simulate_reads

        reads = simulate_reads(fa, N_READS + N_WARM, seed=123,
                               read_len_bp=(1000, 4000))
        np.savez_compressed(
            reads_npz,
            **{f"sig_{i}": r.signal for i, r in enumerate(reads)},
            meta=json.dumps(
                [[r.id, r.ref_name, r.ref_start, r.ref_end, r.fwd] for r in reads]
            ),
        )
    return prefix, reads_npz


class BenchRead:
    def __init__(self, id, signal):
        self.id, self.signal = id, signal
        self.channel, self.number, self.start_sample = 1, 0, 0

    @property
    def raw_len(self):
        return len(self.signal)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(DATA, "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    prefix, reads_npz = ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.batch import BatchMapper
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(prefix)
    d = np.load(reads_npz, allow_pickle=True)
    meta = json.loads(str(d["meta"]))
    reads = [BenchRead(m[0], d[f"sig_{i}"]) for i, m in enumerate(meta)]
    truth = {m[0]: m for m in meta}

    conf = Conf()
    conf.engine.batch_reads = BATCH
    conf.engine.evt_block = EVT_BLOCK
    conf.engine.remap_wide = bool(int(os.environ.get("BENCH_REMAP", "1")))
    bm = BatchMapper(
        fmi, load_default(), load_uncl(prefix + ".uncl"), conf,
        P=PATHS, C=PATHS, R=SEED_ROWS, CL=CLUSTERS,
    )

    # warmup (includes compile)
    for _ in bm.map_reads(reads[:N_WARM]):
        pass

    t0 = time.time()
    n_mapped = 0
    n_correct = 0
    for paf in bm.map_reads(reads[N_WARM:]):
        if paf.is_mapped:
            n_mapped += 1
            m = truth[paf.rd_name]
            if (
                paf.rf_name == m[1]
                and m[2] - 500 <= paf.rf_st <= m[3] + 500
                and paf.fwd == m[4]
            ):
                n_correct += 1
    dt = time.time() - t0
    reads_per_sec = N_READS / dt

    print(
        json.dumps(
            {
                "metric": "reads_per_sec_chip_ecoli4.7Mb",
                "value": round(reads_per_sec, 2),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 3),
                "extra": {
                    "n_reads": N_READS,
                    "mapped_frac": round(n_mapped / N_READS, 4),
                    "correct_frac": round(n_correct / N_READS, 4),
                    "wall_s": round(dt, 2),
                    "batch": BATCH,
                    "paths": PATHS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
