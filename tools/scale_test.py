#!/usr/bin/env python
"""Sharded-index scale test: a 100 Mb reference through the flagship
engines on the virtual 8-CPU mesh (VERDICT r2 item 5).

Builds a 100 Mb simulated Markov genome index (cached in
bench_data/scale/), maps simulated reads through (a) the unsharded
PooledEngine and (b) ShardedPooledEngine on a (2, 4) dp-x-idx mesh, and
asserts byte-identical PAF output.  Prints the device-memory accounting
that extrapolates to a 3 Gb (human-scale) reference.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          python tools/scale_test.py [ref_mb]

Output is checked into docs/SCALE.md.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 100
REF_BP = REF_MB * 1_000_000
N_READS = 8
DATA = os.path.join(REPO, "bench_data", "scale")


def ensure_assets():
    os.makedirs(DATA, exist_ok=True)
    prefix = os.path.join(DATA, f"sgen_{REF_BP}")
    fa = prefix + ".fa"
    if not os.path.exists(prefix + ".utidx.npz"):
        from uncalled_tpu.index.build import build_index
        from uncalled_tpu.testing.simulate import realistic_genome

        t0 = time.time()
        seq = realistic_genome(REF_BP, seed=11)
        print(f"genome {REF_MB} Mb: {time.time()-t0:.0f}s", flush=True)
        with open(fa, "w") as f:
            f.write(">scale_ref\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i:i + 80] + "\n")
        t0 = time.time()
        fmi = build_index(fa)
        fmi.save(prefix)
        print(f"index build (SA-IS native): {time.time()-t0:.0f}s",
              flush=True)
    reads_npz = os.path.join(DATA, f"sreads_{REF_BP}_{N_READS}.npz")
    if not os.path.exists(reads_npz):
        from uncalled_tpu.testing.simulate import simulate_reads

        reads = simulate_reads(fa, N_READS, seed=5,
                               read_len_bp=(800, 2000), mismatch=True)
        np.savez_compressed(
            reads_npz,
            **{f"sig_{i}": r.signal for i, r in enumerate(reads)},
            meta=json.dumps(
                [[r.id, r.ref_name, r.ref_start, r.ref_end, r.fwd]
                 for r in reads]
            ),
        )
    return prefix, reads_npz


class _Read:
    def __init__(self, id, signal):
        self.id = id
        self.signal = np.asarray(signal, np.float32)
        self.channel = 1
        self.start_sample = 0

    @property
    def raw_len(self):
        return len(self.signal)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    prefix, reads_npz = ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.batch import BatchMapper
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.parallel import ShardedPooledEngine
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(prefix)
    n = len(fmi.bwt) - 1 if hasattr(fmi, "bwt") else REF_BP
    # threshold tables are genome-fit speed/sensitivity knobs; for the
    # scale/parity run the bench's fitted set serves both engines alike
    uncl = os.path.join(REPO, "bench_data", "rgen_4700000.uncl")
    if not os.path.exists(uncl):
        import bench as benchmod

        benchmod.ensure_assets()
    threshes = load_uncl(uncl)
    model = load_default()

    d = np.load(reads_npz, allow_pickle=True)
    meta = json.loads(str(d["meta"]))
    reads = [_Read(m[0], d[f"sig_{i}"]) for i, m in enumerate(meta)]

    conf = Conf()
    conf.engine.batch_reads = 8
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512

    t0 = time.time()
    bm = BatchMapper(fmi, model, threshes, conf, sampled_sa=True)
    ref_pafs = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    print(f"unsharded pooled engine: {time.time()-t0:.0f}s "
          f"({len(ref_pafs)} reads)", flush=True)

    mesh = jax.make_mesh((2, 4), ("dp", "idx"))
    eng = ShardedPooledEngine(fmi, model, threshes, conf, mesh=mesh)
    t0 = time.time()
    bm2 = BatchMapper(fmi, model, threshes, conf, engine=eng)
    got = {p.rd_name: p.to_line() for p in bm2.map_reads(reads)}
    print(f"sharded (2x4 mesh) pooled engine: {time.time()-t0:.0f}s",
          flush=True)

    agree = sum(got.get(k) == v for k, v in ref_pafs.items())
    print(f"PAF byte-agreement sharded vs unsharded: "
          f"{agree}/{len(ref_pafs)}", flush=True)
    assert agree == len(ref_pafs)
    mapped = sum("\t*\t" not in v for v in ref_pafs.values())
    print(f"mapped: {mapped}/{len(ref_pafs)}")

    # ---- device-memory accounting ----------------------------------
    nix = 4
    print(f"\n== device-table accounting at {REF_MB} Mb "
          f"(n = {fmi.n:,} bases) ==")
    tot = 0
    for k, v in eng._tables.items():
        b = v.size * v.dtype.itemsize
        tot += b
        if b > 1 << 20:
            print(f"  {k:10s} {b/1e6:9.1f} MB  "
                  f"({b/fmi.n:.3f} B/base, "
                  f"{b/1e6/nix:.1f} MB/shard at idx={nix})")
    print(f"  TOTAL      {tot/1e6:9.1f} MB  ({tot/fmi.n:.3f} B/base)")
    bpb = tot / fmi.n
    for gb in (1, 2.1, 3):
        need = gb * 1e9 * bpb
        print(f"  extrapolated {gb:3} Gb reference: {need/1e9:.2f} GB of "
              f"tables = {need/1e9/nix:.2f} GB/shard at idx={nix} "
              f"(v5e HBM 16 GB)")
    print("  NOTE: FM rows are i32 throughout (exact vs the reference's "
          "own int types); a single index therefore caps at 2^31-1 bases "
          "(~2.1 Gb).  Larger references split into per-contig sub-"
          "indexes, exactly as the reference's own >1 Gb guidance "
          "(README.md:242-246).")


if __name__ == "__main__":
    main()
