#!/usr/bin/env python
"""Demand-tail evidence at scale (VERDICT r3 item 6).

The pooled engine's pool/tier constants (CL=2048/16384/65536, R=1024,
RE/RT scaling) were sized from demand tails measured on the 4.7 Mb bench
genome; a repeat-heavy LARGE genome could reopen the eject economics.
This tool measures the same telemetry on a >=100 Mb Markov genome:

* ENGINE pass (TPU or CPU): BatchMapper demand maxima per read (flags /
  fm-valid candidates / live paths / seed rows), eject counts + reasons.
* ORACLE pass (CPU, sample): per-event live cluster counts — the CL
  sizing evidence the engine doesn't report.

Prints ONE JSON line.  Results land in docs/PERF.md.

Env: DS_MB (100) genome Mb | DS_READS (256) engine reads |
     DS_ORACLE (16) oracle-sample reads | DS_BATCH (64) engine batch
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DS_MB = int(os.environ.get("DS_MB", 100))
REF_BP = DS_MB * 1_000_000
N_READS = int(os.environ.get("DS_READS", 256))
N_ORACLE = int(os.environ.get("DS_ORACLE", 16))
BATCH = int(os.environ.get("DS_BATCH", 64))
DATA = os.path.join(REPO, "bench_data", "scale")


def ensure_assets():
    """Same prefix as tools/scale_test.py so the index cache is shared."""
    os.makedirs(DATA, exist_ok=True)
    prefix = os.path.join(DATA, f"sgen_{REF_BP}")
    fa = prefix + ".fa"
    if not os.path.exists(prefix + ".utidx.npz"):
        from uncalled_tpu.index.build import build_index
        from uncalled_tpu.index.parameterize import build_uncl
        from uncalled_tpu.testing.simulate import realistic_genome

        t0 = time.time()
        seq = realistic_genome(REF_BP, seed=11)
        print(f"# genome {DS_MB} Mb: {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        with open(fa, "w") as f:
            f.write(">scale_ref\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i:i + 80] + "\n")
        t0 = time.time()
        fmi = build_index(fa)
        fmi.save(prefix)
        print(f"# index: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
        build_uncl(fmi, prefix)
    if not os.path.exists(prefix + ".bwt"):
        # BWA-compat files so the reference rig binary can map the same
        # reads (rig byte-agreement at 100 Mb, VERDICT r4 #6)
        from uncalled_tpu.index.bwa_compat import write_bwa_index
        from uncalled_tpu.index.fmindex import load_index

        t0 = time.time()
        write_bwa_index(load_index(prefix), prefix)
        print(f"# bwa-compat: {time.time()-t0:.0f}s", file=sys.stderr,
              flush=True)
    reads_npz = os.path.join(DATA, f"dreads_{REF_BP}_{N_READS}.npz")
    if not os.path.exists(reads_npz):
        from uncalled_tpu.testing.simulate import simulate_reads

        reads = simulate_reads(fa, N_READS, seed=321,
                               read_len_bp=(1000, 4000), mismatch=True)
        np.savez_compressed(
            reads_npz,
            **{f"sig_{i}": r.signal for i, r in enumerate(reads)},
            meta=json.dumps(
                [[r.id, r.ref_name, r.ref_start, r.ref_end, r.fwd]
                 for r in reads]
            ),
        )
    return prefix, reads_npz


def pcts(a):
    a = np.asarray(a)
    if not len(a):
        return None
    return [int(np.percentile(a, 50)), int(np.percentile(a, 99)),
            int(a.max())]


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(REPO, "bench_data", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    prefix, reads_npz = ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.batch import BatchMapper
    from uncalled_tpu.mapping.oracle import OracleMapper, load_uncl
    from uncalled_tpu.poremodel import load_default

    import bench as benchmod

    fmi = load_index(prefix)
    threshes = load_uncl(prefix + ".uncl")
    model = load_default()
    d = np.load(reads_npz, allow_pickle=True)
    meta = json.loads(str(d["meta"]))
    reads = [benchmod.BenchRead(m[0], d[f"sig_{i}"])
             for i, m in enumerate(meta)]
    truth = {m[0]: m for m in meta}

    conf = Conf()
    conf.engine.batch_reads = BATCH
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 384
    # DS_CL: cluster-table override — the r5 run measured 15/256 CL
    # evictions at CL=2048 (repeat-tail cluster demand crosses 2048 at
    # 100 Mb); this knob tests the CL=4096 sizing hypothesis
    over = {}
    if os.environ.get("DS_CL"):
        over["CL"] = int(os.environ["DS_CL"])
    bm = BatchMapper(fmi, model, threshes, conf, **over)

    t0 = time.time()
    n_mapped = n_correct = 0
    ours = {}
    mismapped = []
    for paf in bm.map_reads(reads):
        ours[paf.rd_name] = paf.to_line()
        m = truth.get(paf.rd_name)
        if paf.is_mapped and m:
            n_mapped += 1
            if (m[2] - 500 <= paf.rf_st <= m[3] + 500
                    and paf.fwd == m[4]):
                n_correct += 1
            else:
                mismapped.append(paf.rd_name)
    wall = time.time() - t0

    # rig byte-agreement on a 64-read sample + every mismapped read
    # (the bench.py recipe; a rig crash counts as disagreement)
    rig_agree = None
    rig_disagree = []
    rig_bin = os.path.join(REPO, "tools", "golden_rig", "golden_map")
    if int(os.environ.get("DS_RIG", "1")) and os.path.exists(rig_bin):
        import subprocess
        import tempfile

        sample = {
            r.id for r in np.random.default_rng(7).choice(
                np.asarray(reads, object),
                size=min(64, len(reads)), replace=False,
            )
        } | set(mismapped)
        same = total = 0
        with tempfile.TemporaryDirectory() as td:
            for r in [r for r in reads if r.id in sample]:
                sigf = os.path.join(td, "sig.f32")
                r.signal.astype("<f4").tofile(sigf)
                out = subprocess.run(
                    [rig_bin, prefix, sigf, r.id],
                    capture_output=True, text=True, timeout=900,
                )
                total += 1
                if out.returncode != 0 or not out.stdout.strip():
                    rig_disagree.append(r.id)
                    continue
                line = out.stdout.strip().splitlines()[-1]
                line = "\t".join(
                    t for t in line.split("\t") if not t.startswith("mt:")
                )
                if line == ours.get(r.id):
                    same += 1
                else:
                    rig_disagree.append(r.id)
        rig_agree = round(same / max(total, 1), 4)

    dmv = np.array(list(bm.demand.values())) if bm.demand else np.zeros((0, 4))
    rungs = []
    why = {}
    pool_hw = {}

    def _walk_drains(m):
        while m is not None:
            yield m
            m = m._drain_mapper

    m_ = bm
    ri = 0
    while m_ is not None:
        n_ej = 0
        for dm_ in _walk_drains(m_):
            n_ej += len(dm_.ovf_why)
            for w in dm_.ovf_why.values():
                why[str(w)] = why.get(str(w), 0) + 1
            if dm_.pool_hw.any():
                p_ = dm_.eng.params
                pool_hw[f"rung{ri}_B{p_.B}"] = {
                    "hw": [int(x) for x in dm_.pool_hw],
                    "cap": [p_.SC, p_.SC, p_.S, p_.RE, p_.RT],
                }
        rungs.append(n_ej)
        m_ = m_._next_mapper
        ri += 1

    # oracle sample for cluster-demand tails (CPU; reference budgets)
    om = OracleMapper(fmi, model, threshes, Conf(), collect_stats=True)
    cl_max, cl_all = [], []
    for i in range(min(N_ORACLE, len(reads))):
        om.stats = {k: [] for k in ("paths", "cands", "sources",
                                    "seed_groups", "seed_rows", "clusters")}
        om.map_read(reads[i])
        if om.stats["clusters"]:
            cl_all.extend(om.stats["clusters"])
            cl_max.append(max(om.stats["clusters"]))

    print(json.dumps({
        "metric": f"demand_scale_{DS_MB}mb",
        "value": round(len(reads) / wall, 2),
        "unit": "reads/s",
        "extra": {
            "genome_mb": DS_MB,
            "n_reads": len(reads),
            "mapped_frac": round(n_mapped / len(reads), 4),
            "correct_frac": round(n_correct / len(reads), 4),
            "wall_s": round(wall, 1),
            "demand_p50_p99_max": {
                k: pcts(dmv[:, i]) for i, k in
                enumerate(("flags", "valid", "paths", "rows", "clusters")[: dmv.shape[1]])
            } if len(dmv) else None,
            "rung_ejects": rungs,
            "eject_why": why,
            "pool_hw": pool_hw,
            "oracle_sample_reads": min(N_ORACLE, len(reads)),
            "cluster_demand_per_event_p50_p99_max": pcts(cl_all),
            "cluster_demand_read_max_p50_p99_max": pcts(cl_max),
            **({"rig_agree": rig_agree} if rig_agree is not None else {}),
            **({"rig_disagree_ids": rig_disagree[:16]}
               if rig_disagree else {}),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
