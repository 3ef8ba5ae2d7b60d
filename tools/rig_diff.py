#!/usr/bin/env python
"""Focused rig differential: map N bench reads with given engine knobs,
byte-compare each PAF against the reference binary (tools/golden_rig),
print disagreements.  The parity-bisect tool for TPU-only regressions.

Env knobs:
  RD_N (256)         reads to map (bench read set, in order)
  RD_IDS             comma-separated read ids (overrides RD_N selection)
  RD_STEPKERN (1)    PoolParams.stepkern
  RD_SORT (bitonic)  sort_mode
  RD_MXU (1)         mxu routing
  RD_TRACKER (1)     tracker_kernel
  RD_B (256)         batch
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, "bench_data", "xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as benchmod

    prefix, reads_npz = benchmod.ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.batch import BatchMapper
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.poremodel import load_default

    d = np.load(reads_npz, allow_pickle=True)
    meta = json.loads(str(d["meta"]))
    want_ids = os.environ.get("RD_IDS")
    n = int(os.environ.get("RD_N", 256))
    sel = []
    for i, m in enumerate(meta):
        if want_ids:
            if m[0] in want_ids.split(","):
                sel.append((i, m[0]))
        elif len(sel) < n:
            sel.append((i, m[0]))
    reads = [benchmod.BenchRead(rid, d[f"sig_{i}"]) for i, rid in sel]

    conf = Conf()
    conf.engine.batch_reads = int(os.environ.get("RD_B", 256))
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 384
    over = dict(
        stepkern=bool(int(os.environ.get("RD_STEPKERN", "1"))),
        sort_mode=os.environ.get("RD_SORT", "bitonic"),
        mxu=bool(int(os.environ.get("RD_MXU", "1"))),
        tracker_kernel=bool(int(os.environ.get("RD_TRACKER", "1"))),
    )
    print(f"knobs: {over}  reads={len(reads)}", flush=True)
    fmi = load_index(prefix)
    bm = BatchMapper(
        fmi, load_default(), load_uncl(prefix + ".uncl"), conf, **over
    )
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    print(f"ovf_why: {bm.ovf_why}", flush=True)

    rig = os.path.join(REPO, "tools", "golden_rig", "golden_map")
    sig_dir = os.path.join(REPO, "bench_data", "rig_sigs")
    os.makedirs(sig_dir, exist_ok=True)
    bad = 0
    for i, rid in sel:
        sp = os.path.join(sig_dir, f"{rid}.f32")
        if not os.path.exists(sp):
            np.asarray(d[f"sig_{i}"], np.float32).tofile(sp)
        r = subprocess.run(
            [rig, prefix, sp, rid], capture_output=True, text=True,
            timeout=600,
        )
        if r.returncode != 0:
            print(f"RIG CRASH {rid}", flush=True)
            bad += 1
            continue
        want = r.stdout.strip().splitlines()[-1]
        g = got.get(rid, "<missing>")
        # compare mapping fields (ch/st tags differ by fixture convention)
        if g.split("\t")[1:12] != want.split("\t")[1:12]:
            bad += 1
            print(f"DISAGREE {rid}\n  got:  {g}\n  rig:  {want}",
                  flush=True)
    print(f"agreement: {len(sel) - bad}/{len(sel)}", flush=True)


if __name__ == "__main__":
    main()
