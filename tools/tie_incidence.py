#!/usr/bin/env python
"""Measure observable-tie incidence on the bench read set.

An OBSERVABLE tie = a run of >=2 candidates equal in the full sort key
(fm_start, fm_end, f32 seedprob) whose members differ in downstream-
observable state (length, consec, moves, sa_checked, sums ring, kmer).
Only these make the unstable-sort tie permutation matter: dedup keeps the
run's last element (mapper.cpp:568-571) and its state flows on.

Prints per-read tie counts + aggregate incidence + oracle ms/read — the
economics of the engine's tie-flag -> host-oracle-rerun parity backstop.

Env: TI_N (128) number of bench reads.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import bench as benchmod

    prefix, reads_npz = benchmod.ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping import oracle as om
    from uncalled_tpu.poremodel import load_default

    d = np.load(reads_npz, allow_pickle=True)
    meta = json.loads(str(d["meta"]))
    n = int(os.environ.get("TI_N", 128))

    fmi = load_index(prefix)
    m = om.OracleMapper(fmi, load_default(), om.load_uncl(prefix + ".uncl"),
                        Conf())

    # tap the sort: count observable ties per call
    counts = {"events": 0, "tie_groups": 0, "obs_tie_groups": 0}
    per_read_obs = []
    orig = om.std_sort

    def tap(paths, key, _depth_limit=None):
        counts["events"] += 1
        out = orig(paths, key, _depth_limit)
        i = 0
        N = len(out)
        while i < N - 1:
            j = i
            ki = key(out[i])
            while j + 1 < N and key(out[j + 1]) == ki:
                j += 1
            if j > i:
                counts["tie_groups"] += 1
                # observable state: kmer, length, consec, moves,
                # sa_checked, sums ring (records: [ns, ne, kmer, length,
                # consec, moves, sa_checked, sums, seedprob])
                sig0 = None
                differ = False
                for r in out[i : j + 1]:
                    sig = (r[2], r[3], r[4], r[5], r[6], r[7].tobytes())
                    if sig0 is None:
                        sig0 = sig
                    elif sig != sig0:
                        differ = True
                        break
                if differ:
                    counts["obs_tie_groups"] += 1
                    counts["_read_hit"] = True
            i = j + 1
        return out

    om.std_sort = tap

    t_total = 0.0
    hits = 0
    lens = []
    for i in range(min(n, len(meta))):
        rid = meta[i][0]
        sig = np.asarray(d[f"sig_{i}"], np.float32)
        counts.pop("_read_hit", None)
        t0 = time.time()
        m.map_read(benchmod.BenchRead(rid, sig))
        dt = time.time() - t0
        t_total += dt
        lens.append(len(sig))
        if counts.pop("_read_hit", False):
            hits += 1
            per_read_obs.append(rid)

    print(json.dumps({
        "reads": min(n, len(meta)),
        "reads_with_observable_tie": hits,
        "tie_read_ids": per_read_obs[:40],
        "events": counts["events"],
        "tie_groups": counts["tie_groups"],
        "obs_tie_groups": counts["obs_tie_groups"],
        "oracle_ms_per_read": round(1000 * t_total / max(1, min(n, len(meta))), 1),
        "mean_sig_len": int(np.mean(lens)),
    }, indent=1))


if __name__ == "__main__":
    main()
