#!/usr/bin/env python
"""Parity diagnosis: run the sequential ORACLE (reference budgets) on the
given bench read ids, compare PAFs against the reference binary (golden
rig).  Localizes whether a rig disagreement is a SPEC bug (oracle wrong)
or an ENGINE bug (oracle right, device engine wrong).

Usage: python tools/parity_diag.py sim_0545 sim_0631 ...
       (bare prefixes ok; matched against bench read ids)
Env: PD_SEEDTAP=1  also dump + diff the seed streams (oracle tap vs
     golden_map_seedtap stderr) and report the first divergent event.
"""

import json
import os
import subprocess
import sys

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
    from uncalled_tpu.mapping.oracle import OracleMapper, SeedTracker, load_uncl
    from uncalled_tpu.poremodel import load_default

    d = np.load(reads_npz, allow_pickle=True)
    meta = json.loads(str(d["meta"]))
    want = sys.argv[1:]
    sel = []
    for i, m in enumerate(meta):
        if any(m[0].startswith(w) or w in m[0] for w in want):
            sel.append((i, m[0]))
    if not sel:
        print("no reads matched", file=sys.stderr)
        sys.exit(2)

    fmi = load_index(prefix)
    om = OracleMapper(fmi, load_default(), load_uncl(prefix + ".uncl"), Conf())

    rig = os.path.join(REPO, "tools", "golden_rig", "golden_map")
    rig_tap = os.path.join(REPO, "tools", "golden_rig", "golden_map_seedtap")
    sig_dir = os.path.join(REPO, "bench_data", "rig_sigs")
    os.makedirs(sig_dir, exist_ok=True)

    seedtap = os.environ.get("PD_SEEDTAP") == "1"
    for i, rid in sel:
        sig = np.asarray(d[f"sig_{i}"], np.float32)
        sp = os.path.join(sig_dir, f"{rid}.f32")
        sig.tofile(sp)

        # oracle map (optionally with a seed-stream tap)
        oracle_seeds = []
        if seedtap:
            orig = SeedTracker.add_seed

            def tap(self, ref_en, ref_len, evt_st, _o=orig, _log=oracle_seeds):
                _log.append((int(evt_st), int(ref_en), int(ref_len)))
                return _o(self, ref_en, ref_len, evt_st)

            SeedTracker.add_seed = tap
        paf = om.map_read(benchmod.BenchRead(rid, sig))
        if seedtap:
            SeedTracker.add_seed = orig
        mine = "\t".join(
            t for t in paf.to_line().split("\t") if not t.startswith("mt:")
        )

        r = subprocess.run([rig, prefix, sp, rid], capture_output=True,
                           text=True, timeout=600)
        theirs = "\t".join(
            t
            for t in r.stdout.strip().splitlines()[-1].split("\t")
            if not t.startswith("mt:")
        ) if r.returncode == 0 and r.stdout.strip() else f"<rig rc={r.returncode}>"
        ok = mine == theirs
        print(f"{rid}: {'AGREE' if ok else 'DISAGREE'}")
        if not ok:
            print(f"  oracle: {mine}")
            print(f"  rig:    {theirs}")
        if seedtap and not ok and os.path.exists(rig_tap):
            rt = subprocess.run([rig_tap, prefix, sp, rid],
                                capture_output=True, text=True, timeout=600)
            ref_seeds = []
            for line in rt.stderr.splitlines():
                p = line.split()
                if len(p) == 4 and p[0] == "S":
                    ref_seeds.append((int(p[1]), int(p[2]), int(p[3])))
            n = min(len(oracle_seeds), len(ref_seeds))
            div = None
            for k in range(n):
                if oracle_seeds[k] != ref_seeds[k]:
                    div = k
                    break
            if div is None and len(oracle_seeds) != len(ref_seeds):
                div = n
            if div is None:
                print(f"  seed streams IDENTICAL ({n} seeds) — divergence "
                      f"is post-tracker (decision/report)")
            else:
                print(f"  seed streams diverge at seed #{div}:")
                for k in range(max(0, div - 3), min(div + 4, max(len(oracle_seeds), len(ref_seeds)))):
                    o = oracle_seeds[k] if k < len(oracle_seeds) else None
                    g = ref_seeds[k] if k < len(ref_seeds) else None
                    mark = "  " if o == g else "->"
                    print(f"   {mark} #{k} oracle={o} rig={g}")


if __name__ == "__main__":
    main()
