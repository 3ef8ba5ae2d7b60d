#!/usr/bin/env python
"""Regenerate the rig-derived parity fixtures.

Runs tools/golden_rig/golden_map (the parity binary: unmodified reference
mapper, STABLE tie order — see golden_rig/pdqsort.h) over the fixture
signal sets and rewrites:
  tests/fixtures/golden_pafs.json        (golden_reads vs example_index)
  tests/fixtures/tie_pafs.json           (tie_reads vs the bench index)
and with golden_map_stdsort (RIG_UNSTABLE_SORT):
  tests/fixtures/tie_pafs_stdsort.json   (the introsort-replica target)

Needs the bench index (bench_data/, built by bench.py) for the tie set.
"""
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "tests", "fixtures")
RIG = os.path.join(REPO, "tools", "golden_rig")


def run_rig(binary, prefix, npz, out_json):
    d = np.load(npz, allow_pickle=True)
    pafs = {}
    with tempfile.TemporaryDirectory() as td:
        for rid in d.files:
            sp = os.path.join(td, "sig.f32")
            np.asarray(d[rid], np.float32).astype("<f4").tofile(sp)
            r = subprocess.run([binary, prefix, sp, rid],
                               capture_output=True, text=True, timeout=600)
            assert r.returncode == 0, (rid, r.stderr[-500:])
            line = r.stdout.strip().splitlines()[-1]
            # strip the wall-clock mt: tag (non-deterministic)
            pafs[rid] = "\t".join(
                t for t in line.split("\t") if not t.startswith("mt:")
            )
    with open(out_json, "w") as f:
        json.dump(pafs, f, indent=1)
    print(f"{out_json}: {len(pafs)} PAFs")


def main():
    subprocess.run(["make", "-C", RIG, "golden_map", "golden_map_stdsort"],
                   check=True, capture_output=True)
    run_rig(os.path.join(RIG, "golden_map"),
            os.path.join(FIX, "example_index", "example_ref"),
            os.path.join(FIX, "golden_reads.npz"),
            os.path.join(FIX, "golden_pafs.json"))
    bench_prefix = os.path.join(REPO, "bench_data", "rgen_4700000")
    if os.path.exists(bench_prefix + ".bwt"):
        run_rig(os.path.join(RIG, "golden_map"), bench_prefix,
                os.path.join(FIX, "tie_reads.npz"),
                os.path.join(FIX, "tie_pafs.json"))
        run_rig(os.path.join(RIG, "golden_map_stdsort"), bench_prefix,
                os.path.join(FIX, "tie_reads.npz"),
                os.path.join(FIX, "tie_pafs_stdsort.json"))
    else:
        print("bench index absent: tie fixtures not regenerated")


if __name__ == "__main__":
    main()
