#!/usr/bin/env python
"""Import ONT r9.4.1 pore-model tables into the compact .npz format used by
uncalled_tpu.

Input formats (both are plain data tables, e.g. as shipped with UNCALLED):
  model TSV:   header line, then `kmer level_mean level_stdv` rows
  thresh TSV:  `thresh freq count` rows (no header)

Usage:
  python tools/import_model.py model  <in.txt> <out.npz>
  python tools/import_model.py thresh <in.txt> <out.npz>
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from uncalled_tpu.kmer import KMER_COUNT, str_to_kmer


def import_model(src: str, dst: str) -> None:
    means = np.zeros(KMER_COUNT, dtype=np.float32)
    stdvs = np.zeros(KMER_COUNT, dtype=np.float32)
    seen = np.zeros(KMER_COUNT, dtype=bool)
    with open(src) as f:
        next(f)  # header
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            k = str_to_kmer(parts[0])
            means[k] = np.float32(parts[1])
            stdvs[k] = np.float32(parts[2])
            seen[k] = True
    assert seen.all(), f"model table missing {np.count_nonzero(~seen)} k-mers"
    np.savez_compressed(dst, level_mean=means, level_stdv=stdvs)
    print(f"wrote {dst}: {KMER_COUNT} k-mers")


def import_thresh(src: str, dst: str) -> None:
    # keep f64: the index parameterizer's interpolation/printing must match
    # the reference, which parses these as python floats (index.py:119-132)
    rows = np.loadtxt(src, dtype=np.float64)
    np.savez_compressed(
        dst, thresh=rows[:, 0], freq=rows[:, 1], count=rows[:, 2]
    )
    print(f"wrote {dst}: {len(rows)} threshold rows")


if __name__ == "__main__":
    kind, src, dst = sys.argv[1:4]
    {"model": import_model, "thresh": import_thresh}[kind](src, dst)
