"""r9.4.1 pore model: 5-mer -> Gaussian current-level distribution.

Matches the behavior of the reference PoreModel (src/pore_model.hpp:39-203):

* `match_prob(samp, kmer) = -(samp-mu)^2 / (2 sigma^2) - log(sqrt(2 pi sigma^2))`
  (pore_model.hpp:163-165).
* The "complement" preset re-indexes each table row at the base-wise complement
  of its k-mer (pore_model.hpp:89-94); the mapper uses the complement preset
  because FM backward search walks the reverse-complement text
  (mapper.cpp:57).
* `means_mean` / `means_stdv` are the population mean/stdv of the level means
  and are the normalizer targets (pore_model.hpp:48-56, mapper.cpp:94).

All tables are float32 numpy arrays ready to be placed on device; match_prob
is pure arithmetic usable inside jit.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .kmer import K, KMER_COUNT, kmer_comp

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
DEFAULT_MODEL_NPZ = os.path.join(DATA_DIR, "r94_5mer_model.npz")


@dataclass(frozen=True)
class PoreModel:
    means: np.ndarray  # [1024] f32, indexed by (possibly complemented) k-mer
    vars_x2: np.ndarray  # [1024] f32: 2 * stdv^2
    lognorm_denoms: np.ndarray  # [1024] f32: log(sqrt(pi * vars_x2))
    means_mean: float  # mean of level means (normalizer target mean)
    means_stdv: float  # population stdv of level means (normalizer target stdv)
    complement: bool

    @staticmethod
    def _from_tables(means: np.ndarray, stdvs: np.ndarray, complement: bool) -> "PoreModel":
        means = means.astype(np.float32)
        stdvs = stdvs.astype(np.float32)
        if complement:
            idx = kmer_comp(np.arange(KMER_COUNT), K)
            m = np.empty_like(means)
            s = np.empty_like(stdvs)
            m[idx] = means
            s[idx] = stdvs
            means, stdvs = m, s
        vars_x2 = (2.0 * stdvs * stdvs).astype(np.float32)
        lognorm = np.log(np.sqrt(np.pi * vars_x2.astype(np.float64))).astype(np.float32)
        # model-wide stats: sequential float32 accumulation in table order to
        # match the reference bit-for-bit (pore_model.hpp:84-99 accumulates a
        # float across rows; the complement permutation doesn't change the set)
        mm = np.float32(0.0)
        for v in means if not complement else means[kmer_comp(np.arange(KMER_COUNT), K)]:
            mm += v
        mm = np.float32(mm / np.float32(KMER_COUNT))
        ms = np.float32(0.0)
        for v in means:  # index order, like init_stdv (pore_model.hpp:48-56)
            d = np.float64(np.float32(v - mm))  # f32 subtraction, squared in f64
            ms = np.float32(np.float64(ms) + d * d)  # float += double
        ms = np.float32(np.sqrt(ms / np.float32(KMER_COUNT)))
        return PoreModel(means, vars_x2, lognorm, float(mm), float(ms), complement)

    @staticmethod
    def load_npz(path: str = DEFAULT_MODEL_NPZ, complement: bool = False) -> "PoreModel":
        d = np.load(path)
        return PoreModel._from_tables(d["level_mean"], d["level_stdv"], complement)

    @staticmethod
    def load_tsv(path: str, complement: bool = False) -> "PoreModel":
        """Load an UNCALLED/ONT-format model TSV (header + kmer/mean/stdv rows)."""
        from .kmer import str_to_kmer

        means = np.zeros(KMER_COUNT, dtype=np.float32)
        stdvs = np.zeros(KMER_COUNT, dtype=np.float32)
        with open(path) as f:
            next(f)
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    k = str_to_kmer(parts[0])
                    means[k] = np.float32(parts[1])
                    stdvs[k] = np.float32(parts[2])
        return PoreModel._from_tables(means, stdvs, complement)

    def match_prob(self, samp, xp=np):
        """Log-likelihood of sample(s) against every k-mer.

        samp: scalar or [...]-shaped array of normalized event means.
        Returns [..., 1024] float32. Works with numpy or jax.numpy via `xp`.
        """
        d = xp.asarray(samp, dtype=np.float32)[..., None] - self.means
        return -(d * d) / self.vars_x2 - self.lognorm_denoms


def load_default(complement: bool = True) -> PoreModel:
    """The model preset used by the mapper (complement-indexed r9.4.1 table)."""
    return PoreModel.load_npz(DEFAULT_MODEL_NPZ, complement=complement)
