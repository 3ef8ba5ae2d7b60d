"""Index parameter fitting: per-FM-bin log-prob threshold presets (.uncl).

Re-implements the reference's IndexParameterizer pipeline
(uncalled/index.py:53-209 + src/self_align_ref.cpp:34-91):

1. `self_align`: from sampled forward-strand positions, walk FM backward
   extensions of the complemented sequence and record the FM-interval length
   at each path length until uniqueness.
2. Build the FM-length-exponent x path-position occupancy matrix; derive the
   mean path position of each FM bin (`fm_locs`) and the mean FM exponent at
   each position (`loc_fms`).
3. Binary-search the exponent of a power function mapping path position ->
   target match fraction so that the predicted speed (expected k-mers
   evaluated per event, via the model threshold<->freq<->count table) or the
   predicted confidence probability hits the target.
4. Emit `name\\tekm0,ekm1,...\\tprob\\tspeed` lines -- consumed per FM bin by
   the mapper (our load_uncl / reference mapper.cpp:138-157).

The position sampling replicates glibc's rand() (srand(0), TYPE_3 additive
generator) so .uncl files are reproducible against reference-built ones even
when sample_dist > 1.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..config import Conf, IndexParams

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
THRESHS_NPZ = os.path.join(DATA_DIR, "r94_5mer_threshs.npz")


class GlibcRand:
    """glibc rand(): TYPE_3 additive-feedback generator (x[i]=x[i-3]+x[i-31])."""

    def __init__(self, seed: int = 0):
        if seed == 0:
            seed = 1
        r = [seed]
        for i in range(1, 31):
            # Schrage's method for 16807 * r % (2^31 - 1) without overflow
            hi, lo = divmod(r[i - 1], 127773)
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 2147483647
            r.append(word)
        for i in range(31, 34):
            r.append(r[i - 31])
        self.r = r
        self.i = 34
        for _ in range(34, 344):  # discard first 310 outputs like glibc srand
            self._next()

    def _next(self) -> int:
        r = self.r
        v = (r[self.i - 31] + r[self.i - 3]) & 0xFFFFFFFF
        r.append(v)
        self.i += 1
        return v >> 1

    def rand(self) -> int:
        return self._next()


def self_align(fmi, sample_dist: int, max_steps: int = 4096):
    """FM-length profiles of sampled positions (self_align_ref.cpp:34-91).

    Vectorized: all sampled positions walk in lockstep with an active mask;
    each step is one batched backward extension.  Returns a list of
    u64-length lists like the reference binding.
    """
    rng = GlibcRand(0)
    starts = []
    off = 0
    for ln in fmi.ref_lens:
        for i in range(int(ln)):
            if rng.rand() % sample_dist == 0:
                starts.append(off + i)
        off += int(ln)
    starts = np.asarray(starts, dtype=np.int64)
    m = len(starts)
    if m == 0:
        return []

    seq_ends = np.cumsum(np.asarray(fmi.ref_lens, dtype=np.int64))
    ends = seq_ends[np.searchsorted(seq_ends, starts, side="right")]

    # initial range: base range of the complement of the base at each start
    b0 = 3 - fmi.get_base(starts).astype(np.int64)
    lo = fmi.L2[b0].astype(np.int64)
    hi = fmi.L2[b0 + 1].astype(np.int64)

    profiles = [[] for _ in range(m)]
    pos = starts + 1
    active = np.ones(m, dtype=bool)
    for _ in range(max_steps):
        length = hi - lo + 1
        cont = active & (pos < ends) & (length > 1)
        # reference records the length *before* each extension while looping
        for i in np.flatnonzero(cont):
            profiles[i].append(int(length[i]))
        # terminal record: the loop exited with a positive length
        done_now = active & ~cont
        for i in np.flatnonzero(done_now):
            if length[i] > 0:
                profiles[i].append(int(length[i]))
        active = cont
        if not active.any():
            break
        idx = np.flatnonzero(active)
        b = 3 - fmi.get_base(pos[idx]).astype(np.int64)
        nlo, nhi = fmi.extend(lo[idx], hi[idx], b)
        lo[idx], hi[idx] = nlo, nhi
        pos[idx] += 1
    return profiles


def power_fn(xmax, ymin, ymax, exp, N=100):
    t = np.arange(0, 1 + 1.0 / N, 1.0 / N)
    return t * xmax, (t**exp) * (ymax - ymin) + ymin


class IndexParameterizer:
    """Fit .uncl threshold presets for an FMIndex (uncalled/index.py:53-209)."""

    def __init__(self, fmi, prms: IndexParams | None = None,
                 threshs_npz: str = THRESHS_NPZ):
        self.fmi = fmi
        self.prms = prms or IndexParams()
        self.functions: dict[str, tuple] = {}
        self._calc_map_stats()
        self._load_model_threshs(threshs_npz)

    # ------------------------------------------------------------ stats
    def _sample_dist(self) -> int:
        p = self.prms
        ref_len = int(np.sum(self.fmi.ref_lens))
        approx = ref_len / p.max_sample_dist
        if approx < p.min_samples:
            return int(np.ceil(ref_len / p.min_samples))
        if approx > p.max_samples:
            return int(np.floor(ref_len / p.max_samples))
        return p.max_sample_dist

    def _calc_map_stats(self):
        p = self.prms
        fmlens = self_align(self.fmi, self._sample_dist())
        k = p.kmer_len
        paths = [q[k - 1 :] if len(q) >= k else [1] for q in fmlens]

        lens = [len(q) for q in paths if len(q) <= p.max_replen]
        gt1 = np.zeros(max(lens))
        for l in lens:
            gt1[:l] += 1
        max_pathlen = int(np.flatnonzero(gt1 / len(lens) <= p.pathlen_percentile)[0])
        max_fmexp = int(np.log2(max(q[0] for q in paths))) + 1

        mat = np.zeros((max_fmexp, max_pathlen))
        for q in paths:
            ll = min(max_pathlen, len(q))
            for i in range(ll):
                mat[int(np.log2(q[i])), i] += 1
            mat[0, len(q) : max_pathlen] += 1

        pos = np.arange(max_pathlen)
        self.fm_locs = (mat * pos).sum(1) / mat.sum(1)
        exps = np.arange(max_fmexp)[:, None]
        self.loc_fms = (mat * exps).sum(0) / mat.sum(0)
        self.speed_denom = self.loc_fms.sum()
        self.conf_locs = np.arange(np.round(self.fm_locs[0]))
        self.all_locs = pos

    def _load_model_threshs(self, path):
        d = np.load(path)
        self.model_ekms = d["thresh"][::-1].astype(np.float64)
        self.model_pcks = d["freq"][::-1].astype(np.float64)
        self.model_counts = d["count"][::-1].astype(np.float64)

    # ---------------------------------------------------------- predictors
    def _speed(self, fn_locs, fn_pcks):
        pcks = np.interp(self.all_locs, fn_locs, fn_pcks)
        counts = np.interp(pcks, self.model_pcks, self.model_counts)
        return np.dot(counts, self.loc_fms) / self.speed_denom

    def _prob(self, fn_locs, fn_pcks):
        return np.prod(np.interp(self.conf_locs, fn_locs, fn_pcks))

    # -------------------------------------------------------------- fitting
    def add_preset(self, name, tgt_prob=None, tgt_speed=None, exp_st=2,
                   init_fac=2, eps=1e-5):
        p = self.prms
        exp = exp_st
        exp_min = exp_max = None
        pdelta = None
        while True:
            fn_locs, fn_pcks = power_fn(
                self.fm_locs[0], p.matchpr1, p.matchpr2, exp
            )
            if tgt_prob is not None:
                delta = self._prob(fn_locs, fn_pcks) - tgt_prob
            else:
                delta = self._speed(fn_locs, fn_pcks) - tgt_speed
            if abs(delta) <= eps:
                break
            if delta == pdelta:
                sys.stderr.write(f"Maxed out {name} parameters\n")
                break
            pdelta = delta
            if delta < 0:
                exp_max = exp
            else:
                exp_min = exp
            pexp = exp
            if exp_max is None:
                exp *= init_fac
            elif exp_min is None:
                exp /= init_fac
            else:
                exp = exp_min + (exp_max - exp_min) / 2.0
            if exp == pexp:  # fp rounding exhausted
                break

        fm_pcks = np.interp(self.fm_locs, fn_locs, fn_pcks)
        fm_ekms = np.interp(fm_pcks, self.model_pcks, self.model_ekms)
        self.functions[name] = (
            fm_ekms, self._prob(fn_locs, fn_pcks), self._speed(fn_locs, fn_pcks)
        )

    def write(self, out_path: str):
        with open(out_path, "w") as f:
            for name, (ekms, prob, speed) in self.functions.items():
                f.write(
                    "%s\t%s\t%.5f\t%.3f\n"
                    % (name, ",".join(map(str, ekms)), prob, speed)
                )


def build_uncl(fmi, prefix: str, conf: Conf | None = None, probs=None,
               speeds=None, default_speed: float = 115.0) -> str:
    """The `index` subcommand's fitting stage (scripts/uncalled:38-76)."""
    conf = conf or Conf()
    p = IndexParameterizer(fmi, conf.index)
    p.add_preset("default", tgt_speed=default_speed)
    for t in probs or []:
        try:
            p.add_preset(f"prob_{t}", tgt_prob=float(t))
        except Exception:
            sys.stderr.write(f"Failed to add 'prob_{t}'\n")
    for t in speeds or []:
        try:
            p.add_preset(f"speed_{t}", tgt_speed=float(t))
        except Exception:
            sys.stderr.write(f"Failed to add 'speed_{t}'\n")
    out = prefix + ".uncl"
    p.write(out)
    return out
