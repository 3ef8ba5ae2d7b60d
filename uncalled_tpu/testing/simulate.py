"""Synthetic nanopore signal simulator.

Generates r9.4.1-like current traces from a reference sequence using the pore
model: per-base dwell times around the real ~2 events/bp rate with Gaussian
level noise. Used for golden/differential tests (reads with known truth
positions) and throughput benchmarks at arbitrary scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..kmer import K, seq_to_codes, seq_to_kmers
from ..poremodel import PoreModel


@dataclass
class SimRead:
    id: str
    signal: np.ndarray
    ref_name: str
    ref_start: int
    ref_end: int
    fwd: bool

    # duck-type the io.fast5.Read interface
    channel: int = 1
    number: int = 0
    start_sample: int = 0

    @property
    def raw_len(self):
        return len(self.signal)


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return (3 - codes)[::-1]


def signal_from_codes(
    codes: np.ndarray,
    model: PoreModel,
    rng: np.random.Generator,
    mean_dwell: float = 9.6,
    noise: float = 1.0,
    drift_scale: float = 1.0,
    drift_shift: float = 0.0,
) -> np.ndarray:
    """Simulate raw current for a 5'->3' base sequence.

    The template pore model (uncomplemented) gives per-k-mer level means/stdvs;
    dwells are geometric-ish (clipped lognormal) around mean_dwell samples.
    """
    assert not model.complement, "simulate with the template model"
    kmers = seq_to_kmers(codes)
    levels = model.means[kmers]
    stdvs = np.sqrt(model.vars_x2[kmers] / 2.0)
    dwells = np.maximum(
        2, rng.lognormal(np.log(mean_dwell * 0.85), 0.45, len(kmers))
    ).astype(np.int64)
    total = int(dwells.sum())
    out = np.empty(total, dtype=np.float32)
    pos = 0
    starts = np.concatenate([[0], np.cumsum(dwells)])
    idx = np.repeat(np.arange(len(kmers)), dwells)
    out = (
        levels[idx] * drift_scale
        + drift_shift
        + rng.normal(0.0, noise * np.maximum(stdvs[idx], 1.0))
    ).astype(np.float32)
    return out


def simulate_reads(
    ref_fasta: str,
    n_reads: int,
    read_len_bp: tuple[int, int] = (1000, 4000),
    seed: int = 0,
    noise: float = 1.0,
    model: PoreModel | None = None,
) -> list[SimRead]:
    from ..index.build import read_fasta

    model = model or PoreModel.load_npz(complement=False)
    rng = np.random.default_rng(seed)
    seqs = [(n, seq_to_codes(s)) for n, s in read_fasta(ref_fasta)]
    reads = []
    for i in range(n_reads):
        name, codes = seqs[rng.integers(len(seqs))]
        L = int(rng.integers(read_len_bp[0], read_len_bp[1] + 1))
        L = min(L, len(codes) - K)
        st = int(rng.integers(0, len(codes) - L + 1))
        frag = codes[st : st + L]
        fwd = bool(rng.integers(2))
        if not fwd:
            frag = revcomp_codes(frag)
        sig = signal_from_codes(frag, model, rng, noise=noise)
        reads.append(
            SimRead(
                id=f"sim_{i:04d}_{name[:16]}_{st}_{'+' if fwd else '-'}",
                signal=sig,
                ref_name=name,
                ref_start=st,
                ref_end=st + L,
                fwd=fwd,
                number=i,
            )
        )
    return reads


def random_noise_read(n_samples: int, seed: int = 0) -> SimRead:
    """A read of pure noise (should map nowhere)."""
    rng = np.random.default_rng(seed)
    sig = rng.normal(90.0, 12.0, n_samples).astype(np.float32)
    return SimRead(
        id=f"noise_{seed}", signal=sig, ref_name="", ref_start=0, ref_end=0,
        fwd=True, number=seed,
    )
