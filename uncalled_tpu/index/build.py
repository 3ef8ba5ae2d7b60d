"""Build an FM-index from a FASTA reference.

Text layout matches the reference/BWA convention so mapping results are
interchangeable: T = forward concatenation of all sequences (no separators)
followed by the reverse complement of the whole thing (see the layer notes in
SURVEY.md; reference strand decoding relies on this at mapper.cpp:709).

Ambiguous bases are replaced by deterministic pseudo-random bases using a
drand48-family replica seeded with 11, reproducing BWA's behavior so indexes
built from the same FASTA agree base-for-base with BWA-built ones.
"""

from __future__ import annotations

import numpy as np

from ..kmer import seq_to_codes
from .fmindex import FMIndex


class Rand48:
    """Replica of the POSIX rand48 LCG (used by BWA for ambiguous bases)."""

    A = 0x5DEECE66D
    C = 0xB
    MASK = (1 << 48) - 1

    def __init__(self, seed: int):
        self.x = ((seed & 0xFFFFFFFF) << 16) | 0x330E

    def lrand48(self) -> int:
        self.x = (self.A * self.x + self.C) & self.MASK
        return self.x >> 17  # non-negative long in [0, 2^31)


def read_fasta(path: str):
    """Yields (name, sequence-bytes)."""
    name = None
    chunks: list[bytes] = []
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if line.startswith(b">"):
                if name is not None:
                    yield name, b"".join(chunks)
                name = line[1:].split()[0].decode()
                chunks = []
            elif line:
                chunks.append(line)
    if name is not None:
        yield name, b"".join(chunks)


def suffix_array_numpy(text: np.ndarray) -> np.ndarray:
    """O(n log^2 n) doubling fallback when the native SA-IS lib is missing."""
    n = len(text)
    rank = text.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        tmp[sa[0]] = 0
        prev, cur = sa[:-1], sa[1:]
        newgrp = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[cur] = np.cumsum(newgrp)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa.astype(np.int32)


def build_index(fasta_path: str, rand_seed: int = 11) -> FMIndex:
    names, offsets, lens = [], [], []
    parts = []
    off = 0
    for name, seq in read_fasta(fasta_path):
        codes = seq_to_codes(seq)
        names.append(name)
        offsets.append(off)
        lens.append(len(codes))
        off += len(codes)
        parts.append(codes)
    fwd = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    l_pac = len(fwd)
    if l_pac == 0:
        raise ValueError(f"no sequence data in {fasta_path}")

    # ambiguous bases -> deterministic random (BWA parity: lrand48()&3, seed 11)
    amb = np.flatnonzero(fwd > 3)
    if len(amb):
        rng = Rand48(rand_seed)
        fwd = fwd.copy()
        for i in amb:
            fwd[i] = rng.lrand48() & 3

    # full text: forward + reverse complement
    text = np.concatenate([fwd, (3 - fwd)[::-1]]).astype(np.uint8)

    from .. import native

    sa = native.suffix_array(text)
    if sa is None:
        sa = suffix_array_numpy(text)

    res = native.bwt_from_sa(text, sa)
    if res is not None:
        bwt, primary = res
    else:
        n = len(text)
        primary = int(np.flatnonzero(sa == 0)[0]) + 1
        keep = sa != 0
        bwt = np.concatenate(
            [[text[n - 1]], text[sa[keep] - 1]]
        ).astype(np.uint8)

    # full-numbering SA: row 0 = sentinel (n), rows 1.. = sa with the
    # primary row's 0 kept in place
    n = len(text)
    sa_full = np.empty(n + 1, dtype=np.int32)
    sa_full[0] = n
    sa_full[1:] = sa

    # packed forward reference (pac) for kmer extraction / debug
    pac_len = (l_pac + 3) // 4
    padded = np.zeros(pac_len * 4, dtype=np.uint8)
    padded[:l_pac] = fwd
    shifts = np.array([6, 4, 2, 0], dtype=np.uint8)
    pac = (padded.reshape(-1, 4) << shifts).sum(axis=1).astype(np.uint8)

    return FMIndex.from_arrays(
        bwt=bwt,
        primary=primary,
        sa=sa_full,
        l_pac=l_pac,
        ref_names=names,
        ref_offsets=offsets,
        ref_lens=lens,
        pac=pac,
    )
