"""2-bit DNA base / k-mer primitives.

TPU-first design notes
----------------------
Everything here is expressed as vectorized integer math on numpy/JAX arrays so
the same functions run on host (numpy) and inside jitted TPU programs (jnp).
K-mers are packed MSB-first: base at position 0 (leftmost / 5'-most) occupies
the highest 2 bits, matching the on-disk model table ordering (AAAAA == 0).

Behavioral parity: reference `src/bp.hpp` (encoding at bp.hpp:36, neighbor at
bp.hpp:107, complement at bp.hpp:78, revcomp at bp.hpp:83).
"""

from __future__ import annotations

import numpy as np

K = 5  # model k-mer length (r9.4.1 5-mers)
BASE_COUNT = 4
KMER_COUNT = BASE_COUNT**K
KMER_MASK = KMER_COUNT - 1

BASES = "ACGT"

# ASCII -> 2-bit code; 4 == ambiguous (N or anything else)
_BYTE_TO_CODE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate(BASES):
    _BYTE_TO_CODE[ord(_c)] = _i
    _BYTE_TO_CODE[ord(_c.lower())] = _i


def seq_to_codes(seq: str | bytes) -> np.ndarray:
    """ASCII sequence -> uint8 codes (A=0 C=1 G=2 T=3, other=4)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return _BYTE_TO_CODE[np.frombuffer(seq, dtype=np.uint8)]


def codes_to_seq(codes) -> str:
    return "".join("ACGTN"[c] for c in np.asarray(codes))


def str_to_kmer(s: str) -> int:
    v = 0
    for ch in s:
        v = (v << 2) | int(_BYTE_TO_CODE[ord(ch)])
    return v


def kmer_to_str(kmer: int, k: int = K) -> str:
    return "".join(BASES[(kmer >> (2 * (k - 1 - i))) & 3] for i in range(k))


def kmer_comp(kmer, k: int = K):
    """Base-wise complement (no reversal): XOR with all-ones per base."""
    return kmer ^ ((1 << (2 * k)) - 1)


def kmer_neighbor(kmer, base, k: int = K):
    """Append `base` on the right, dropping the leftmost base."""
    return ((kmer << 2) & ((1 << (2 * k)) - 1)) | base


def kmer_head(kmer, k: int = K):
    """Leftmost (most significant) base of the k-mer."""
    return (kmer >> (2 * (k - 1))) & 3


def kmer_base(kmer, i, k: int = K):
    """Base at position i counted from the left."""
    return (kmer >> (2 * (k - 1 - i))) & 3


def kmer_revcomp(kmer: int, k: int = K) -> int:
    """Reverse complement of a packed k-mer."""
    v = (~kmer) & 0xFFFF
    v = ((v >> 2) & 0x3333) | ((v & 0x3333) << 2)
    v = ((v >> 4) & 0x0F0F) | ((v & 0x0F0F) << 4)
    v = ((v >> 8) & 0x00FF) | ((v & 0x00FF) << 8)
    return v >> (2 * (8 - k))


def seq_to_kmers(codes: np.ndarray, k: int = K) -> np.ndarray:
    """All overlapping k-mers of a 2-bit code sequence (vectorized).

    codes must contain only values 0..3. Returns int32 array of length
    len(codes) - k + 1.
    """
    codes = np.asarray(codes, dtype=np.int64)
    if len(codes) < k:
        return np.zeros(0, dtype=np.int32)
    out = np.zeros(len(codes) - k + 1, dtype=np.int64)
    for i in range(k):
        out |= codes[i : len(codes) - k + 1 + i] << (2 * (k - 1 - i))
    return out.astype(np.int32)
