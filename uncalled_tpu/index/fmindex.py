"""FM-index over forward+reverse-complement reference text.

Layout is designed for TPU gathers, not for the libbwa in-memory format:

* ``bwt_words``  uint32[W]  -- BWT packed 16 bases/word, MSB-first (base j of
  word w sits at bits ``(15-j)*2``).  This matches BWA's *word packing* so a
  BWA ``.bwt`` file's base words can be reused directly, but our occupancy
  checkpoints live in a separate array instead of being interleaved.
* ``ckpt``       int32[W/2+1, 4] -- occ counts at every 32-base boundary
  (counts of each base in bwt[0 : 32*b)).  Separate, gather-friendly.
* ``sa_full``    int32[n+1] -- full suffix array in FM-row numbering
  (row 0 = sentinel, stored as n).  For references where 4*n bytes is
  acceptable (<= ~1 Gb, the reference's own supported domain) this makes the
  per-seed SA lookup a single gather.  A sampled-SA mode for larger
  references is a planned extension (see docs/DESIGN.md).
* row numbering / primary / occ semantics follow BWA's convention so results
  are interchangeable with indexes built by the reference
  (reference behavior: src/bwa_index.hpp:158-220; bwt_occ's
  ``k >= primary -> k-1`` adjustment and the k==-1 / k==n special cases).

Host-side queries here are vectorized numpy; the device-side equivalents
live in uncalled_tpu.ops.fm.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..kmer import K, KMER_COUNT, kmer_base, kmer_head

CKPT = 32  # bases per occ checkpoint (2 bwt words)
WORD = 16  # bases per packed uint32

_EVEN_BITS = np.uint32(0x55555555)


def pack_bwt(bwt: np.ndarray) -> np.ndarray:
    """uint8 base codes -> uint32 words, 16 bases/word MSB-first."""
    n = len(bwt)
    W = (n + WORD - 1) // WORD
    padded = np.zeros(W * WORD, dtype=np.uint32)
    padded[:n] = bwt
    padded = padded.reshape(W, WORD)
    shifts = np.arange(WORD - 1, -1, -1, dtype=np.uint32) * 2
    return (padded << shifts).sum(axis=1, dtype=np.uint32)


def build_ckpt(bwt: np.ndarray, n: int) -> np.ndarray:
    """occ checkpoints: counts of each base in bwt[0 : 32*b) for b in 0..nb."""
    nb = (n + CKPT - 1) // CKPT
    padded = np.zeros(nb * CKPT, dtype=np.uint8)
    padded[:n] = bwt[:n]
    blocks = padded.reshape(nb, CKPT)
    counts = np.zeros((nb, 4), dtype=np.int64)
    for c in range(4):
        counts[:, c] = (blocks == c).sum(axis=1)
    # exclude padding from the final block's contribution
    if n % CKPT:
        tail = blocks[-1, n % CKPT :]
        counts[-1, 0] -= np.count_nonzero(tail == 0)
    ckpt = np.zeros((nb + 1, 4), dtype=np.int64)
    np.cumsum(counts, axis=0, out=ckpt[1:])
    return ckpt.astype(np.int32)


@dataclass
class FMIndex:
    n: int  # BWT length == 2 * l_pac
    primary: int
    L2: np.ndarray  # int64[5], cumulative base counts (L2[0] == 0)
    bwt_words: np.ndarray  # uint32[W]
    ckpt: np.ndarray  # int32[nb+1, 4]
    sa_full: np.ndarray  # int32[n+1]; sa_full[0] == n (sentinel)
    l_pac: int
    ref_names: list
    ref_offsets: np.ndarray  # int64[n_seqs]
    ref_lens: np.ndarray  # int64[n_seqs]
    kmer_ranges: np.ndarray = field(default=None)  # int64[1024, 2] inclusive
    pac: np.ndarray = field(default=None)  # packed forward ref, uint8[ceil(l_pac/4)]

    # ------------------------------------------------------------------ occ
    def occ(self, k, c):
        """# of occurrences of base c in BWT rows [0, k] (full numbering).

        Vectorized over k/c arrays. Replicates BWA bwt_occ semantics:
        k == -1 -> 0; k == n -> total count; rows >= primary shift by one
        because the sentinel is not stored.
        """
        k = np.asarray(k, dtype=np.int64)
        c = np.asarray(c, dtype=np.int64)
        k, c = np.broadcast_arrays(k, c)
        out = np.zeros(k.shape, dtype=np.int64)

        is_neg = k < 0
        is_full = k >= self.n
        mid = ~(is_neg | is_full)

        kk = np.where(k >= self.primary, k - 1, k)
        kk = np.clip(kk, 0, self.n - 1)

        blk = kk // CKPT
        base_cnt = self.ckpt[blk, c]

        # count matches in bwt[32*blk .. kk] inclusive
        w0 = blk * (CKPT // WORD)
        rem = kk - blk * CKPT  # 0..31
        pat = (c * 0x55555555).astype(np.uint32)  # base value repeated in every 2-bit slot
        cnt = np.zeros(k.shape, dtype=np.int64)
        for wi in range(CKPT // WORD):
            word = self.bwt_words[np.minimum(w0 + wi, len(self.bwt_words) - 1)]
            x = word ^ pat
            m = (~x) & ((~x) >> np.uint32(1)) & _EVEN_BITS
            # number of bases of this word included: rem - 16*wi + 1, clipped 0..16
            inc = np.clip(rem - WORD * wi + 1, 0, WORD)
            pm = np.where(
                inc >= WORD,
                np.uint32(0xFFFFFFFF),
                (np.uint32(0xFFFFFFFF) << ((WORD - inc.astype(np.uint32)) * 2)).astype(
                    np.uint32
                )
                * (inc > 0),
            ).astype(np.uint32)
            cnt += popcount32(m & pm)

        out[mid] = (base_cnt + cnt)[mid]
        out[is_full] = (self.L2[c + 1] - self.L2[c])[is_full] if c.ndim else int(
            self.L2[c + 1] - self.L2[c]
        )
        out[is_neg] = 0
        return out

    # -------------------------------------------------------------- queries
    def extend(self, start, end, base):
        """Backward-extend FM interval(s) [start, end] with `base`.

        Matches BwaIndex::get_neighbor (bwa_index.hpp:158-162):
        new = [L2[b] + occ(start-1, b) + 1,  L2[b] + occ(end, b)].
        Invalid results have start > end.
        """
        start = np.asarray(start, dtype=np.int64)
        end = np.asarray(end, dtype=np.int64)
        base = np.asarray(base, dtype=np.int64)
        os_ = self.occ(start - 1, base)
        oe = self.occ(end, base)
        return self.L2[base] + os_ + 1, self.L2[base] + oe

    def base_range(self, base):
        """Initial interval for a single base: [L2[b], L2[b+1]]."""
        return int(self.L2[base]), int(self.L2[base + 1])

    def sa(self, rows):
        """Suffix-array values for FM rows (full numbering)."""
        return self.sa_full[np.asarray(rows, dtype=np.int64)].astype(np.int64)

    def translate_loc(self, sa_loc: int):
        """pac coordinate -> (ref_name, ref_offset, ref_len); BwaIndex::translate_loc."""
        rid = int(np.searchsorted(self.ref_offsets, sa_loc, side="right") - 1)
        if rid < 0 or rid >= len(self.ref_names):
            return None, 0, 0
        return (
            self.ref_names[rid],
            int(sa_loc - self.ref_offsets[rid]),
            int(self.ref_lens[rid]),
        )

    def get_base(self, i):
        """Forward-strand base at pac coordinate i (requires pac)."""
        i = np.asarray(i, dtype=np.int64)
        return (self.pac[i >> 2] >> (((i ^ 3) & 3) * 2).astype(np.uint8)) & 3


    def range_to_fms(self, ref_name: str, start: int, end: int):
        """FM rows covering each position of a reference range, both
        strands: (rev_fms, fwd_fms) — BwaIndex::range_to_fms
        (bwa_index.hpp:265-333), the debug flow's reverse mapping from
        annotation coordinates to FM coordinates.

        Walks a backward extension seeded ``slop = ceil(log4(ref_len))``
        bases outside the range, pins the exact row by scanning the SA
        for the range boundary, then records the row at every step of
        the in-range walk.  Requires ``pac``.
        """
        assert self.pac is not None, "range_to_fms needs the packed ref"
        ref_len = self.n // 2
        slop = int(np.ceil(np.log(max(ref_len, 2)) / np.log(4)))
        pac_min = self.get_sa_loc(ref_name, start)
        pac_max = pac_min + (end - start) - 1

        def gb(i):
            return int(self.get_base(i))

        # forward strand: extend from pac_max+slop down to pac_max,
        # disambiguate via SA, then record rows down to pac_min
        fwd_st = pac_max + slop if ref_len - pac_max > slop else ref_len - 1
        r = self.base_range(gb(fwd_st))
        i = fwd_st - 1
        while i >= pac_max and i <= fwd_st:
            r = self.extend(r[0], r[1], gb(i))
            i -= 1
        for f in range(int(r[0]), int(r[1]) + 1):
            if int(self.sa(f)) == pac_max:
                r = (f, f)
                break
        fwd_fms = [int(r[0])]
        i = pac_max - 1
        while i >= pac_min and i < pac_max:
            r = self.extend(r[0], r[1], gb(i))
            fwd_fms.append(int(r[0]))
            i -= 1

        # reverse strand: same walk on the complement, ascending
        rev_st = pac_min - slop if pac_min > slop else 0
        r = self.base_range(3 - gb(rev_st))
        for i in range(rev_st + 1, pac_min + 1):
            r = self.extend(r[0], r[1], 3 - gb(i))
        for f in range(int(r[0]), int(r[1]) + 1):
            if self.n - int(self.sa(f)) == pac_min:
                r = (f, f)
                break
        rev_fms = [int(r[0])]
        for i in range(pac_min + 1, pac_max + 1):
            r = self.extend(r[0], r[1], 3 - gb(i))
            rev_fms.append(int(r[0]))

        return rev_fms, fwd_fms

    def get_sa_loc(self, name: str, coord: int) -> int:
        rid = self.ref_names.index(name)
        return int(self.ref_offsets[rid]) + coord

    # ---------------------------------------------------------- kmer ranges
    def compute_kmer_ranges(self) -> np.ndarray:
        """FM ranges of every k-mer, walked head-first like the reference
        (bwa_index.hpp:124-132): the stored range for k-mer `x` is the range
        of the *reversed* k-mer string, which is what backward extension
        produces during mapping."""
        kmers = np.arange(KMER_COUNT)
        starts = self.L2[kmer_head(kmers, K)].astype(np.int64)
        ends = self.L2[kmer_head(kmers, K) + 1].astype(np.int64)
        for i in range(1, K):
            b = kmer_base(kmers, i, K)
            starts, ends = self.extend(starts, ends, b)
        self.kmer_ranges = np.stack([starts, ends], axis=1)
        return self.kmer_ranges

    # ------------------------------------------------------------- save/load
    def save(self, prefix: str) -> None:
        if self.kmer_ranges is None:
            self.compute_kmer_ranges()
        np.savez_compressed(
            prefix + ".utidx.npz",
            n=self.n,
            primary=self.primary,
            L2=self.L2,
            bwt_words=self.bwt_words,
            ckpt=self.ckpt,
            sa_full=self.sa_full,
            l_pac=self.l_pac,
            ref_offsets=self.ref_offsets,
            ref_lens=self.ref_lens,
            kmer_ranges=self.kmer_ranges,
            pac=self.pac if self.pac is not None else np.zeros(0, np.uint8),
            ref_names=json.dumps(self.ref_names),
        )

    @staticmethod
    def load(prefix: str) -> "FMIndex":
        path = prefix if prefix.endswith(".utidx.npz") else prefix + ".utidx.npz"
        d = np.load(path)
        pac = d["pac"]
        return FMIndex(
            n=int(d["n"]),
            primary=int(d["primary"]),
            L2=d["L2"],
            bwt_words=d["bwt_words"],
            ckpt=d["ckpt"],
            sa_full=d["sa_full"],
            l_pac=int(d["l_pac"]),
            ref_names=json.loads(str(d["ref_names"])),
            ref_offsets=d["ref_offsets"],
            ref_lens=d["ref_lens"],
            kmer_ranges=d["kmer_ranges"],
            pac=pac if len(pac) else None,
        )

    @staticmethod
    def from_arrays(bwt: np.ndarray, primary: int, sa: np.ndarray, l_pac: int,
                    ref_names, ref_offsets, ref_lens, pac=None) -> "FMIndex":
        """Assemble from a raw (sentinel-dropped) BWT + full-numbering SA."""
        n = len(bwt)
        counts = np.bincount(bwt, minlength=4)[:4]
        L2 = np.zeros(5, dtype=np.int64)
        np.cumsum(counts, out=L2[1:])
        fm = FMIndex(
            n=n,
            primary=int(primary),
            L2=L2,
            bwt_words=pack_bwt(bwt),
            ckpt=build_ckpt(bwt, n),
            sa_full=sa.astype(np.int32),
            l_pac=int(l_pac),
            ref_names=list(ref_names),
            ref_offsets=np.asarray(ref_offsets, dtype=np.int64),
            ref_lens=np.asarray(ref_lens, dtype=np.int64),
            pac=pac,
        )
        fm.compute_kmer_ranges()
        return fm


def popcount32(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint32 wraparound is intended
        x = np.asarray(x, dtype=np.uint32)
        x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
        x = (x & np.uint32(0x33333333)) + ((x >> np.uint32(2)) & np.uint32(0x33333333))
        x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
        return ((x * np.uint32(0x01010101)) >> np.uint32(24)).astype(np.int64)


def load_index(prefix: str) -> FMIndex:
    """Load an index by prefix: our .utidx.npz if present, else BWA files."""
    if os.path.exists(prefix + ".utidx.npz") or prefix.endswith(".utidx.npz"):
        return FMIndex.load(prefix)
    if os.path.exists(prefix + ".bwt"):
        from .bwa_compat import load_bwa_index

        return load_bwa_index(prefix)
    raise FileNotFoundError(f"no index found at {prefix} (.utidx.npz or .bwt)")
