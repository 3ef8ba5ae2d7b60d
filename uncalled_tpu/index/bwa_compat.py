"""Loader for BWA-format index files (.bwt/.sa/.ann/.amb/.pac).

Lets users point uncalled_tpu at an index built by `bwa index` / the
reference's `uncalled index`, and lets our tests golden-check our own
builder against the example index shipped with the reference.

File formats (all little-endian, observed from libbwa's dump routines, which
the reference wraps via src/bwa_index.hpp:116-135):

.bwt: u64 primary; u64 L2[1..4]; u32 words with 4 u64 occ counts interleaved
      every 128 bases (OCC_INTERVAL), base words 16 bases each MSB-first.
.sa:  u64 primary; u64 L2[1..4]; u64 sa_intv; u64 seq_len; u64 sa[1..n_sa-1]
      (row-sampled every sa_intv rows; sa[0] == -1 is not stored).
.ann: text: "l_pac n_seqs seed"; per seq two lines: "gi name [anno]" and
      "offset len n_ambs".
.pac: packed forward reference, 4 bases/byte MSB-first; trailing byte holds
      l_pac % 4 (with an extra 0 byte first when l_pac % 4 == 0).
"""

from __future__ import annotations

import numpy as np

from .fmindex import FMIndex, WORD, build_ckpt, pack_bwt

OCC_INTERVAL = 0x80  # 128 bases per interleaved checkpoint in .bwt files


def read_ann(prefix: str):
    with open(prefix + ".ann") as f:
        l_pac, n_seqs, _seed = (int(x) for x in f.readline().split())
        names, offsets, lens = [], [], []
        for _ in range(n_seqs):
            parts = f.readline().split()
            names.append(parts[1])
            off, ln, _nambs = (int(x) for x in f.readline().split())
            offsets.append(off)
            lens.append(ln)
    return l_pac, names, np.array(offsets, np.int64), np.array(lens, np.int64)


def read_pac(prefix: str, l_pac: int) -> np.ndarray:
    raw = np.fromfile(prefix + ".pac", dtype=np.uint8)
    # last byte stores l_pac % 4; data bytes precede it
    return raw[: (l_pac + 3) // 4]


def read_bwt(prefix: str):
    """Returns (primary, L2[5], bwt_words uint32[W]) with occ words stripped."""
    raw = np.fromfile(prefix + ".bwt", dtype=np.uint8)
    primary = int(np.frombuffer(raw[:8], dtype="<u8")[0])
    L2 = np.zeros(5, dtype=np.int64)
    L2[1:] = np.frombuffer(raw[8:40], dtype="<u8").astype(np.int64)
    words = np.frombuffer(raw[40:], dtype="<u4")
    n = int(L2[4])

    # interleaved layout: per 128-base block: 8 words of u64 counts (skip),
    # then 8 words of bases; a trailing 4xu64 count block ends the file.
    n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
    base_words_per_block = OCC_INTERVAL // WORD  # 8
    stride = 8 + base_words_per_block  # 16 words
    total_base_words = (n + WORD - 1) // WORD

    idx = (
        np.arange(n_blocks)[:, None] * stride
        + 8
        + np.arange(base_words_per_block)[None, :]
    ).ravel()[:total_base_words]
    bwt_words = words[idx].astype(np.uint32)
    return primary, L2, bwt_words


def read_sa(prefix: str):
    raw = np.fromfile(prefix + ".sa", dtype="<u8")
    primary = int(raw[0])
    sa_intv = int(raw[5])
    seq_len = int(raw[6])
    sa_sampled = raw[7:].astype(np.int64)  # rows sa_intv, 2*sa_intv, ...
    return primary, sa_intv, seq_len, sa_sampled


def unpack_bwt_words(bwt_words: np.ndarray, n: int) -> np.ndarray:
    """uint32 words -> uint8 base codes[n]."""
    W = len(bwt_words)
    shifts = (np.arange(WORD - 1, -1, -1, dtype=np.uint32) * 2)[None, :]
    bases = ((bwt_words[:, None] >> shifts) & 3).astype(np.uint8).ravel()
    return bases[:n]


def reconstruct_full_sa(
    bwt: np.ndarray, primary: int, L2: np.ndarray, sa_intv: int, sa_sampled: np.ndarray
) -> np.ndarray:
    """Full SA (int32[n+1], full-row numbering; row 0 stores n) from a
    row-sampled BWA .sa file.

    For every unknown row we LF-walk until a known row is reached; since
    SA(LF(r)) == SA(r) - 1, SA(r) = SA(known) + steps. The walk is fully
    vectorized over a shrinking set of unresolved rows (each iteration is
    one gather), instead of BWA's per-query sequential loop.
    """
    n = len(bwt)
    # rank[j] = # of bwt[j]-valued entries among bwt[0..j-1]
    ranks = np.zeros(n, dtype=np.int64)
    for c in range(4):
        mask = bwt == c
        ranks[mask] = np.cumsum(mask)[mask] - 1

    # full-numbering LF table: row r != primary stores char at index
    # j = r - (r > primary); LF(r) = L2[c] + rank[j] + 1 (+1 = sentinel row 0)
    rows = np.arange(n + 1, dtype=np.int64)
    j = rows - (rows > primary)
    j[primary] = 0  # placeholder; LF(primary) fixed below
    c = bwt[np.clip(j, 0, n - 1)].astype(np.int64)
    lf = L2[c] + ranks[np.clip(j, 0, n - 1)] + 1
    lf[primary] = 0

    sa_full = np.full(n + 1, -1, dtype=np.int64)
    sa_full[0] = n
    sa_full[primary] = 0
    # file sample m holds SA of full row (m+1)*sa_intv
    samp_rows = (np.arange(len(sa_sampled), dtype=np.int64) + 1) * sa_intv
    sa_full[samp_rows] = sa_sampled

    unknown = np.flatnonzero(sa_full < 0)
    cur = lf[unknown]
    dist = np.ones(len(unknown), dtype=np.int64)
    while len(unknown):
        vals = sa_full[cur]
        found = vals >= 0
        if found.any():
            sa_full[unknown[found]] = vals[found] + dist[found]
            keep = ~found
            unknown, cur, dist = unknown[keep], cur[keep], dist[keep]
        cur = lf[cur]
        dist += 1
    return sa_full.astype(np.int32)


def load_bwa_index(prefix: str) -> FMIndex:
    l_pac, names, offsets, lens = read_ann(prefix)
    primary, L2, bwt_words = read_bwt(prefix)
    n = int(L2[4])
    bwt = unpack_bwt_words(bwt_words, n)
    _, sa_intv, seq_len, sa_sampled = read_sa(prefix)
    assert seq_len == n
    sa_full = reconstruct_full_sa(bwt, primary, L2, sa_intv, sa_sampled)
    pac = read_pac(prefix, l_pac)
    fm = FMIndex(
        n=n,
        primary=primary,
        L2=L2,
        bwt_words=bwt_words,
        ckpt=build_ckpt(bwt, n),
        sa_full=sa_full,
        l_pac=l_pac,
        ref_names=names,
        ref_offsets=offsets,
        ref_lens=lens,
        pac=pac,
    )
    fm.compute_kmer_ranges()
    return fm


def write_bwa_index(fmi: FMIndex, prefix: str, sa_intv: int = 32) -> None:
    """Write BWA-format index files from an FMIndex (the inverse of the
    readers above), so the reference binary / golden rig can map against
    references we built ourselves (tools/golden_rig/minibwa.cpp reads
    exactly this layout)."""
    n = fmi.n

    # .bwt: primary, L2[1..4], then per 128-base block 8 count words
    # (u64[4] as 8 u32) + 8 base words, plus the trailing count block
    n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
    base_words_per_block = OCC_INTERVAL // WORD
    total_base_words = (n + WORD - 1) // WORD
    # cumulative counts BEFORE each 128-base block, from the 32-base ckpt
    blk_counts = fmi.ckpt[:: OCC_INTERVAL // 32][: n_blocks + 1].astype(
        "<u8"
    )
    if len(blk_counts) < n_blocks + 1:  # final partial block's tail count
        blk_counts = np.vstack([blk_counts, fmi.ckpt[-1].astype("<u8")])
    words = np.zeros(n_blocks * (8 + base_words_per_block), dtype="<u4")
    wview = words.reshape(n_blocks, 8 + base_words_per_block)
    wview[:, :8] = (
        blk_counts[:n_blocks].astype("<u8").view("<u4").reshape(n_blocks, 8)
    )
    base_words = np.zeros(n_blocks * base_words_per_block, dtype="<u4")
    base_words[:total_base_words] = fmi.bwt_words.astype("<u4")
    wview[:, 8:] = base_words.reshape(n_blocks, base_words_per_block)
    with open(prefix + ".bwt", "wb") as f:
        np.asarray([fmi.primary], dtype="<u8").tofile(f)
        np.asarray(fmi.L2[1:5], dtype="<u8").tofile(f)
        words.tofile(f)
        # trailing full-count block (bwa appends the final occ counts)
        blk_counts[n_blocks].astype("<u8").tofile(f)

    # .sa: primary, L2[1..4], sa_intv, seq_len, then sa of rows
    # sa_intv, 2*sa_intv, ... (sa[0] = -1 is implicit)
    n_sa = (n + sa_intv) // sa_intv
    samp = fmi.sa_full[:: sa_intv][1:n_sa].astype("<u8")
    with open(prefix + ".sa", "wb") as f:
        np.asarray([fmi.primary], dtype="<u8").tofile(f)
        np.asarray(fmi.L2[1:5], dtype="<u8").tofile(f)
        np.asarray([sa_intv, n], dtype="<u8").tofile(f)
        samp.tofile(f)

    # .ann / .amb
    with open(prefix + ".ann", "w") as f:
        f.write(f"{fmi.l_pac} {len(fmi.ref_names)} 11\n")
        for name, off, ln in zip(fmi.ref_names, fmi.ref_offsets, fmi.ref_lens):
            f.write(f"0 {name} (null)\n")
            f.write(f"{int(off)} {int(ln)} 0\n")
    with open(prefix + ".amb", "w") as f:
        f.write(f"{fmi.l_pac} {len(fmi.ref_names)} 0\n")

    # .pac (packed forward reference; trailing l_pac%4 byte per bwa)
    if fmi.pac is not None:
        with open(prefix + ".pac", "wb") as f:
            fmi.pac.astype(np.uint8).tofile(f)
            if fmi.l_pac % 4 == 0:
                np.zeros(1, np.uint8).tofile(f)
            np.asarray([fmi.l_pac % 4], np.uint8).tofile(f)
