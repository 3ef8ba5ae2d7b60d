"""FM-index correctness: build-from-scratch vs naive suffix-array reference,
and BWA-format compatibility (reference behavior: src/bwa_index.hpp:158-220).
"""

import os

import numpy as np
import pytest

from uncalled_tpu.index.build import build_index, read_fasta
from uncalled_tpu.index.bwa_compat import load_bwa_index
from uncalled_tpu.index.fmindex import FMIndex, load_index
from uncalled_tpu.kmer import K, KMER_COUNT, seq_to_codes, seq_to_kmers

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def naive_fm(text_codes):
    """Brute-force FM facts for a small 2-bit text (with implicit sentinel)."""
    n = len(text_codes)
    s = list(text_codes)
    # suffix array over text + sentinel (sentinel smallest, at position n)
    suffixes = sorted(range(n + 1), key=lambda i: s[i:] + [-1])
    sa = np.array(suffixes)
    return sa


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 997))
    fa = tmp_path_factory.mktemp("fa") / "small.fa"
    fa.write_text(f">chr_test\n{seq}\n")
    return build_index(str(fa)), seq


def test_sa_matches_naive(small_index):
    fmi, seq = small_index
    codes = seq_to_codes(seq)
    rc = (3 - codes)[::-1]
    text = np.concatenate([codes, rc])  # forward + revcomp, BWA layout
    sa = naive_fm(text)
    assert fmi.n == len(text)
    got = fmi.sa_full[: len(sa)]
    assert np.array_equal(np.asarray(got, dtype=np.int64), sa)


def test_kmer_ranges_count_occurrences(small_index):
    """kmer_ranges[x] is the FM range of the *reversed* k-mer string (what
    backward extension during mapping produces; bwa_index.hpp:124-132).

    The reference initializes base ranges as [L2[b], L2[b+1]]
    (bwa_index.hpp:173) — one row below the textbook [L2[b]+1, L2[b+1]] —
    so walked ranges may be inflated by a row; we preserve that quirk for
    parity and assert the count within that slack.
    """
    fmi, seq = small_index
    codes = seq_to_codes(seq)
    rc = (3 - codes)[::-1]
    text = np.concatenate([codes, rc])
    kmers = seq_to_kmers(text)
    counts = np.bincount(kmers, minlength=KMER_COUNT)
    # reversal permutation: k-mer x -> index of reversed base string
    ks = np.arange(KMER_COUNT)
    rev = np.zeros(KMER_COUNT, dtype=np.int64)
    for i in range(K):
        rev |= ((ks >> (2 * i)) & 3) << (2 * (K - 1 - i))
    ranges = fmi.kmer_ranges
    lens = np.where(ranges[:, 1] >= ranges[:, 0], ranges[:, 1] - ranges[:, 0] + 1, 0)
    diff = lens - counts[rev]
    assert diff.min() >= 0
    assert diff.max() <= K  # quirk inflation only
    assert (diff == 0).mean() > 0.9  # exact for the vast majority


def test_extend_vs_naive_search(small_index):
    fmi, seq = small_index
    codes = seq_to_codes(seq)
    rc = (3 - codes)[::-1]
    text = np.concatenate([codes, rc])
    rng = np.random.default_rng(1)
    for _ in range(30):
        qlen = int(rng.integers(1, 12))
        st = int(rng.integers(0, len(text) - qlen))
        q = text[st : st + qlen]
        # backward search of q with the textbook init [L2[b]+1, L2[b+1]]
        # (this validates occ/extend math exactly; the reference's
        # [L2[b], L2[b+1]] init quirk is covered by the k-mer range test)
        lo, hi = fmi.base_range(q[-1])
        lo += 1
        for b in q[-2::-1]:
            lo, hi = fmi.extend(lo, hi, int(b))
        # count occurrences naively
        want = sum(
            1
            for i in range(len(text) - qlen + 1)
            if np.array_equal(text[i : i + qlen], q)
        )
        got = int(hi - lo + 1) if hi >= lo else 0
        assert got == want
        if got:
            locs = sorted(int(fmi.sa_full[r]) for r in range(int(lo), int(hi) + 1))
            naive_locs = sorted(
                i
                for i in range(len(text) - qlen + 1)
                if np.array_equal(text[i : i + qlen], q)
            )
            assert locs == naive_locs


def test_bwa_compat_equals_own_build(tmp_path):
    """Our SA-IS build of the example ref equals the BWA-built index files."""
    bwa = load_bwa_index(os.path.join(FIXDIR, "example_index", "example_ref"))
    ours = build_index(os.path.join(FIXDIR, "example_index", "example_ref.fa"))
    assert bwa.n == ours.n
    assert bwa.primary == ours.primary
    assert np.array_equal(bwa.L2, ours.L2)
    assert np.array_equal(bwa.sa_full, ours.sa_full)
    assert np.array_equal(bwa.bwt_words, ours.bwt_words)
    assert np.array_equal(bwa.kmer_ranges, ours.kmer_ranges)


def test_save_load_roundtrip(small_index, tmp_path):
    fmi, _ = small_index
    prefix = str(tmp_path / "idx")
    fmi.save(prefix)
    back = load_index(prefix)
    assert back.n == fmi.n
    assert np.array_equal(back.sa_full, fmi.sa_full)
    assert np.array_equal(back.kmer_ranges, fmi.kmer_ranges)
    assert back.ref_names == fmi.ref_names


def test_translate_loc(small_index):
    fmi, seq = small_index
    name, off, ln = fmi.translate_loc(10)
    assert name == "chr_test"
    assert off == 10
    assert ln == len(seq)


def test_range_to_fms(example_index):
    """range_to_fms (bwa_index.hpp:265-333): every returned FM row's SA
    value must point back at the corresponding range position on the
    right strand."""
    fmi = example_index
    name = fmi.ref_names[0]
    st, en = 5000, 5030
    rev_fms, fwd_fms = fmi.range_to_fms(name, st, en)
    assert len(fwd_fms) == en - st
    assert len(rev_fms) == en - st
    pac_min = fmi.get_sa_loc(name, st)
    pac_max = pac_min + (en - st) - 1
    # fwd_fms[j] is the row whose suffix starts at pac_max - j
    for j, f in enumerate(fwd_fms):
        assert int(fmi.sa(f)) == pac_max - j
    # rev_fms[j] is the reverse-strand row whose ref_en (n - sa, the
    # engine/seed convention) is one past the covered position
    for j, f in enumerate(rev_fms):
        assert fmi.n - int(fmi.sa(f)) == pac_min + j + 1
