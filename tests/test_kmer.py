"""k-mer primitive properties (reference parity: src/bp.hpp)."""

import numpy as np

from uncalled_tpu.kmer import (
    K,
    KMER_COUNT,
    kmer_base,
    kmer_comp,
    kmer_head,
    kmer_neighbor,
    kmer_revcomp,
    kmer_to_str,
    seq_to_codes,
    seq_to_kmers,
    str_to_kmer,
)


def test_str_roundtrip():
    for k in [0, 1, 512, 1023, str_to_kmer("ACGTA")]:
        assert str_to_kmer(kmer_to_str(k)) == k
    assert str_to_kmer("AAAAA") == 0
    assert str_to_kmer("TTTTT") == KMER_COUNT - 1
    assert str_to_kmer("AAAAC") == 1


def test_comp_is_basewise():
    # complement maps A<->T, C<->G at every position, no reversal
    for s, want in [("AAAAA", "TTTTT"), ("ACGTA", "TGCAT"), ("CCCCC", "GGGGG")]:
        assert kmer_to_str(kmer_comp(str_to_kmer(s))) == want
    ks = np.arange(KMER_COUNT)
    assert np.array_equal(kmer_comp(kmer_comp(ks)), ks)


def test_revcomp():
    assert kmer_to_str(kmer_revcomp(str_to_kmer("AACGT"))) == "ACGTT"
    for k in np.random.default_rng(0).integers(0, KMER_COUNT, 50):
        assert kmer_revcomp(kmer_revcomp(int(k))) == int(k)


def test_neighbor_shifts_left():
    k = str_to_kmer("ACGTA")
    assert kmer_to_str(kmer_neighbor(k, 2)) == "CGTAG"
    # head/base accessors
    assert kmer_head(k) == 0  # A
    assert [int(kmer_base(k, i)) for i in range(K)] == [0, 1, 2, 3, 0]


def test_seq_to_kmers():
    codes = seq_to_codes("ACGTACGT")
    ks = seq_to_kmers(codes)
    assert len(ks) == 4
    assert ks[0] == str_to_kmer("ACGTA")
    assert ks[3] == str_to_kmer("TACGT")
