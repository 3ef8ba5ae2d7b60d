"""DTW vs a brute-force sequential implementation of the reference recurrence
(dtw.hpp:51-120), plus an end-to-end alignment of a simulated read."""

import numpy as np
import pytest

from uncalled_tpu.ops.dtw import (
    BIG,
    DTW_EVENT_GLOB,
    DTW_EVENT_QSUB,
    DTW_EVENT_RSUB,
    DTWAlign,
    DTWParams,
    dtw_matrix,
)


def brute_matrix(cost, p):
    R, C = cost.shape
    mat = np.empty((R, C))
    for i in range(R):
        for j in range(C):
            c = float(cost[i, j])
            hs = mat[i, j - 1] if j > 0 else (0.0 if p.subseq == "row" else BIG)
            vs = mat[i - 1, j] if i > 0 else (0.0 if p.subseq == "col" else BIG)
            if i > 0 and j > 0:
                ds = mat[i - 1, j - 1]
            elif (i == j) or (i == 0 and p.subseq == "col") or (
                j == 0 and p.subseq == "row"
            ):
                ds = 0.0
            else:
                ds = BIG
            mat[i, j] = min(ds + p.dw * c, hs + p.hw * c, vs + p.vw * c)
    return mat


@pytest.mark.parametrize("prms", [DTW_EVENT_GLOB, DTW_EVENT_QSUB, DTW_EVENT_RSUB])
def test_matrix_matches_bruteforce(prms):
    rng = np.random.default_rng(0)
    cost = rng.random((37, 23)).astype(np.float32) * 5
    got = dtw_matrix(cost, prms)
    want = brute_matrix(cost, prms)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_path_monotone_and_scored():
    rng = np.random.default_rng(1)
    cost = rng.random((20, 30)).astype(np.float32)
    a = DTWAlign(cost, DTW_EVENT_GLOB)
    path = a.get_path()
    # ends at the corner, starts at origin (global mode)
    assert path[0] == (29, 19)
    assert path[-1] == (0, 0)
    # monotone nonincreasing end-first
    js = [p[0] for p in path]
    is_ = [p[1] for p in path]
    assert all(a >= b for a, b in zip(js, js[1:]))
    assert all(a >= b for a, b in zip(is_, is_[1:]))
    assert a.mean_score() == pytest.approx(a.score() / len(path))


def test_align_simulated_read(example_index, pore_model):
    """A clean simulated read aligns to its true region with a much lower
    mean DTW cost than to a wrong region (the dtw_test oracle idea)."""
    from uncalled_tpu.ops.dtw import align_read
    from uncalled_tpu.testing.simulate import simulate_reads

    reads = simulate_reads(
        "tests/fixtures/example_index/example_ref.fa", 1, seed=9,
        read_len_bp=(900, 1000),
    )
    r = reads[0]
    aln, ev = align_read(
        r.signal, example_index, r.ref_name, r.ref_start, r.ref_end, r.fwd
    )
    wrong_start = (r.ref_start + 5000) % 9000
    aln_wrong, _ = align_read(
        r.signal, example_index, r.ref_name, wrong_start,
        wrong_start + (r.ref_end - r.ref_start), r.fwd,
    )
    # clean separation between the true and a shifted region; the absolute
    # gap is modest because DTW cherry-picks the best path even on noise
    assert aln.mean_score() < 0.85 * aln_wrong.mean_score()


def test_masking_roundtrip(tmp_path):
    """Repeat maskers find planted repeats (masking/ pipeline equivalent)."""
    from uncalled_tpu.masking import mask_external, mask_internal

    rng = np.random.default_rng(3)
    base = "".join("ACGT"[c] for c in rng.integers(0, 4, 2500))
    seq = base[:800] + "ACGTTGCA" * 25 + base[800:1600] + base[200:500] + base[1600:]
    fa = tmp_path / "in.fa"
    fa.write_text(f">m\n{seq}\n")
    out1 = tmp_path / "int.fa"
    mask_internal(str(fa), str(out1), k=8, iters=2)
    s1 = "".join(l.strip() for l in open(out1) if not l.startswith(">"))
    assert s1.count("N") >= 190  # the planted 200bp 8-mer repeat run
    assert len(s1) == len(seq)
    out2 = tmp_path / "ext.fa"
    mask_external(str(fa), str(out2), min_len=100)
    s2 = "".join(l.strip() for l in open(out2) if not l.startswith(">"))
    assert s2.count("N") >= 600  # both copies of the 300bp duplication
    assert len(s2) == len(seq)
