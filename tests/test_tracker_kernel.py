"""Pallas tracker kernel == the _tracker_add while_loop fold, bit-exact.

Runs the kernel in interpret mode on CPU against random contested seed
streams, including zombie-collision and eviction-pressure regimes.
"""

import numpy as np
import pytest


def _fold_reference(min_aln_len, st, ref_en, mc, evt, row_ok, rows_r):
    import jax.numpy as jnp

    from uncalled_tpu.mapping.engine import _tracker_add

    class _TP:
        pass

    _TP.min_aln_len = min_aln_len
    n = int(np.max(rows_r))
    out = {k: jnp.asarray(v) for k, v in st.items()}
    for r in range(n):
        out = _tracker_add(
            _TP, out, jnp.asarray(ref_en[:, r]), jnp.asarray(mc[:, r]),
            jnp.asarray(evt[:, r]), jnp.asarray(row_ok[:, r]),
        )
    return {k: np.asarray(v) for k, v in out.items()}


def _rand_state(rng, B, CL, fill):
    occ = rng.random((B, CL)) < fill
    v = occ & (rng.random((B, CL)) < 0.9)  # some zombies
    st = {
        "cl_valid": v,
        "cl_count": occ,
        "cl_ref_st": rng.integers(0, 5000, (B, CL)).astype(np.int32),
        "cl_r1": rng.integers(0, 5000, (B, CL)).astype(np.int32),
        "cl_r2e": rng.integers(0, 5000, (B, CL)).astype(np.int32),
        "cl_evt_st": rng.integers(0, 800, (B, CL)).astype(np.int32),
        "cl_evt_en": rng.integers(0, 800, (B, CL)).astype(np.int32),
        "cl_total": rng.integers(1, 300, (B, CL)).astype(np.int32),
        "len_sum": rng.random(B).astype(np.float32) * 100,
        "n_cl": rng.integers(0, CL, B).astype(np.int32),
        "mm_len": rng.integers(0, 200, B).astype(np.int32),
        "mm_ref_st": rng.integers(0, 5000, B).astype(np.int32),
        "mm_r1": rng.integers(0, 5000, B).astype(np.int32),
        "mm_r2e": rng.integers(0, 5000, B).astype(np.int32),
        "mm_evt_st": rng.integers(0, 800, B).astype(np.int32),
        "mm_evt_en": rng.integers(0, 800, B).astype(np.int32),
        "ovf": rng.random(B) < 0.05,
        "ovf_why": rng.integers(0, 4, B).astype(np.int32),
    }
    return st


@pytest.mark.parametrize(
    "seed,fill,B,CL,R",
    [
        (0, 0.3, 16, 128, 24),   # normal occupancy
        (1, 1.0, 16, 128, 24),   # full table: eviction path
        (2, 0.02, 8, 256, 48),   # near-empty, bursty rows
    ],
)
def test_tracker_kernel_bit_exact(seed, fill, B, CL, R):
    import jax.numpy as jnp

    from uncalled_tpu.ops.tracker_kernel import tracker_run

    rng = np.random.default_rng(seed)
    st = _rand_state(rng, B, CL, fill)
    # seed rows clustered near existing cluster coordinates so matches,
    # collisions, and insertions all occur
    base = rng.integers(0, 5000, (B, R)).astype(np.int32)
    near = st["cl_r1"][:, :R] + rng.integers(-3, 40, (B, R))
    use_near = rng.random((B, R)) < 0.6
    mc = rng.integers(1, 30, (B, R)).astype(np.int32)
    ref_en = np.where(use_near, near + mc - 1, base).astype(np.int32)
    evt = (
        st["cl_evt_en"][:, :R] + rng.integers(-2, 30, (B, R))
    ).astype(np.int32)
    rows_r = rng.integers(0, R + 1, B).astype(np.int32)
    row_ok = (
        np.arange(R)[None, :] < rows_r[:, None]
    ) & (rng.random((B, R)) < 0.95)

    exp = _fold_reference(7, st, ref_en, mc, evt, row_ok, rows_r)
    got = tracker_run(
        7,
        {k: jnp.asarray(v) for k, v in st.items()},
        jnp.asarray(ref_en), jnp.asarray(mc), jnp.asarray(evt),
        jnp.asarray(row_ok), jnp.asarray(rows_r),
        interpret=True,
    )
    for k in exp:
        g = np.asarray(got[k])
        if g.dtype == np.float32:
            assert g.view(np.uint32).tolist() == \
                exp[k].view(np.uint32).tolist(), k
        else:
            assert np.array_equal(g, exp[k]), k


@pytest.mark.parametrize("seed,fill", [(3, 0.3), (4, 0.97)])
def test_tracker_kernel_compact_bit_exact(seed, fill):
    """Compact-stream kernel == the expanded [B, R] fold, bit-exact."""
    import jax.numpy as jnp

    from uncalled_tpu.ops.tracker_kernel import tracker_run_compact

    B, CL, RT, R = 16, 128, 256, 24
    rng = np.random.default_rng(seed)
    st = _rand_state(rng, B, CL, fill)
    rr_ref_en = rng.integers(0, 5000, RT).astype(np.int32)
    rr_mc = rng.integers(1, 30, RT).astype(np.int32)
    rr_evt = rng.integers(0, 800, RT).astype(np.int32)
    # contiguous per-read windows in the compact stream
    counts = rng.integers(0, R // 2, B).astype(np.int32)
    st_w = np.minimum(np.concatenate([[0], np.cumsum(counts)[:-1]]),
                      RT - 1).astype(np.int32)
    rows_eff = np.minimum(counts, RT - st_w).astype(np.int32)

    # reference: the expanded fold
    ref_en = np.zeros((B, R), np.int32)
    mc = np.zeros((B, R), np.int32)
    evt = np.zeros((B, R), np.int32)
    ok = np.zeros((B, R), bool)
    for b in range(B):
        n = rows_eff[b]
        ref_en[b, :n] = rr_ref_en[st_w[b] : st_w[b] + n]
        mc[b, :n] = rr_mc[st_w[b] : st_w[b] + n]
        evt[b, :n] = rr_evt[st_w[b] : st_w[b] + n]
        ok[b, :n] = True
    exp = _fold_reference(7, st, ref_en, mc, evt, ok, rows_eff)

    got = tracker_run_compact(
        7, {k: jnp.asarray(v) for k, v in st.items()},
        jnp.asarray(rr_ref_en), jnp.asarray(rr_mc), jnp.asarray(rr_evt),
        jnp.asarray(st_w), jnp.asarray(rows_eff), interpret=True,
    )
    for k in exp:
        g = np.asarray(got[k])
        if g.dtype == np.float32:
            assert g.view(np.uint32).tolist() == \
                exp[k].view(np.uint32).tolist(), k
        else:
            assert np.array_equal(g, exp[k]), k
