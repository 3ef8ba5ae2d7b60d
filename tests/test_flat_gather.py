"""Two-level MXU flat gather: bit-exactness in interpret mode on CPU."""

import os

import numpy as np
import pytest

os.environ["UNCALLED_MXU_INTERPRET"] = "1"


@pytest.mark.parametrize(
    "n,f,k",
    [(1024, 1, 700), (65536, 4, 2048), (9216, 2, 513), (300, 1, 64)],
)
def test_flat_gather_exact(n, f, k):
    import jax.numpy as jnp

    from uncalled_tpu.ops import flat_gather as FG

    rng = np.random.default_rng(n + f + k)
    tbl = rng.integers(-(2**31), 2**31, (n, f), dtype=np.int64).astype(np.int32)
    idx = rng.integers(0, n, (k,)).astype(np.int32)
    out = np.asarray(FG.flat_gather(jnp.asarray(tbl), jnp.asarray(idx), force=True))
    exp = tbl[idx]
    if f == 1:
        # 1D table squeezes
        out1 = np.asarray(
            FG.flat_gather(jnp.asarray(tbl[:, 0]), jnp.asarray(idx), force=True)
        )
        assert np.array_equal(out1, tbl[idx, 0])
    assert np.array_equal(out, exp)


def test_flat_gather_f32_nan_and_clamp():
    import jax.numpy as jnp

    from uncalled_tpu.ops import flat_gather as FG

    rng = np.random.default_rng(5)
    tbl = rng.standard_normal((4096,)).astype(np.float32)
    tbl[rng.random(4096) < 0.02] = np.nan
    idx = rng.integers(-5, 4200, (900,)).astype(np.int32)  # out of range both ways
    out = np.asarray(FG.flat_gather(jnp.asarray(tbl), jnp.asarray(idx), force=True))
    exp = tbl[np.clip(idx, 0, 4095)]
    assert np.array_equal(out.view(np.int32), exp.view(np.int32))


def test_flat_gather_fields_and_shapes():
    import jax.numpy as jnp

    from uncalled_tpu.ops import flat_gather as FG

    rng = np.random.default_rng(9)
    tbl = rng.integers(0, 1000, (2048, 3)).astype(np.int32)
    idx = rng.integers(0, 2048, (16, 33)).astype(np.int32)  # 2D idx
    cols = FG.flat_gather_fields(jnp.asarray(tbl), jnp.asarray(idx), force=True)
    assert len(cols) == 3
    for f, c in enumerate(cols):
        assert c.shape == (16, 33)
        assert np.array_equal(np.asarray(c), tbl[idx, f])


def test_pair_counts_interpret():
    import jax.numpy as jnp

    from uncalled_tpu.ops import flat_gather as FG

    rng = np.random.default_rng(3)
    k = 5000
    a = rng.integers(-2, 19, (k,)).astype(np.int32)  # some out of domain
    b = rng.integers(0, 1030, (k,)).astype(np.int32)
    na, nb = 17, 1024
    want = np.zeros((na, nb), np.int32)
    for x, y in zip(a, b):
        if 0 <= x < na and 0 <= y < nb:
            want[x, y] += 1
    got = np.asarray(FG.pair_counts(jnp.asarray(a), jnp.asarray(b), na, nb, force=True))
    assert np.array_equal(got, want)
    # XLA fallback agrees
    got2 = np.asarray(FG.pair_counts(jnp.asarray(a), jnp.asarray(b), na, nb, force=False))
    assert np.array_equal(got2, want)


@pytest.mark.parametrize("dt", ["i32", "f32", "u32"])
@pytest.mark.parametrize("n,k", [(4096, 5000), (4093, 2048), (368640, 8192)])
def test_take1d_lane_trick_exact(dt, n, k):
    """The 1D->8-lane-row XLA gather trick is bit-exact (incl. NaN
    payload bits and non-multiple-of-8 table lengths)."""
    import jax.numpy as jnp

    from uncalled_tpu.ops import flat_gather as FG

    rng = np.random.default_rng(n + k)
    bits = rng.integers(0, 2**32, (n,), dtype=np.uint32)
    if dt == "i32":
        tbl = bits.view(np.int32)
    elif dt == "u32":
        tbl = bits
    else:
        tbl = bits.view(np.float32)  # every bit pattern incl. NaNs/-0.0
    idx = rng.integers(0, n, (k,)).astype(np.int32)
    out = np.asarray(FG._take1d(jnp.asarray(tbl), jnp.asarray(idx)))
    assert out.dtype == tbl.dtype
    assert np.array_equal(
        out.view(np.uint32), tbl[idx].view(np.uint32)
    )


def test_flat_gather_fields_multidim_idx():
    """Fields come back in the index's shape for 2D idx (the fields-major
    relayout must move only the field axis)."""
    import jax.numpy as jnp

    from uncalled_tpu.ops import flat_gather as FG

    rng = np.random.default_rng(3)
    tbl = rng.integers(-100, 100, (512, 3)).astype(np.int32)
    idx = rng.integers(0, 512, (16, 24)).astype(np.int32)
    cols = FG.flat_gather_fields(
        jnp.asarray(tbl), jnp.asarray(idx), force=False
    )
    assert len(cols) == 3
    for f, c in enumerate(cols):
        assert c.shape == idx.shape
        assert np.array_equal(np.asarray(c), tbl[idx, f])


def test_take_fields_rowpack_bitexact():
    """The P-rows-per-128-lane packed row gather (the TPU relayout-tax
    fix) is bit-exact vs the naive [N, F] take for every field width,
    including non-P-multiple N (zero row padding) and clamped indices."""
    import jax.numpy as jnp

    from uncalled_tpu.ops import flat_gather as FG

    rng = np.random.default_rng(11)
    for F in (1, 2, 3, 4, 8, 10, 15, 33, 64):
        N = int(rng.integers(900, 1100))
        tbl = rng.integers(-(2**31), 2**31, (N, F), dtype=np.int64).astype(
            np.int32
        )
        idx = rng.integers(0, N, (4096,)).astype(np.int32)
        ix = jnp.clip(jnp.asarray(idx), 0, N - 1)
        cols = FG._take_fields_rowpack(jnp.asarray(tbl), ix, idx.shape)
        assert len(cols) == F
        for f, c in enumerate(cols):
            assert np.array_equal(np.asarray(c), tbl[idx, f]), (F, f)


def test_take_fields_rowpack_multidim_idx():
    import jax.numpy as jnp

    from uncalled_tpu.ops import flat_gather as FG

    rng = np.random.default_rng(12)
    tbl = rng.integers(-100, 100, (777, 5)).astype(np.int32)
    idx = rng.integers(0, 777, (64, 64)).astype(np.int32)
    cols = FG._take_fields_rowpack(
        jnp.asarray(tbl), jnp.asarray(idx), idx.shape
    )
    for f, c in enumerate(cols):
        assert c.shape == idx.shape
        assert np.array_equal(np.asarray(c), tbl[idx, f])
