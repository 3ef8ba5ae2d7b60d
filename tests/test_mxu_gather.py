"""MXU one-hot gather kernels: bit-exactness vs XLA take semantics.

Runs the Pallas kernels in interpret mode (CPU); the same shapes are
exercised compiled on real TPU by the engine golden tests when the
bench/driver runs there.  Covers both the monolithic kernel (N <= 4096)
and the H-chunked big-table kernel the wide remap engine depends on.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    from uncalled_tpu.ops import mxu_gather

    monkeypatch.setattr(mxu_gather, "_INTERPRET", True)


SHAPES = [
    # (B, N, F, K) -- monolithic
    (8, 1024, 1, 256),
    (5, 640, 4, 129),
    (8, 48, 2, 300),
    # chunked (N > N_MXU_MAX): wide-engine table scales
    (8, 12800, 1, 512),
    (4, 5000, 3, 300),
]


@pytest.mark.parametrize("B,N,F,K", SHAPES)
def test_row_gather_i32(B, N, F, K):
    from uncalled_tpu.ops.mxu_gather import row_gather

    rng = np.random.default_rng(N * 7 + F)
    tbl = rng.integers(-(2**31), 2**31, (B, N, F), dtype=np.int64).astype(np.int32)
    idx = rng.integers(0, N, (B, K)).astype(np.int32)
    out = np.asarray(row_gather(jnp.asarray(tbl), jnp.asarray(idx), force=True))
    exp = np.take_along_axis(tbl, idx[:, :, None], axis=1)
    assert np.array_equal(out, exp)


@pytest.mark.parametrize("N", [1280, 10000])
def test_shared_gather_multi_dtype(N):
    from uncalled_tpu.ops.mxu_gather import shared_gather

    rng = np.random.default_rng(3)
    tbl = rng.standard_normal((N, 2)).astype(np.float32)
    idx = rng.integers(0, N, (6, 200)).astype(np.int32)
    out = np.asarray(shared_gather(jnp.asarray(tbl), jnp.asarray(idx), force=True))
    assert out.dtype == np.float32
    assert np.array_equal(out.view(np.int32), tbl[idx].view(np.int32))


@pytest.mark.parametrize("N", [2048, 9000])
def test_row_gather_clamps_oob(N):
    from uncalled_tpu.ops.mxu_gather import row_gather

    rng = np.random.default_rng(9)
    tbl = rng.integers(-(2**31), 2**31, (2, N), dtype=np.int64).astype(np.int32)
    idx = np.array([[-7, 0, N - 1, N + 5], [1, 2, 3, 4]], np.int32)
    out = np.asarray(row_gather(jnp.asarray(tbl), jnp.asarray(idx), force=True))
    exp = np.take_along_axis(tbl, np.clip(idx, 0, N - 1), axis=1)
    assert np.array_equal(out, exp)


def test_row_gather_fields_layout():
    from uncalled_tpu.ops.mxu_gather import row_gather_fields

    rng = np.random.default_rng(11)
    tbl = rng.integers(-(2**31), 2**31, (4, 640, 3), dtype=np.int64).astype(np.int32)
    idx = rng.integers(0, 640, (4, 100)).astype(np.int32)
    outs = row_gather_fields(jnp.asarray(tbl), jnp.asarray(idx), force=True)
    exp = np.take_along_axis(tbl, idx[:, :, None], axis=1)
    assert len(outs) == 3
    for f, o in enumerate(outs):
        assert np.array_equal(np.asarray(o), exp[:, :, f])
