"""Hybrid bitonic candidate sort vs the flat lax.sort reference.

The pooled engine's candidate order is semantic (dedup keeps the last of
an equal-range run; keep-list order = sorted order), so the bitonic
implementation must reproduce lax.sort's stable 4-key output EXACTLY —
including f32 total-order ties (NaN, +/-0, +/-inf) via the monotone key
transform."""

import numpy as np
import pytest


def _run(n, seed, nan_frac=0.0):
    import jax.numpy as jnp

    from uncalled_tpu.mapping.pooled import (
        _f32_from_sort_key,
        _f32_sort_key,
        _sort1d,
        _sort1d_bitonic,
    )

    rng = np.random.default_rng(seed)
    rid = rng.integers(0, 9, n).astype(np.int32)  # heavy duplicates
    k1 = rng.integers(0, 50, n).astype(np.int32)
    k2 = rng.integers(0, 50, n).astype(np.int32)
    prob = rng.normal(size=n).astype(np.float32)
    special = np.array([np.nan, -np.nan, 0.0, -0.0, np.inf, -np.inf],
                       np.float32)
    if nan_frac:
        m = rng.random(n) < nan_frac
        prob[m] = special[rng.integers(0, len(special), m.sum())]
    iota = np.arange(n, dtype=np.int32)

    want = _sort1d(
        tuple(map(jnp.asarray, (rid, k1, k2, prob))),
        (jnp.asarray(iota),), num_keys=4,
    )
    got = _sort1d_bitonic(
        tuple(map(jnp.asarray,
                  (rid, k1, k2, np.asarray(_f32_sort_key(jnp.asarray(prob))),
                   iota)))
    )
    got = got[:3] + (_f32_from_sort_key(got[3]), got[4])
    for i, (w, g) in enumerate(zip(want, got)):
        w, g = np.asarray(w), np.asarray(g)
        if w.dtype.kind == "f":
            # NaN payloads / -0 canonicalize through the key transform;
            # downstream use is value comparisons, so value-equivalence
            # (NaN<->NaN, -0 == +0) is the bar
            same = (w == g) | (np.isnan(w) & np.isnan(g))
            assert same.all(), f"operand {i} (f32 values)"
        else:
            assert np.array_equal(w, g), f"operand {i}"


@pytest.mark.parametrize("n", [64, 1024, 8192, 12000, 122880])
def test_bitonic_matches_flat(n):
    _run(n, seed=n)


def test_bitonic_matches_flat_special_floats():
    _run(20000, seed=7, nan_frac=0.1)
