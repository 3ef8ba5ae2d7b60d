"""ops/sortkern.merge_level must be bit-exact to the XLA XOR-pass loop
it replaces inside pooled._sort1d_bitonic (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _xla_sort(keys):
    from uncalled_tpu.mapping.pooled import _sort1d_bitonic

    return _sort1d_bitonic(tuple(keys))


def _kern_sort(keys):
    from uncalled_tpu.mapping.pooled import _sort1d_bitonic

    return _sort1d_bitonic(tuple(keys), kernel=True, kernel_interpret=True)


@pytest.mark.parametrize("n", [16384, 32768, 131072])
def test_merge_level_differential(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(n)
    # tie-heavy keys: small pools force full-key ties so the tie-safe
    # swap rule is exercised; the last key is a distinct iota (the
    # production key layout) for half the arrays
    k0 = rng.integers(0, 5, n).astype(np.int32)
    k1 = rng.integers(0, 9, n).astype(np.int32)
    k2 = rng.integers(-3, 3, n).astype(np.int32)
    iota = np.arange(n, dtype=np.int32)
    keys = [jnp.asarray(k) for k in (k0, k1, k2, iota)]
    a = [np.asarray(x) for x in _xla_sort(keys)]
    b = [np.asarray(x) for x in _kern_sort(keys)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_merge_level_with_padding_ties():
    """N not a power of two: _sort1d_bitonic pads every key with MAXV —
    fully tied padding must not be reordered across the kernel levels
    (the swap rule must hold ties in both directions)."""
    import jax.numpy as jnp

    n = 20000  # pads to 32768
    rng = np.random.default_rng(7)
    keys = [
        jnp.asarray(rng.integers(0, 4, n).astype(np.int32)),
        jnp.asarray(rng.integers(0, 4, n).astype(np.int32)),
        jnp.asarray(np.arange(n, dtype=np.int32)),
    ]
    a = [np.asarray(x) for x in _xla_sort(keys)]
    b = [np.asarray(x) for x in _kern_sort(keys)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
