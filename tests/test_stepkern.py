"""Bit-exactness tests for the pooled-step Pallas kernels (interpret mode).

Each kernel in ops/stepkern.py must replicate its XLA stage bit-for-bit;
the XLA formulations here are copied verbatim from pooled.py's step (the
same duplication contract as test_tracker_kernel.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _xla_ring(old_ring, rsrc, rslot, rval, keep):
    """pooled.py ring stage, verbatim."""
    S, RING = old_ring.shape
    i32 = jnp.int32
    ring_rows = jnp.take(
        old_ring, jnp.clip(rsrc, np.int32(0), np.int32(S - 1)), axis=0
    )
    ring_iota = jax.lax.broadcasted_iota(i32, (S, RING), 1)
    base_ring = jnp.where((rsrc >= 0)[:, None], ring_rows, jnp.float32(0))
    return jnp.where(
        keep[:, None],
        jnp.where(ring_iota == rslot[:, None], rval[:, None], base_ring),
        jnp.float32(0),
    ).astype(jnp.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ring_assemble_matches_xla(seed):
    from uncalled_tpu.ops.stepkern import ring_assemble

    rng = np.random.default_rng(seed)
    S, RING = 512, 23
    old = rng.normal(size=(S, RING)).astype(np.float32)
    # include denormals / negative zero / big values in the ring
    old[rng.integers(0, S, 5), rng.integers(0, RING, 5)] = -0.0
    rsrc = rng.integers(-1, S, S).astype(np.int32)
    rslot = rng.integers(-1, RING, S).astype(np.int32)
    rval = rng.normal(size=S).astype(np.float32) * 100
    keep = rng.integers(0, 2, S).astype(bool)

    want = np.asarray(
        _xla_ring(
            jnp.asarray(old), jnp.asarray(rsrc), jnp.asarray(rslot),
            jnp.asarray(rval), jnp.asarray(keep),
        )
    )
    got = np.asarray(
        ring_assemble(
            jnp.asarray(old), jnp.asarray(rsrc), jnp.asarray(rslot),
            jnp.asarray(rval), jnp.asarray(keep), interpret=True,
        )
    )
    assert got.dtype == want.dtype
    # bit-exact, including signed zeros
    assert np.array_equal(
        got.view(np.int32), want.view(np.int32)
    ), np.argwhere(got.view(np.int32) != want.view(np.int32))[:5]


def test_pooled_stepkern_paf_identical(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """Golden byte-PAF parity with the stage kernels enabled (interpret
    mode on CPU — the same code path the TPU runs compiled)."""
    from uncalled_tpu.config import Conf
    from uncalled_tpu.mapping.batch import BatchMapper

    conf = Conf()
    conf.engine.batch_reads = 4
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf,
        stepkern=True, stepkern_interpret=True,
    )
    rids = list(golden_pafs)[:4]
    reads = [make_read(r, golden_reads[r]) for r in rids]
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    for rid in rids:
        assert got[rid] == golden_pafs[rid], rid
