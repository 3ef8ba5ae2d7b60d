"""Sharded FM-index engine on the virtual 8-device CPU mesh.

Proves the DESIGN.md >1 Gb layout end-to-end: occ buckets + sampled SA
row-sharded over the ``idx`` mesh axis (psum-combined answers), engine
state sharded over ``dp`` — and the golden PAF output stays
byte-identical to the replicated engine / reference binary.
"""

import jax
import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.mapping.batch import BatchMapper

GOLDEN_SUBSET = [
    "sim_0000_Escherichia_coli_3854_+",
    "sim_0003_Escherichia_coli_6188_-",
]


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return jax.make_mesh((2, 4), ("dp", "idx"))


def test_sharded_tables_are_actually_sharded(
    mesh, example_index, example_threshes, pore_model
):
    from uncalled_tpu.parallel import ShardedMapEngine

    eng = ShardedMapEngine(
        example_index, pore_model, example_threshes, Conf(), mesh=mesh,
        B=4, P=64, C=64, R=16, CL=32,
    )
    occ = eng._tables["occ_rows"]
    # each device holds 1/4 of the rows (sharded over idx, not replicated)
    shard_rows = {s.data.shape[0] for s in occ.addressable_shards}
    assert shard_rows == {occ.shape[0] // 4}
    sa = eng._tables["sa_samp"]
    assert {s.data.shape[0] for s in sa.addressable_shards} == {
        sa.shape[0] // 4
    }


def test_sharded_paf_identical(
    mesh, example_index, example_threshes, pore_model, make_read,
    golden_reads, golden_pafs,
):
    from uncalled_tpu.parallel import ShardedMapEngine

    conf = Conf()
    conf.engine.batch_reads = 4
    conf.engine.remap_wide = False
    eng = ShardedMapEngine(
        example_index, pore_model, example_threshes, conf, mesh=mesh,
        B=4, P=1024, C=1024, R=48, CL=128,
    )
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf, engine=eng
    )
    reads = [make_read(r, golden_reads[r]) for r in GOLDEN_SUBSET]
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    for rid in GOLDEN_SUBSET:
        assert got[rid] == golden_pafs[rid], rid


def test_sharded_pooled_paf_identical(
    mesh, example_index, example_threshes, pore_model, make_read,
    golden_reads, golden_pafs,
):
    """The FLAGSHIP pooled engine, dp+idx sharded, through the real
    BatchMapper loop: golden byte-PAF parity on the virtual mesh."""
    from uncalled_tpu.parallel import ShardedPooledEngine

    conf = Conf()
    conf.engine.batch_reads = 4
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    eng = ShardedPooledEngine(
        example_index, pore_model, example_threshes, conf, mesh=mesh,
    )
    assert eng.params.S % 2 == 0 and eng._p_local.S == eng.params.S // 2
    occ = eng._tables["occ_rows"]
    assert {s.data.shape[0] for s in occ.addressable_shards} == {
        occ.shape[0] // 4
    }
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf, engine=eng
    )
    reads = [make_read(r, golden_reads[r]) for r in GOLDEN_SUBSET]
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    for rid in GOLDEN_SUBSET:
        assert got[rid] == golden_pafs[rid], rid


def test_sharded_pooled_more_reads_than_slots(
    mesh, example_index, example_threshes, pore_model, make_read,
    golden_reads, golden_pafs,
):
    """Reads > B through the sharded engine: the slot-handoff default
    must not leak into the sharded wrapper (its advance has no sb lane
    — BatchMapper armed a standby and crashed with a TypeError before
    the handoff=False pin, code-review r5)."""
    from uncalled_tpu.parallel import ShardedPooledEngine

    conf = Conf()
    conf.engine.batch_reads = 2
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    conf.engine.drain_shrink = False
    eng = ShardedPooledEngine(
        example_index, pore_model, example_threshes, conf, mesh=mesh,
    )
    assert not eng.params.handoff
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf, engine=eng
    )
    rids = GOLDEN_SUBSET + [
        "sim_0002_Escherichia_coli_6254_+",
        "sim_0005_Escherichia_coli_3483_+",
    ]
    reads = [make_read(r, golden_reads[r]) for r in rids]
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    for rid in rids:
        assert got[rid] == golden_pafs[rid], rid
