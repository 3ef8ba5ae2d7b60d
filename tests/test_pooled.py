"""Pooled (flat cross-batch pool) engine vs reference golden PAFs.

Same bar as the per-read engine: byte-identical PAF output to the
reference binary on the golden read set, through the real BatchMapper
host loop (slot refill, early-eject plumbing, finalize)."""

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.mapping.batch import BatchMapper


@pytest.fixture(scope="module")
def pmap(example_index, example_threshes, pore_model):
    conf = Conf()
    conf.engine.batch_reads = 4
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    return BatchMapper(example_index, pore_model, example_threshes, conf)


def run(pmap, make_read, golden_reads, golden_pafs, rids):
    reads = [make_read(r, golden_reads[r]) for r in rids]
    got = {p.rd_name: p.to_line() for p in pmap.map_reads(reads)}
    for rid in rids:
        assert got[rid] == golden_pafs[rid], rid


def test_pooled_paf_identical_all(pmap, make_read, golden_reads, golden_pafs):
    from uncalled_tpu.mapping.pooled import PooledEngine

    assert isinstance(pmap.eng, PooledEngine)
    run(pmap, make_read, golden_reads, golden_pafs, list(golden_pafs))
    # the pooled per-read budget is the reference's: nothing may overflow
    assert pmap.ovf_why == {}


def test_pooled_slots_recycle(pmap, make_read, golden_reads, golden_pafs):
    """More reads than slots: pool segments must not leak across refills."""
    rids = [
        "sim_0002_Escherichia_coli_6254_+",
        "sim_0005_Escherichia_coli_3483_+",
        "sim_0008_Escherichia_coli_1891_+",
        "sim_0009_Escherichia_coli_2589_+",
        "sim_0010_Escherichia_coli_4033_+",  # 5 reads through 4 slots
    ]
    run(pmap, make_read, golden_reads, golden_pafs, rids)


@pytest.mark.slow
def test_pooled_matches_oracle_on_repeat_genome(pore_model, tmp_path_factory):
    """Pooled vs oracle on a repeat-bearing genome with model-mismatched
    reads — the source-burst / budget-binding regime the goldens don't
    reach.  The oracle runs the reference's own budgets, so this pins
    the pooled engine's per-read budget-parity claim."""
    from uncalled_tpu.index.build import build_index
    from uncalled_tpu.index.parameterize import build_uncl
    from uncalled_tpu.mapping.oracle import OracleMapper, load_uncl
    from uncalled_tpu.testing.simulate import realistic_genome, simulate_reads

    d = tmp_path_factory.mktemp("pooled_scale")
    fa = d / "ref.fa"
    seq = realistic_genome(120_000, seed=3)
    fa.write_text(">pool_ref\n" + "\n".join(
        seq[i : i + 80] for i in range(0, len(seq), 80)
    ) + "\n")
    fmi = build_index(str(fa))
    threshes = load_uncl(build_uncl(fmi, str(fa)[:-3]))
    reads = simulate_reads(str(fa), 3, seed=17, read_len_bp=(1200, 2200),
                           mismatch=True)

    oracle = OracleMapper(fmi, pore_model, threshes, Conf())
    want = {r.id: oracle.map_read(r).to_line() for r in reads}

    conf = Conf()
    conf.engine.batch_reads = 3
    conf.engine.evt_block = 16
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 2048
    bm = BatchMapper(fmi, pore_model, threshes, conf, CL=2048)
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    assert bm.ovf_why == {}, bm.ovf_why
    for rid in want:
        assert got[rid] == want[rid], rid


def test_pooled_drain_migration_paf_identical(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """Straggler drain by STATE MIGRATION (pooled -> smaller pooled) must
    keep byte-PAF parity — the migrated reads continue mid-stream on the
    narrow mapper instead of restarting."""
    from uncalled_tpu.mapping.pooled import PooledEngine

    conf = Conf()
    conf.engine.batch_reads = 8
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    conf.engine.drain_min_batch = 8  # drain fires at this tiny scale
    conf.engine.evt_block = 16
    bm = BatchMapper(example_index, pore_model, example_threshes, conf)
    rids = list(golden_pafs)[:10]
    run(bm, make_read, golden_reads, golden_pafs, rids)
    dm = bm._drain_mapper
    assert dm is not None and isinstance(dm.eng, PooledEngine)
    assert hasattr(bm.eng, "_migrations"), "migration path must have run"


def test_pooled_sampled_sa_paf_identical(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """Pooled engine with the 1/32-sampled SA (device LF-walk) must stay
    byte-PAF-identical."""
    conf = Conf()
    conf.engine.batch_reads = 4
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf,
        sampled_sa=True, sa_intv=32,
    )
    rids = list(golden_pafs)[:6]
    run(bm, make_read, golden_reads, golden_pafs, rids)


def test_pooled_bitonic_sort_paf_identical(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """sort_mode="bitonic" (hybrid row-parallel candidate sort) must be
    byte-PAF-identical to the flat lax.sort path."""
    conf = Conf()
    conf.engine.batch_reads = 4
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf,
        sort_mode="bitonic",
    )
    rids = list(golden_pafs)[:6]
    run(bm, make_read, golden_reads, golden_pafs, rids)
    assert bm.ovf_why == {}


def test_pooled_pool_exhaustion_wide_pool_tier(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """A pool too small for the read must set the overflow flag and the
    POOLED wide tier (conf.engine.pool_wide) must restore byte parity."""
    from uncalled_tpu.mapping.pooled import PooledEngine

    conf = Conf()
    conf.engine.batch_reads = 2
    conf.engine.pooled = True
    conf.engine.remap_ladder = ((1024, 2, 128, 256, 0),)
    rid = "sim_0000_Escherichia_coli_3854_+"
    reads = [make_read(rid, golden_reads[rid])]
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf, S=128, SC=160,
    )
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    assert bm.ovf_why, "tiny pool must overflow"
    assert isinstance(bm._next_mapper.eng, PooledEngine), "wide tier is pooled"
    assert got[rid] == golden_pafs[rid]


def test_pooled_exhaustion_chains_to_classic_final_rung(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """When the pooled eject tiers ALL trip (tiny pool_wide/pool_max),
    the classic final rung must restore byte parity."""
    from uncalled_tpu.mapping.engine import MapEngine
    from uncalled_tpu.mapping.pooled import PooledEngine

    conf = Conf()
    conf.engine.batch_reads = 2
    conf.engine.pooled = True
    conf.engine.pool_wide = (96, 256)  # wide tier still far too small
    conf.engine.pool_max = (112, 256)  # max tier too
    conf.engine.remap_ladder = ((1024, 2, 128, 256, 0),)
    rid = "sim_0000_Escherichia_coli_3854_+"
    reads = [make_read(rid, golden_reads[rid])]
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf, S=128, SC=160,
    )
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    wide = bm._next_mapper
    assert wide.ovf_why, "tiny wide pool must also overflow"
    pmax = wide._next_mapper
    assert isinstance(pmax.eng, PooledEngine) and pmax._pool_tier == 2
    assert pmax.ovf_why, "tiny max pool must also overflow"
    assert isinstance(pmax._next_mapper.eng, MapEngine), "final rung classic"
    assert got[rid] == golden_pafs[rid]


def test_pooled_exhaustion_classic_ladder_when_wide_disabled(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """pool_wide=() keeps the old behavior: ejects route onto the
    classic remap ladder directly."""
    from uncalled_tpu.mapping.engine import MapEngine

    conf = Conf()
    conf.engine.batch_reads = 2
    conf.engine.pooled = True
    conf.engine.pool_wide = ()
    conf.engine.remap_ladder = ((1024, 2, 128, 256, 0),)
    rid = "sim_0000_Escherichia_coli_3854_+"
    reads = [make_read(rid, golden_reads[rid])]
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf, S=128, SC=160,
    )
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    assert bm.ovf_why, "tiny pool must overflow"
    assert isinstance(bm._next_mapper.eng, MapEngine)
    assert got[rid] == golden_pafs[rid]


def test_seg_running_max_two_level():
    """Two-level segmented running max == the flat associative scan."""
    import jax
    import jax.numpy as jnp

    from uncalled_tpu.mapping.pooled import _seg_running_max

    rng = np.random.default_rng(11)
    for N in (122880, 98304, 10240, 777):
        # contiguous segments of random lengths (as the candidate stream)
        first = rng.random(N) < 0.2
        first[0] = True
        seg = jnp.asarray(np.cumsum(first).astype(np.int32))
        vals = jnp.asarray(
            rng.integers(-(2**31), 2**31 - 1, N, dtype=np.int64).astype(
                np.int32
            )
        )

        def _segmax(a, b):
            sa_, ma = a
            sb, mb = b
            return sb, jnp.where(sa_ == sb, jnp.maximum(ma, mb), mb)

        _, exp = jax.lax.associative_scan(
            _segmax, (seg[None], vals[None]), axis=1
        )
        got = _seg_running_max(seg, vals)
        assert np.array_equal(np.asarray(got), np.asarray(exp[0])), N
