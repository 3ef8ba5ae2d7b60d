"""Batched device engine vs reference golden PAFs.

The engine (uncalled_tpu.mapping.engine) is the fixed-shape TPU compute path;
these tests run it on the virtual CPU backend and require byte-identical PAF
output to the reference binary (tools/golden_rig) on the golden read set —
the same bar as the sequential oracle.
"""

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.mapping.batch import BatchMapper

FAST_SUBSET = [
    "sim_0000_Escherichia_coli_3854_+",
    "sim_0003_Escherichia_coli_6188_-",  # reverse strand
    "sim_0006_Escherichia_coli_5000_+",  # regression: ended-parent seeds
]


@pytest.fixture(scope="module")
def bmap(example_index, example_threshes, pore_model):
    conf = Conf()
    conf.engine.pooled = False  # this file gates the CLASSIC engine
    conf.engine.batch_reads = 4
    return BatchMapper(example_index, pore_model, example_threshes, conf)


def run(bmap, make_read, golden_reads, golden_pafs, rids):
    reads = [make_read(r, golden_reads[r]) for r in rids]
    got = {p.rd_name: p.to_line() for p in bmap.map_reads(reads)}
    for rid in rids:
        assert got[rid] == golden_pafs[rid], rid


def test_engine_paf_identical_all(bmap, make_read, golden_reads, golden_pafs):
    """The full golden set is the default gate (VERDICT r1: don't hide
    11 of 14 parity reads behind -m slow)."""
    run(bmap, make_read, golden_reads, golden_pafs, list(golden_pafs))


def test_engine_batch_slots_recycle(bmap, make_read, golden_reads, golden_pafs):
    """More reads than slots: slot refill must not leak state across reads."""
    rids = [
        "sim_0002_Escherichia_coli_6254_+",
        "sim_0005_Escherichia_coli_3483_+",
        "sim_0008_Escherichia_coli_1891_+",
        "sim_0009_Escherichia_coli_2589_+",
        "sim_0010_Escherichia_coli_4033_+",  # 5 reads through 4 slots
    ]
    run(bmap, make_read, golden_reads, golden_pafs, rids)


def test_remap_ladder_restores_parity(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """Absurdly narrow budgets must trip the overflow flag and the wide
    remap pass must still deliver byte-identical PAF output."""
    conf = Conf()
    conf.engine.pooled = False  # this file gates the CLASSIC engine
    conf.engine.batch_reads = 4
    # two tiny rungs so the chain (narrow -> mid -> final) is exercised;
    # the final rung's 1024 paths are a proven-parity budget (fast on CPU)
    conf.engine.remap_ladder = ((64, 4, 8, 16, 0), (1024, 4, 48, 128, 0))
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf,
        P=32, C=32, R=4, CL=8,
    )
    reads = [make_read(r, golden_reads[r]) for r in FAST_SUBSET]
    pafs = list(bm.map_reads(reads))
    assert len(pafs) == len(FAST_SUBSET)
    # the narrow run must actually have overflowed (else the test is vacuous)
    assert bm._next_mapper is not None
    got = {p.rd_name: p.to_line() for p in pafs}
    for rid in FAST_SUBSET:
        assert got[rid] == golden_pafs[rid], rid


def test_tracker_stats_parity_on_contested_stream():
    """Tracker bookkeeping (live clusters, all_lens, len_sum, max_map) must
    match the oracle on a stream where clusters compete for the same seeds.

    Note: the reference's set-reinsertion "collision" branch
    (oracle.py:168-173) appears unreachable -- the first cluster reaching a
    key is always re-picked unless a strictly larger one exists, which would
    have been picked first. The engine carries an equivalent defensive
    zombie flag (cl_count) that stays a no-op when the branch never fires;
    this test pins the shared-path statistics."""
    import jax
    import jax.numpy as jnp

    from uncalled_tpu.config import SeedTrackerParams
    from uncalled_tpu.mapping.engine import (
        EngineParams, _tracker_add, _tracker_decide, make_state,
    )
    from uncalled_tpu.mapping.oracle import SeedTracker

    # seed stream engineered to collide: two clusters get updated to the
    # same (ref_en_start, evt_en) key within one event
    stream = [
        (1000, 10, 30),   # cluster A
        (2000, 10, 30),   # cluster B
        (1020, 12, 40),   # A grows
        (2020, 12, 40),   # B grows
        (1040, 31, 50),   # A updated: ref_en_start = 1040-31+1 = 1010
        (2070, 1061, 50), # B updated to ref_en_start 1010, evt 50 -> collision
        (1500, 20, 55),
        (1060, 15, 60),
    ]
    oracle = SeedTracker(SeedTrackerParams())
    for ref_en, mc, evt in stream:
        oracle.add_seed(ref_en, mc, evt)

    p = EngineParams(B=1, P=8, C=8, CL=16, R=4)
    st = make_state(p)
    ts = {k: st[k] for k in (
        "cl_valid", "cl_count", "cl_ref_st", "cl_r1", "cl_r2e", "cl_evt_st",
        "cl_evt_en", "cl_total", "len_sum", "n_cl",
        "mm_len", "mm_ref_st", "mm_r1", "mm_r2e", "mm_evt_st", "mm_evt_en",
    )}
    ok = jnp.ones((1,), bool)
    for ref_en, mc, evt in stream:
        ts = _tracker_add(
            p, ts, jnp.full((1,), ref_en, jnp.int32),
            jnp.full((1,), mc, jnp.int32), jnp.full((1,), evt, jnp.int32), ok,
        )

    # live cluster count matches the set size; counted lengths match all_lens
    assert int(ts["n_cl"][0]) == len(oracle.clusters)
    eng_lens = sorted(
        int(t) for t, c in zip(
            np.asarray(ts["cl_total"][0]), np.asarray(ts["cl_count"][0])
        ) if c
    )
    assert eng_lens == sorted(oracle.all_lens)
    assert float(ts["len_sum"][0]) == oracle.len_sum
    assert int(ts["mm_len"][0]) == (oracle.max_map.total_len if oracle.max_map else 0)
    # no collision fired (believed unreachable): counted == live
    assert int(np.asarray(ts["cl_count"][0]).sum()) == int(ts["n_cl"][0])


def test_sampled_sa_lookup_exact(example_index, example_threshes, pore_model):
    """Device LF-walk on the 1/32-sampled SA reproduces the full SA."""
    import jax.numpy as jnp

    from uncalled_tpu.mapping.engine import _sa_lookup, device_index

    fmi = example_index
    idx = device_index(fmi, example_threshes, pore_model, sampled_sa=True)
    rng = np.random.default_rng(3)
    rows = rng.integers(0, fmi.n + 1, (4, 64))
    got = np.asarray(_sa_lookup(idx, jnp.asarray(rows, jnp.int32), 32))
    want = fmi.sa_full[rows]
    assert np.array_equal(got, want)


def test_sampled_sa_paf_identical(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """Sampled-SA engine mode stays byte-identical on golden reads."""
    conf = Conf()
    conf.engine.pooled = False  # this file gates the CLASSIC engine
    conf.engine.batch_reads = 4
    bm = BatchMapper(
        example_index, pore_model, example_threshes, conf, sampled_sa=True
    )
    reads = [make_read(r, golden_reads[r]) for r in FAST_SUBSET]
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    for rid in FAST_SUBSET:
        assert got[rid] == golden_pafs[rid], rid


def test_device_dsp_wave_matches_host(
    example_index, example_threshes, pore_model, make_read, golden_reads,
):
    """Opt-in device DSP (detect_block wave): same mapped locations as the
    host DSP path (event means differ in the last ulps by design, so the
    gate is positional, not byte)."""
    conf = Conf()
    conf.engine.pooled = False  # this file gates the CLASSIC engine
    conf.engine.batch_reads = 4
    conf.engine.device_dsp = True
    bm_dev = BatchMapper(example_index, pore_model, example_threshes, conf)
    conf2 = Conf()
    conf2.engine.pooled = False
    conf2.engine.batch_reads = 4
    bm_host = BatchMapper(example_index, pore_model, example_threshes, conf2)
    rids = FAST_SUBSET
    reads = [make_read(r, golden_reads[r]) for r in rids]
    dev = {p.rd_name: p for p in bm_dev.map_reads(reads)}
    host = {p.rd_name: p for p in bm_host.map_reads(reads)}
    for rid in rids:
        d, h = dev[rid], host[rid]
        assert d.is_mapped == h.is_mapped, rid
        assert d.rf_name == h.rf_name, rid
        assert abs(d.rf_st - h.rf_st) < 50, (rid, d.rf_st, h.rf_st)
        assert d.fwd == h.fwd, rid


def test_drain_shrink_preserves_parity(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """Straggler drain restarts tail reads on a B/8 mapper; byte parity
    must hold through the restart."""
    conf = Conf()
    conf.engine.pooled = False  # this file gates the CLASSIC engine
    conf.engine.batch_reads = 64  # >= drain threshold, 2 reads <= B//8
    conf.engine.drain_shrink = True
    bm = BatchMapper(example_index, pore_model, example_threshes, conf)
    rids = [
        "sim_0000_Escherichia_coli_3854_+",
        "sim_0003_Escherichia_coli_6188_-",
    ]
    reads = [make_read(r, golden_reads[r]) for r in rids]
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    # parity first: the whole point of the test is byte identity
    # through the drain restart (a sizing regression must not mask it)
    for rid in rids:
        assert got[rid] == golden_pafs[rid], rid
    assert bm._drain_mapper is not None  # the drain path actually ran
    # expected drain width derives from the tier logic, not a constant
    exp_B = max(4, conf.engine.batch_reads // conf.engine.drain_div)
    assert bm._drain_mapper.eng.params.B == exp_B
