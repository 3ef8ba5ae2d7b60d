"""In-scan slot handoff (PoolParams.handoff): byte parity + the switch
path actually firing.

The standby protocol replaces the harvest->refill slot turnover: a
decided slot latches its result device-side and restarts as the standby
read in the same scan (pooled._pool_event_step), so the PAF stream must
be byte-identical to the classic path on the golden set while the
device performs real switches."""

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.mapping.batch import BatchMapper


def _map_all(conf, example_index, example_threshes, pore_model, make_read,
             golden_reads, rids, counter=None):
    bm = BatchMapper(example_index, pore_model, example_threshes, conf)
    if counter is not None:
        # count device switches through the readout's sw flag
        orig = bm.eng.readout_get

        def rg(packed):
            ro = orig(packed)
            if "sw" in ro:
                counter[0] += int(np.sum(ro["sw"]))
            return ro

        bm.eng.readout_get = rg
    reads = [make_read(r, golden_reads[r]) for r in rids]
    return {p.rd_name: p.to_line() for p in bm.map_reads(reads)}


def test_handoff_byte_parity_and_switches(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    rids = list(golden_pafs)
    base = Conf()
    base.engine.batch_reads = 2  # 2 slots, many reads: switches guaranteed
    base.engine.pooled = True
    base.engine.pool_slots_per_read = 512
    base.engine.drain_shrink = False
    base.engine.slot_handoff = False
    off = _map_all(base, example_index, example_threshes, pore_model,
                   make_read, golden_reads, rids)

    conf = Conf()
    conf.engine.batch_reads = 2
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    conf.engine.drain_shrink = False
    conf.engine.slot_handoff = True
    n_sw = [0]
    on = _map_all(conf, example_index, example_threshes, pore_model,
                  make_read, golden_reads, rids, counter=n_sw)

    assert n_sw[0] > 0, "no device switch ever fired — protocol dead"
    for rid in rids:
        assert on[rid] == off[rid] == golden_pafs[rid], rid


def test_handoff_with_drain_disarm(
    example_index, example_threshes, pore_model, make_read, golden_reads,
    golden_pafs,
):
    """Tail mode: lingering standbys must disarm and re-enter via the
    straggler drain without losing reads or parity (the first handoff
    bench ran the whole tail at full width because standbys starved
    want_drain)."""
    conf = Conf()
    conf.engine.batch_reads = 8  # >= drain_min_batch: drain CAN fire
    conf.engine.pooled = True
    conf.engine.pool_slots_per_read = 512
    conf.engine.slot_handoff = True
    rids = list(golden_pafs)
    bm = BatchMapper(example_index, pore_model, example_threshes, conf)
    reads = [make_read(r, golden_reads[r]) for r in rids]
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    assert len(got) == len(rids), "reads lost through the disarm path"
    for rid in rids:
        assert got[rid] == golden_pafs[rid], rid
