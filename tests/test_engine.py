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
    conf.engine.batch_reads = 4
    return BatchMapper(example_index, pore_model, example_threshes, conf)


def run(bmap, make_read, golden_reads, golden_pafs, rids):
    reads = [make_read(r, golden_reads[r]) for r in rids]
    got = {p.rd_name: p.to_line() for p in bmap.map_reads(reads)}
    for rid in rids:
        assert got[rid] == golden_pafs[rid], rid


def test_engine_paf_identical_fast(bmap, make_read, golden_reads, golden_pafs):
    run(bmap, make_read, golden_reads, golden_pafs, FAST_SUBSET)


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


@pytest.mark.slow
def test_engine_paf_identical_all(bmap, make_read, golden_reads, golden_pafs):
    run(bmap, make_read, golden_reads, golden_pafs, list(golden_pafs))
