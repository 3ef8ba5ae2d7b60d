"""Sequential oracle mapper vs reference golden PAF lines.

The fixtures were produced by tools/golden_rig/golden_map, which drives the
unmodified reference Mapper (compiled from /root/reference/src) on the same
calibrated signal. PAF-identical output is the parity bar (SURVEY.md §4).
"""

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.mapping.oracle import OracleMapper

FAST_SUBSET = [
    "sim_0000_Escherichia_coli_3854_+",
    "sim_0002_Escherichia_coli_6254_+",
    "sim_0005_Escherichia_coli_3483_+",
]


@pytest.fixture(scope="module")
def mapper(example_index, example_threshes, pore_model):
    return OracleMapper(example_index, pore_model, example_threshes, Conf())


def run_one(mapper, make_read, golden_reads, golden_pafs, rid):
    paf = mapper.map_read(make_read(rid, golden_reads[rid]))
    assert paf.to_line() == golden_pafs[rid], rid


@pytest.mark.parametrize("rid", FAST_SUBSET)
def test_oracle_paf_identical_fast(mapper, make_read, golden_reads, golden_pafs, rid):
    run_one(mapper, make_read, golden_reads, golden_pafs, rid)


@pytest.mark.slow
def test_oracle_paf_identical_all(mapper, make_read, golden_reads, golden_pafs):
    for rid in golden_pafs:
        run_one(mapper, make_read, golden_reads, golden_pafs, rid)
