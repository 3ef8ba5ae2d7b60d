"""Regression pins for the tie-order parity class (VERDICT r3 item 1).

Seven bench reads historically disagreed byte-wise with the reference
binary because the candidate sort's FULL-KEY TIES (equal fm_start, fm_end,
f32 seedprob) were modeled with a per-element key, while the parity
binary's unstable sort permutes ties data-dependently (the dedup keeps the
run's LAST element, mapper.cpp:568-571, and the survivor's move history is
observable).  oracle.py now runs introsort.std_sort — a line-exact replica
of the rig's libstdc++ std::sort — and each read's PAF must match the rig
byte-for-byte (fixtures regenerated from tools/golden_rig/golden_map).

Requires the bench index (bench_data/rgen_4700000.*, built by bench.py);
skipped when absent.  The two short reads run in the default gate; the
five long ones are @slow.
"""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
PREFIX = os.path.join(REPO, "bench_data", "rgen_4700000")

FAST = ["sim_0545_bench_ref_4295489_+", "sim_0731_bench_ref_302488_+"]
SLOW = [
    "sim_0214_bench_ref_4050919_-",
    "sim_0364_bench_ref_3184616_-",
    "sim_0631_bench_ref_1571287_+",
    "sim_0661_bench_ref_4308092_-",
    "sim_0715_bench_ref_1685755_+",
]

needs_bench_index = pytest.mark.skipif(
    not os.path.exists(PREFIX + ".utidx.npz"),
    reason="bench index not built (run bench.py once)",
)


@pytest.fixture(scope="module")
def oracle():
    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.oracle import OracleMapper, load_uncl
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(PREFIX)
    return OracleMapper(
        fmi, load_default(), load_uncl(PREFIX + ".uncl"), Conf()
    )


class _Read:
    def __init__(self, id, signal):
        self.id, self.signal = id, signal
        self.channel, self.number, self.start_sample = 1, 0, 0

    @property
    def raw_len(self):
        return len(self.signal)


def _check(oracle, rid):
    d = np.load(os.path.join(HERE, "fixtures", "tie_reads.npz"))
    with open(os.path.join(HERE, "fixtures", "tie_pafs.json")) as f:
        want = json.load(f)[rid]
    sig = np.asarray(d[rid], np.float32)
    line = oracle.map_read(_Read(rid, sig)).to_line()
    strip = lambda s: "\t".join(
        t for t in s.split("\t") if not t.startswith("mt:")
    )
    assert strip(line) == strip(want)


@needs_bench_index
@pytest.mark.parametrize("rid", FAST)
def test_tie_read_fast(oracle, rid):
    _check(oracle, rid)


@needs_bench_index
@pytest.mark.slow
@pytest.mark.parametrize("rid", SLOW)
def test_tie_read_slow(oracle, rid):
    _check(oracle, rid)
