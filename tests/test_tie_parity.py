"""Regression pins for the tie-order parity class (VERDICT r3 item 1).

Candidate-sort FULL-KEY TIES (equal fm_start, fm_end, f32 seedprob) are
pervasive (38% of bench events) and observable: the duplicate-range dedup
keeps the run's LAST element (mapper.cpp:568-571) and the survivor's move
history flows into future events.  The reference's own tie order is a
BUILD ARTIFACT — its vendored pdqsort submodule is empty, so every build
of the reference sources substitutes a sort (tools/golden_rig/pdqsort.h).

Two builds are pinned here, on the 7 bench reads where tie order was ever
observed to reach the PAF bytes:

* STABLE build (the parity rig: std::stable_sort, creation order) — the
  framework default; oracle AND batched engine replicate it exactly.
* UNSTABLE build (golden_map_stdsort: libstdc++ std::sort) — replicated
  by the line-exact introsort.py; proves parity is achievable against an
  unstable build's data-dependent tie permutation too.

Requires the bench index (bench_data/rgen_4700000.*, built by bench.py);
skipped when absent.  Short reads run in the default gate; long ones @slow.
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


def _oracle(tie_order):
    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.oracle import OracleMapper, load_uncl
    from uncalled_tpu.poremodel import load_default

    fmi = load_index(PREFIX)
    return OracleMapper(
        fmi, load_default(), load_uncl(PREFIX + ".uncl"), Conf(),
        tie_order=tie_order,
    )


@pytest.fixture(scope="module")
def oracle_stable():
    return _oracle("stable")


@pytest.fixture(scope="module")
def oracle_introsort():
    return _oracle("introsort")


class _Read:
    def __init__(self, id, signal):
        self.id, self.signal = id, signal
        self.channel, self.number, self.start_sample = 1, 0, 0

    @property
    def raw_len(self):
        return len(self.signal)


def _check(oracle, rid, fixture):
    d = np.load(os.path.join(HERE, "fixtures", "tie_reads.npz"))
    with open(os.path.join(HERE, "fixtures", fixture)) as f:
        want = json.load(f)[rid]
    sig = np.asarray(d[rid], np.float32)
    line = oracle.map_read(_Read(rid, sig)).to_line()
    strip = lambda s: "\t".join(
        t for t in s.split("\t") if not t.startswith("mt:")
    )
    assert strip(line) == strip(want)


@needs_bench_index
@pytest.mark.parametrize("rid", FAST)
def test_stable_build_fast(oracle_stable, rid):
    _check(oracle_stable, rid, "tie_pafs.json")


@needs_bench_index
@pytest.mark.slow
@pytest.mark.parametrize("rid", SLOW)
def test_stable_build_slow(oracle_stable, rid):
    _check(oracle_stable, rid, "tie_pafs.json")


@needs_bench_index
@pytest.mark.parametrize("rid", FAST)
def test_unstable_build_fast(oracle_introsort, rid):
    _check(oracle_introsort, rid, "tie_pafs_stdsort.json")


@needs_bench_index
@pytest.mark.slow
@pytest.mark.parametrize("rid", SLOW)
def test_unstable_build_slow(oracle_introsort, rid):
    _check(oracle_introsort, rid, "tie_pafs_stdsort.json")
