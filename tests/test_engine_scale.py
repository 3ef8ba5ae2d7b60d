"""Engine vs oracle at larger-reference scale (budget-binding regime).

Builds a random 150 kb reference on the fly, fits real .uncl thresholds
(which can legitimately contain NaN bins -- reference-parity behavior), and
requires engine PAF == oracle PAF. Exercises the NaN-threshold move gate,
FM-valid candidate budgeting, and larger cluster counts.
"""

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.index.build import build_index
from uncalled_tpu.index.parameterize import build_uncl
from uncalled_tpu.mapping.batch import BatchMapper
from uncalled_tpu.mapping.oracle import OracleMapper, load_uncl
from uncalled_tpu.testing.simulate import simulate_reads


@pytest.fixture(scope="module")
def scale_setup(tmp_path_factory, pore_model):
    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 150_000))
    fa = tmp_path_factory.mktemp("scale") / "ref.fa"
    fa.write_text(f">scale_ref\n{seq}\n")
    fmi = build_index(str(fa))
    uncl = build_uncl(fmi, str(fa)[:-3])
    threshes = load_uncl(uncl)
    reads = simulate_reads(str(fa), 3, seed=5, read_len_bp=(1500, 2500))
    return fmi, threshes, reads


@pytest.mark.slow
def test_engine_matches_oracle_at_scale(scale_setup, pore_model):
    fmi, threshes, reads = scale_setup
    oracle = OracleMapper(fmi, pore_model, threshes, Conf())
    want = {r.id: oracle.map_read(r).to_line() for r in reads}

    conf = Conf()
    conf.engine.pooled = False  # this file gates the CLASSIC engine
    conf.engine.batch_reads = 3
    conf.engine.evt_block = 16
    bm = BatchMapper(
        fmi, pore_model, threshes, conf, P=10000, C=10000, R=512, CL=2048
    )
    got = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    for rid in want:
        assert got[rid] == want[rid], rid
