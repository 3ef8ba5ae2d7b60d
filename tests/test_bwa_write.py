"""BWA-format index writer: roundtrip + golden-rig end-to-end.

write_bwa_index lets the reference binary (tools/golden_rig) map against
references we synthesize — the basis of the Mb-scale accuracy gate.
"""

import os
import subprocess

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.index import bwa_compat
from uncalled_tpu.index.build import build_index
from uncalled_tpu.index.parameterize import build_uncl
from uncalled_tpu.mapping.batch import BatchMapper
from uncalled_tpu.poremodel import load_default
from uncalled_tpu.mapping.oracle import load_uncl
from uncalled_tpu.testing.simulate import simulate_reads

RIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "golden_rig", "golden_map",
)


@pytest.fixture(scope="module")
def small_ref(tmp_path_factory):
    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 30_000))
    d = tmp_path_factory.mktemp("bwa_write")
    fa = d / "ref.fa"
    fa.write_text(f">writer_test_ref\n{seq}\n")
    fmi = build_index(str(fa))
    prefix = str(d / "ref")
    bwa_compat.write_bwa_index(fmi, prefix)
    build_uncl(fmi, prefix)
    return fmi, prefix


def test_roundtrip_matches(small_ref):
    fmi, prefix = small_ref
    primary, L2, words = bwa_compat.read_bwt(prefix)
    assert primary == fmi.primary
    assert np.array_equal(L2, fmi.L2)
    assert np.array_equal(words, fmi.bwt_words)
    p2, intv, seq_len, samp = bwa_compat.read_sa(prefix)
    assert p2 == fmi.primary and seq_len == fmi.n
    assert np.array_equal(samp, fmi.sa_full[::intv][1 : len(samp) + 1])
    l_pac, names, offs, lens = bwa_compat.read_ann(prefix)
    assert l_pac == fmi.l_pac and names == fmi.ref_names


def test_bwa_files_load_as_index(small_ref):
    fmi, prefix = small_ref
    fmi2 = bwa_compat.load_bwa_index(prefix)
    assert fmi2.n == fmi.n
    assert np.array_equal(fmi2.sa_full, fmi.sa_full)
    assert np.array_equal(fmi2.bwt_words, fmi.bwt_words)


@pytest.mark.skipif(not os.path.exists(RIG), reason="golden rig not built")
def test_rig_maps_on_written_index(small_ref, tmp_path, pore_model):
    """The unmodified reference binary maps a simulated read against our
    written index and agrees byte-for-byte with our engine."""
    fmi, prefix = small_ref
    fa = prefix + ".fa"
    if not os.path.exists(fa):
        fa = os.path.join(os.path.dirname(prefix), "ref.fa")
    reads = simulate_reads(fa, 2, seed=3, read_len_bp=(1500, 2500))
    conf = Conf()
    conf.engine.batch_reads = 2
    bm = BatchMapper(fmi, pore_model, load_uncl(prefix + ".uncl"), conf)
    ours = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}
    for r in reads:
        sigf = tmp_path / f"{r.id}.f32"
        r.signal.astype("<f4").tofile(sigf)
        out = subprocess.run(
            [RIG, prefix, str(sigf), r.id],
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-500:]
        rig_line = out.stdout.strip().splitlines()[-1]
        # drop the rig's wall-clock mt tag; everything else must match
        rig_line = "\t".join(
            t for t in rig_line.split("\t") if not t.startswith("mt:")
        )
        assert rig_line == ours[r.id], (rig_line, ours[r.id])
