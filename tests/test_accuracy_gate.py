"""Accuracy gate: our mapper vs the unmodified reference binary on a
repeat-bearing genome with model-mismatched reads.

This is the anti-softball check (VERDICT r1): the genome has IS-element /
operon repeats, the reads carry calibration jitter, stalls, skips, and
baseline wander the pore model doesn't predict — and the judge is the
actual reference mapper (tools/golden_rig) on the same signal + index.

The default-gate version runs a small slice; `-m slow` scales it up.
The TPU-scale (>=500 reads, Mb genome) run is `BENCH_RIG=1 python
bench.py`, which reports `rig_agree` in the bench JSON.
"""

import os
import subprocess

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.index.build import build_index
from uncalled_tpu.index.bwa_compat import write_bwa_index
from uncalled_tpu.index.parameterize import build_uncl
from uncalled_tpu.mapping.batch import BatchMapper
from uncalled_tpu.mapping.oracle import load_uncl
from uncalled_tpu.testing.simulate import realistic_genome, simulate_reads

RIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "golden_rig", "golden_map",
)


@pytest.fixture(scope="module")
def gate_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("gate")
    fa = d / "ref.fa"
    seq = realistic_genome(200_000, seed=9)
    fa.write_text(">gate_ref\n" + "\n".join(
        seq[i : i + 80] for i in range(0, len(seq), 80)
    ) + "\n")
    fmi = build_index(str(fa))
    prefix = str(d / "ref")
    write_bwa_index(fmi, prefix)
    build_uncl(fmi, prefix)
    return fmi, prefix, str(fa)


def run_gate(gate_setup, pore_model, n_reads, seed):
    fmi, prefix, fa = gate_setup
    reads = simulate_reads(
        fa, n_reads, seed=seed, read_len_bp=(1200, 3000), mismatch=True
    )
    conf = Conf()
    conf.engine.batch_reads = min(n_reads, 8)
    bm = BatchMapper(fmi, pore_model, load_uncl(prefix + ".uncl"), conf)
    ours = {p.rd_name: p.to_line() for p in bm.map_reads(reads)}

    same = 0
    rig_lines = {}
    for r in reads:
        sigf = os.path.join(os.path.dirname(prefix), f"{r.id}.f32")
        r.signal.astype("<f4").tofile(sigf)
        out = subprocess.run(
            [RIG, prefix, sigf, r.id], capture_output=True, text=True,
            timeout=600,
        )
        os.unlink(sigf)
        assert out.returncode == 0, out.stderr[-400:]
        line = "\t".join(
            t
            for t in out.stdout.strip().splitlines()[-1].split("\t")
            if not t.startswith("mt:")
        )
        rig_lines[r.id] = line
        same += line == ours[r.id]
    return same, n_reads, ours, rig_lines


@pytest.mark.skipif(not os.path.exists(RIG), reason="golden rig not built")
def test_accuracy_gate_small(gate_setup, pore_model):
    """8 mismatched reads on a 200 kb repeat genome: every PAF line must
    match the reference binary byte-for-byte (mt excluded)."""
    same, total, ours, rig = run_gate(gate_setup, pore_model, 8, seed=31)
    mismatches = {k: (ours[k], rig[k]) for k in ours if ours[k] != rig[k]}
    assert same == total, mismatches


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(RIG), reason="golden rig not built")
def test_accuracy_gate_wide(gate_setup, pore_model):
    """48 reads; requires >= 96% byte-agreement (a budget-bound read may
    legitimately differ until the wide remap ladder is applied — the
    default conf remaps, so in practice this is 100%)."""
    same, total, ours, rig = run_gate(gate_setup, pore_model, 48, seed=32)
    assert same / total >= 0.96, (same, total)
