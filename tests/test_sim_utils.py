"""Sim pattern builder (realtime/sim_utils) on a synthetic run.

Builds a small synthetic sequencing_summary pair (an "UNCALLED" run with a
real 4-block mux scan + a control run) plus a PAF with ejection tags, runs
the full load_sim flow against a recording client, and pins the resulting
pattern (intervals / gaps / delays / read assignment) against a golden
snapshot committed under tests/fixtures/.  This makes structural rewrites
of sim_utils safe: behavior is the contract, not the code shape.

Reference behavior: uncalled/sim_utils.py:20-442.
"""

import json
import os

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.realtime import sim_utils

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOLDEN = os.path.join(FIXTURES, "sim_utils_golden.json")

HEADER = (
    "filename\tread_id\tchannel\tmux\tstart_time\tduration\t"
    "template_start\ttemplate_duration\tsequence_length_template\n"
)


def _row(rid, ch, mux, st, dur, bases=1000):
    tmpl_st = st + 0.1
    tmpl_dur = max(dur - 0.1, 0.0)
    return (
        f"f5\t{rid}\t{ch}\t{mux}\t{st:.3f}\t{dur:.3f}\t"
        f"{tmpl_st:.3f}\t{tmpl_dur:.3f}\t{bases}\n"
    )


def _make_run(rng, n_ch=4, scan_at=100.0, tag="unc"):
    """Reads on n_ch channels with a 4-block mux scan starting at scan_at."""
    rows = []
    rid = 0

    def emit(ch, mux, st, dur):
        nonlocal rid
        rows.append((st, _row(f"{tag}_{rid:04d}", ch, mux, st, dur)))
        rid += 1

    # pre-scan activity: bursts with mid-sized gaps, one long pause per ch
    for ch in range(1, n_ch + 1):
        t = 1.0 + 0.37 * ch
        for k in range(8):
            dur = 2.0 + float(rng.uniform(0, 2))
            emit(ch, 1 + (k % 2), t, dur)
            t += dur + float(rng.uniform(0.5, 3.0))
            if k == 4:
                t += 40.0  # long inactive gap (active_thresh splitter)
    # the mux scan: 4 blocks (mux 1..4), each a tight burst, >1s apart
    t = scan_at
    for mux in range(1, 5):
        for ch in range(1, n_ch + 1):
            emit(ch, mux, t + 0.05 * ch, 0.5 + 0.05 * ch)
        t += 8.0
    # post-scan activity
    for ch in range(1, n_ch + 1):
        t = scan_at + 40.0 + 0.21 * ch
        for k in range(6):
            dur = 3.0 + float(rng.uniform(0, 2))
            emit(ch, 1 + (k % 3), t, dur)
            t += dur + float(rng.uniform(0.5, 2.0))
    rows.sort()
    return [r for _, r in rows]


class RecordingClient:
    def __init__(self, n_ch):
        self.channels = list(range(1, n_ch + 1))
        self.calls = {"intv": [], "gap": [], "delay": [], "read": []}

    def add_intv(self, ch, i, st, en):
        self.calls["intv"].append([int(ch), int(i), int(st), int(en)])

    def add_gap(self, ch, i, ln):
        self.calls["gap"].append([int(ch), int(i), int(ln)])

    def add_delay(self, ch, i, ln):
        self.calls["delay"].append([int(ch), int(i), int(ln)])

    def add_read(self, ch, rid, offs):
        self.calls["read"].append([int(ch), rid, int(offs)])


@pytest.fixture
def sim_files(tmp_path):
    rng = np.random.default_rng(7)
    unc = tmp_path / "unc_seqsum.txt"
    unc.write_text(HEADER + "".join(_make_run(rng, tag="unc")))
    ctl = tmp_path / "ctl_seqsum.txt"
    ctl.write_text(HEADER + "".join(_make_run(rng, tag="ctl")))
    # PAF with ejection tags for most of the unc reads
    paf_lines = []
    for i in range(0, 80):
        tag = "ej" if i % 2 == 0 else "ub"
        paf_lines.append(
            f"unc_{i:04d}\t450\t0\t450\t+\tref\t10000\t100\t550\t"
            f"450\t450\t255\t{tag}:f:0.35\n"
        )
    paf = tmp_path / "unc.paf"
    paf.write_text("".join(paf_lines))
    return str(unc), str(ctl), str(paf)


def run_load_sim(sim_files):
    unc, ctl, paf = sim_files
    conf = Conf()
    conf.simulator.unc_seqsum = unc
    conf.simulator.ctl_seqsum = ctl
    conf.simulator.unc_paf = paf
    conf.simulator.min_ch_reads = 2
    conf.simulator.sim_speed = 0.25
    client = RecordingClient(4)
    sim_utils.load_sim(client, conf)
    return client.calls


def test_load_sim_matches_golden(sim_files):
    calls = run_load_sim(sim_files)
    if not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(calls, f, indent=1, sort_keys=True)
        pytest.skip("golden snapshot created; rerun to verify")
    with open(GOLDEN) as f:
        want = json.load(f)
    assert calls == want


def test_find_scans_synthetic(sim_files):
    prof = sim_utils.SeqsumProfile(sim_files[0], num_channels=4)
    scans = sim_utils.find_scans(prof.sts, prof.ens, prof.mxs)
    # exactly one scan window, covering the 4 mux blocks around t=100..130
    assert len(scans) == 1
    st, en = scans[0]
    assert st < 101 and en > 124
