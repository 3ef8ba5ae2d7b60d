"""Realtime stack: ClientSim device simulator + streaming DSP + channel-pinned
mapper, driven by the reference's decision loop on a deterministic clock.
"""

import io

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.realtime.clientsim import ClientSim
from uncalled_tpu.realtime.mapper import RealtimeMapper
from uncalled_tpu.realtime.sim import SimClock, default_pattern, run_sim_loop
from uncalled_tpu.realtime.signal import ChannelDSP
from uncalled_tpu.testing.simulate import simulate_reads


def test_streaming_dsp_chunking_invariance(golden_reads):
    """The number of events entering the normalizer is chunking-independent
    (detection is prefix-determined; the profiler delay/mask depends only on
    the event stream). Normalized values differ only through pop timing."""
    conf = Conf()
    sig = golden_reads["sim_0005_Escherichia_coli_3483_+"][:16000]
    streams = {}
    for cs in (2000, 4000):
        dsp = ChannelDSP(conf)
        outs = []
        for i in range(0, len(sig), cs):
            dsp.process_chunk(sig[i : i + cs])
            outs.append(dsp.pop_all(10000))
        streams[cs] = np.concatenate(outs)
    a, b = streams[2000], streams[4000]
    assert len(a) == len(b) > 100
    assert a.dtype == np.float32
    assert np.isfinite(a).all()
    # values agree closely; small deviations from rolling-stats pop timing
    np.testing.assert_allclose(a, b, atol=2.0)


@pytest.fixture(scope="module")
def sim_setup(example_index, example_threshes, pore_model):
    conf = Conf()
    conf.reads.num_channels = 4
    conf.engine.evt_block = 64
    conf.simulator.sim_speed = 1.0
    reads = simulate_reads(
        "tests/fixtures/example_index/example_ref.fa", 6, seed=21,
        read_len_bp=(800, 1500),
    )
    for i, r in enumerate(reads):
        r.number = i + 1
    return conf, reads, example_index, example_threshes, pore_model


def run_sim(conf, reads, fmi, threshes, model, deplete=True, even=False):
    clock = SimClock()
    client = ClientSim(conf, clock=clock)
    total = sum(r.raw_len for r in reads)
    default_pattern(client, reads, duration_samples=total * 3, gap=2000)
    client.load_reads(reads)
    rt = RealtimeMapper(
        fmi, model, threshes, conf, P=1024, C=1024, R=64, CL=256
    )
    buf = io.StringIO()
    run_sim_loop(
        client, rt, conf, deplete=deplete, even=even, out=buf, sleep=0.2,
        clock=clock, max_wall=120.0,
    )
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    return lines


def test_sim_deplete_ejects_mapped_reads(sim_setup):
    conf, reads, fmi, threshes, model = sim_setup
    lines = run_sim(conf, reads, fmi, threshes, model, deplete=True)
    assert len(lines) >= len(reads) - 1  # reads cycle; most get decided
    mapped = [l for l in lines if "\t+\t" in l or "\t-\t" in l]
    ejected = [l for l in mapped if "ej:f:" in l]
    assert len(mapped) >= 3
    # deplete mode ejects mapped reads
    assert len(ejected) == len(mapped)
    # every mapped read hits the only reference sequence
    for l in mapped:
        assert "Escherichia_coli_chromosome:2400000-2410000" in l


def test_sim_enrich_keeps_mapped_reads(sim_setup):
    conf, reads, fmi, threshes, model = sim_setup
    lines = run_sim(conf, reads, fmi, threshes, model, deplete=False)
    mapped = [l for l in lines if "kp:f:" in l]
    assert len(mapped) >= 3  # enrich keeps the on-target (mapped) reads
    for l in mapped:
        assert "ej:f:" not in l
