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


def test_debug_dump_and_parse(example_index, example_threshes, pore_model,
                              golden_reads, make_read, tmp_path):
    """dump_read writes events/seeds files; DebugParser re-clusters them to
    the mapped location (the reference DEBUG_* + debug.py flow)."""
    from uncalled_tpu.debug import DebugParser, dump_read
    from uncalled_tpu.mapping.batch import BatchMapper

    conf = Conf()
    conf.engine.batch_reads = 1
    bm = BatchMapper(example_index, pore_model, example_threshes, conf)
    rid = "sim_0000_Escherichia_coli_3854_+"
    prefix = str(tmp_path / "dbg_")
    paf, n_rows = dump_read(bm, make_read(rid, golden_reads[rid]), prefix)
    assert paf.is_mapped
    assert n_rows >= 5
    dp = DebugParser(prefix, rid)
    assert len(dp.events) > 20
    clusters = dp.seed_clusters()
    assert clusters
    top = clusters[0]
    # the dominant seed cluster lies at the mapped PAF location
    assert top["name"] == paf.rf_name
    assert abs(top["st"] - paf.rf_st) < 200
    # the path DAG is present, parents resolve, and ancestry chains run
    # back through consecutive events to a source
    assert dp.paths
    deep = max(dp.paths, key=lambda k: dp.paths[k]["full_len"])
    chain = dp.path_ancestry(*deep)
    assert len(chain) >= min(dp.paths[deep]["full_len"], 10)
    for (evt, _), row in chain[:-1]:
        assert row["parent"][0] == evt - 1
    root_key, root = chain[-1]
    assert root["parent"] == root_key or root["full_len"] == 1


def test_map_ordered_matches_truth(example_index, example_threshes, pore_model):
    """Chunk-ordered replay (MapPoolOrd equivalent) maps reads correctly."""
    from uncalled_tpu.mapping.ordered import map_ordered
    from uncalled_tpu.testing.simulate import simulate_reads

    reads = simulate_reads(
        "tests/fixtures/example_index/example_ref.fa", 4, seed=31,
        read_len_bp=(900, 1600),
    )
    for i, r in enumerate(reads):
        r.channel = (i % 2) + 1
        r.start_sample = 10000 * (i // 2) + 1
    conf = Conf()
    conf.engine.evt_block = 64
    got = list(
        map_ordered(example_index, pore_model, example_threshes, reads, conf,
                    P=1024, C=1024, R=64, CL=256)
    )
    by_id = {p.rd_name: p for p in got}
    assert len(by_id) == 4
    truth = {r.id: r for r in reads}
    n_ok = 0
    for rid, p in by_id.items():
        r = truth[rid]
        # reverse reads decide near ref_end (mapping starts at the read's
        # beginning = the genome span's end)
        if p.is_mapped and r.ref_start - 400 <= p.rf_st <= r.ref_end + 400:
            n_ok += 1
    assert n_ok >= 3


def test_backlog_shedding(example_index, example_threshes, pore_model,
                          golden_reads):
    """Chunks arriving faster than the mapper consumes them are dropped
    once the per-channel event backlog passes the cap (the reference
    holds at most one unprocessed chunk, mapper.cpp:282-287)."""
    conf = Conf()
    conf.reads.num_channels = 2
    conf.realtime.max_event_backlog = 64
    rt = RealtimeMapper(
        example_index, pore_model, example_threshes, conf,
        P=64, C=64, R=16, CL=32,
    )
    sig = golden_reads["sim_0000_Escherichia_coli_3854_+"]

    class Ck:
        def __init__(self, number, s, start):
            self.number, self.signal, self.start = number, s, start
            self.read_id = f"rd{number}"

    # flood channel 1 with chunks, never calling update()
    step = 4000
    for i in range(0, len(sig) - step, step):
        rt.add_chunks([(1, Ck(1, sig[i : i + step], i))], now=float(i) / 4000)
    ch = rt.channels[0]
    assert ch.shed_chunks > 0, "backlog cap never triggered"
    # overshoot is at most one chunk's worth of events (~600 at 4000
    # samples/chunk) — same granularity as the reference's 1-chunk buffer
    assert ch.dsp.norm.unread_size() < conf.realtime.max_event_backlog + 700

    # with shedding disabled the whole signal queues up
    conf2 = Conf()
    conf2.reads.num_channels = 2
    conf2.realtime.max_event_backlog = 0
    rt2 = RealtimeMapper(
        example_index, pore_model, example_threshes, conf2,
        P=64, C=64, R=16, CL=32,
    )
    for i in range(0, len(sig) - step, step):
        rt2.add_chunks([(1, Ck(1, sig[i : i + step], i))], now=float(i) / 4000)
    assert rt2.channels[0].shed_chunks == 0
    assert (
        rt2.channels[0].dsp.norm.unread_size()
        > ch.dsp.norm.unread_size()
    )


def test_cigar_query_to_refs_and_compare(tmp_path, example_index,
                                         example_threshes, pore_model,
                                         golden_reads, make_read):
    """cigar query->ref mapping (debug.py:520-549 role) + seed scoring
    against a synthetic basecalled alignment."""
    from uncalled_tpu.debug import (
        DebugParser, cigar_query_to_refs, compare_seeds_to_basecall,
        dump_read,
    )
    from uncalled_tpu.mapping.batch import BatchMapper
    from uncalled_tpu.pafstats import PafEntry

    line = ("q1\t100\t0\t100\t+\tref\t10000\t500\t600\t90\t100\t60\t"
            "cg:Z:50M2D30M1I19M")
    p = PafEntry(line)
    m = cigar_query_to_refs(p)
    assert m[0] == [0]
    assert m[49] == [49]
    # the D op pairs its boundary query position too (reference zip
    # semantics), then the next M continues past the 2-base deletion
    assert m[50] == [50, 52]
    assert m[79] == [81]
    assert m[80] == [82]  # insertion consumes query only
    assert m[81] == [82]

    # end-to-end: dump a golden read, compare its seeds to a "basecalled"
    # alignment synthesized from the truth position
    conf = Conf()
    conf.engine.batch_reads = 1
    bm = BatchMapper(example_index, pore_model, example_threshes, conf)
    rid = "sim_0000_Escherichia_coli_3854_+"
    prefix = str(tmp_path / "dbg_")
    paf, _ = dump_read(bm, make_read(rid, golden_reads[rid]), prefix)
    dp = DebugParser(prefix, rid)
    qlen = paf.rd_len
    bc_line = (
        f"{rid}\t{qlen}\t0\t{qlen}\t+\t{paf.rf_name}\t10000\t"
        f"{max(paf.rf_st - 20, 0)}\t{paf.rf_en}\t{qlen}\t{qlen}\t60\t"
        f"cg:Z:{qlen}M"
    )
    bc_paf = tmp_path / "bc.paf"
    bc_paf.write_text(bc_line + "\n")
    rows, summary = compare_seeds_to_basecall(dp, str(bc_paf), rid)
    assert summary["n_scored"] > 0
    assert summary["median_err"] is not None
    # seeds cluster near the basecalled alignment
    assert summary["frac_within_100"] > 0.5


def test_bc_aln_from_moves():
    """Guppy move-table -> per-sample reference coords (debug.py:483-517
    parse_bc_aln role): a synthetic move table round-trips through a
    synthetic cigar to known reference positions."""
    import numpy as np

    from uncalled_tpu.debug import BCE_K, BCE_STRIDE, bc_aln_from_moves
    from uncalled_tpu.pafstats import PafEntry

    # 24 move slots; a move on every 3rd slot -> query coords 1..8
    moves = np.zeros(24, np.uint8)
    moves[::3] = 1
    packed = np.packbits(moves)
    # identity alignment: query q maps to ref offset q
    p = PafEntry("q1\t100\t0\t100\t+\tref\t10000\t500\t600\t90\t100\t60\t"
                 "cg:Z:100M")
    out = bc_aln_from_moves(p, bce_samp_st=1000, bce_moves_packed=packed)
    assert out is not None
    samps, refs = out
    # every slot emits one (sample, ref) pair; samples stride by 5
    assert len(samps) == 24
    assert samps[0] == 1000 and samps[1] == 1000 + BCE_STRIDE
    # slot i has query coord 1 + i//3 -> ref offset the same, shifted
    # to the k-mer start
    want = 1 + np.arange(24) // 3 - BCE_K + 1
    assert (refs == want).all()
    # min_samp trims leading slots; max_samp truncates the table
    s2, r2 = bc_aln_from_moves(p, 1000, packed, min_samp=1010)
    assert s2[0] == 1010 and len(s2) == 22
    s3, r3 = bc_aln_from_moves(p, 1000, packed, max_samp=1050)
    assert len(s3) == int((1050 - 1000 + 1) // BCE_STRIDE)
    # no cigar -> None
    assert bc_aln_from_moves(
        PafEntry("q1\t100\t0\t100\t+\tref\t10000\t500\t600\t90\t100\t60"),
        1000, packed) is None


def test_clientsim_pattern_files(tmp_path):
    """File-based pattern population (client_sim.cpp:44-208 formats)."""
    conf = Conf()
    conf.reads.num_channels = 2
    (tmp_path / "p_itvs.txt").write_text("1 0 0 5000\n2 0 100 4000\n")
    (tmp_path / "p_gaps.txt").write_text("1 0 250\n")
    (tmp_path / "p_delays.txt").write_text("2 0 400\n")
    (tmp_path / "p_reads.txt").write_text("1 rd_a 0\n2 rd_b 50\n")
    cs = ClientSim(conf)
    assert cs.load_pattern_files(str(tmp_path / "p"))
    assert cs.channels[0].intvs[0].gaps == [250]
    assert cs.channels[1].intvs[0].delays == [400]
    # missing file -> False
    cs2 = ClientSim(conf)
    assert not cs2.load_pattern_files(str(tmp_path / "missing"))
