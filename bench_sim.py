#!/usr/bin/env python
"""Realtime-simulation benchmark: ClientSim + RealtimeMapper driving a
512-channel flow cell on the chip (VERDICT r2 item 6).

The simulator replays the honest bench read set over
conf.reads.num_channels channels on a VIRTUAL sample clock (1 s chunks
at 4 kHz, the MinION cadence the reference models, read_buffer.cpp:
26-32); the decision loop runs exactly the production
realtime/sim.run_sim_loop.  The headline is the REALTIME FACTOR:
virtual seconds simulated per wall second (>= 1 means one chip keeps up
with a live flow cell and ejection decisions arrive in time to matter).

Reference comparison (/root/reference/README.md:104-108): realtime
per-read map times mt 63-376 ms, wait times up to 1591 ms on 16 CPU
threads.

Prints ONE JSON line like bench.py.  Env knobs:
  BENCH_SIM_CH (512)      channels
  BENCH_SIM_SECS (30)     virtual seconds to simulate
  BENCH_SIM_READS (1024)  reads dealt over the channels
"""

import io
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_CH = int(os.environ.get("BENCH_SIM_CH", 512))
SIM_SECS = float(os.environ.get("BENCH_SIM_SECS", 30))
N_READS = int(os.environ.get("BENCH_SIM_READS", 1024))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    os.makedirs(os.path.join(REPO, "bench_data", "xla_cache"), exist_ok=True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, "bench_data", "xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as benchmod

    prefix, reads_npz = benchmod.ensure_assets()

    from uncalled_tpu.config import Conf
    from uncalled_tpu.index.fmindex import load_index
    from uncalled_tpu.mapping.oracle import load_uncl
    from uncalled_tpu.poremodel import load_default
    from uncalled_tpu.realtime.clientsim import ClientSim
    from uncalled_tpu.realtime.mapper import RealtimeMapper
    from uncalled_tpu.realtime.sim import (
        SimClock, default_pattern, run_sim_loop,
    )

    d = np.load(reads_npz, allow_pickle=True)
    meta = json.loads(str(d["meta"]))
    reads = [
        benchmod.BenchRead(m[0], d[f"sig_{i}"])
        for i, m in enumerate(meta[:N_READS])
    ]

    conf = Conf()
    conf.reads.num_channels = N_CH
    conf.simulator.sim_speed = 1.0
    # realtime pool sizing: MEASURED dm_pool high-water at 512 channels
    # was keep 126542 / flags 115058 — 192 slots/read (S=98304) ran the
    # pool OVER capacity (cut reads now give up via the ovf valve,
    # realtime/mapper.py).  288 slots/read covers the measured want
    # with margin; the step cost is ~linear in S, so fewer channels per
    # chip is the other way to buy margin.
    conf.engine.pool_slots_per_read = int(
        os.environ.get("BENCH_SIM_SLOTS", 288)
    )

    clock = SimClock()
    client = ClientSim(conf, clock=clock)
    dur = int(conf.reads.sample_rate * (SIM_SECS + 60))
    default_pattern(client, reads, dur)
    client.load_reads(reads)

    t0 = time.time()
    rt = RealtimeMapper(
        fmi := load_index(prefix), load_default(),
        load_uncl(prefix + ".uncl"), conf,
    )
    # warm the ADVANCE path too (an idle update never compiles it — the
    # first run measured its ~128 s remote compile INSIDE the timed
    # window, mt p90 ~= compile wall): feed one synthetic chunk so
    # update() takes the active branch, then reset the channel
    from uncalled_tpu.realtime.mapper import _Channel

    class _WarmChunk:
        number, start, read_id = 0, 0, "warmup"
        signal = np.random.RandomState(0).normal(
            90.0, 10.0, 4000
        ).astype(np.float32)

    rt.add_chunks([(1, _WarmChunk())], 0.0)
    rt.update(0.0)
    import jax as _j

    _j.block_until_ready(rt.state["evt_i"])
    rt.channels[0] = _Channel()
    mask0 = np.zeros(N_CH, bool)
    mask0[0] = True
    rt.state = rt.eng.reset_slots(rt.state, mask0)
    _j.block_until_ready(rt.state["evt_i"])
    compile_s = time.time() - t0

    out = io.StringIO()
    t0 = time.time()
    # 0.3 s virtual ticks: ~34 events/channel accumulate per tick, so the
    # T=32 advance runs FULL blocks instead of 1/3-empty ones (0.1 s
    # ticks measured 3x the block count for the same event volume)
    n = run_sim_loop(
        client, rt, conf, deplete=True,
        sleep=float(os.environ.get("BENCH_SIM_TICK", 0.3)), clock=clock,
        out=out, duration=SIM_SECS / 3600.0,
    )
    wall = time.time() - t0
    sim_elapsed = client.get_runtime()

    # decision tags: ej (ejected), kp (kept), mx (over eject budget),
    # en (ended/unmapped); values are seconds since the read's last chunk
    # on the VIRTUAL clock (decision latency in flow-cell time)
    tags = {"ej": [], "kp": [], "mx": [], "en": []}
    mts = []
    n_lines = 0
    for line in out.getvalue().splitlines():
        if line.startswith("#"):
            continue
        n_lines += 1
        for f in line.split("\t"):
            for t in tags:
                if f.startswith(f"{t}:f:"):
                    tags[t].append(float(f.split(":")[2]))
            if f.startswith("mt:f:"):
                mts.append(float(f.split(":")[2]))

    def pct(a):
        if not a:
            return None
        a = np.asarray(a)
        return [round(float(np.percentile(a, p)), 3) for p in (50, 90, 99)]

    # ovf give-up cost (VERDICT r4 #4): a pool-cut read ends unmapped
    # and KEEPS SEQUENCING with unknown status — in deplete mode the
    # lost opportunity is the pore time it would have freed had it been
    # decidable.  Price it against the total pore budget of the run.
    sig_len = {m[0]: len(d[f"sig_{i}"]) for i, m in enumerate(meta[:N_READS])}
    chunk_len = int(conf.reads.sample_rate * conf.reads.chunk_time)
    ovf_giveups = [g for g in rt.giveups if g[1]]
    waste = sum(
        max(0, sig_len.get(rid, 0) - n_ch_ * chunk_len)
        for rid, _, n_ch_ in ovf_giveups
    )
    pore_budget = N_CH * sim_elapsed * conf.reads.sample_rate
    rtf = sim_elapsed / wall if wall else 0.0
    print(json.dumps({
        "metric": f"realtime_factor_chip_{N_CH}ch_sim",
        "value": round(rtf, 3),
        "unit": "sim_s/wall_s",
        "vs_baseline": round(rtf / 1.0, 3),  # 1.0 = keeps up with the pore
        "extra": {
            "channels": N_CH,
            "sim_seconds": round(sim_elapsed, 1),
            "wall_seconds": round(wall, 1),
            "wall_ms_per_decision": round(wall / max(n_lines, 1) * 1000, 1),
            "decisions": n_lines,
            "decisions_per_sim_min": round(n_lines / max(sim_elapsed, 1e-9) * 60, 1),
            "n_ej": len(tags["ej"]), "n_kp": len(tags["kp"]),
            "n_mx": len(tags["mx"]), "n_en": len(tags["en"]),
            # give-ups: total not-success ends; ovf = the pool-cut
            # valve specifically; waste = samples those reads go on
            # sequencing with unknown status, as a fraction of the
            # run's total pore sample budget
            "n_giveup": len(rt.giveups),
            "n_giveup_ovf": len(ovf_giveups),
            "giveup_ovf_waste_samples": int(waste),
            "giveup_ovf_waste_pore_frac": round(
                waste / max(pore_budget, 1), 5
            ),
            "eject_latency_s_p50_p90_p99": pct(tags["ej"]),
            "keep_latency_s_p50_p90_p99": pct(tags["kp"]),
            "mt_batchshared_ms_p50_p90_p99": pct(mts),  # advance wall is shared by all active channels (mapper.py)
            # realtime pool-global demand high-water vs capacity
            # ([flags, valid, keep, entries, rows] vs [SC, SC, S, RE,
            # RT]): the sizing evidence for the streaming pool, whose
            # per-tick step cost is ~linear in S
            "pool_hw": [int(x) for x in np.asarray(rt.state["dm_pool"])]
            if "dm_pool" in rt.state else None,
            "pool_cap": [rt.eng.params.SC, rt.eng.params.SC,
                         rt.eng.params.S, rt.eng.params.RE,
                         rt.eng.params.RT]
            if hasattr(rt.eng.params, "SC") else None,
            "compile_s": round(compile_s, 1),
            "reference": "README.md:104-108 mt 63-376 ms, wt <= 1591 ms (16 CPU threads)",
        },
    }))


if __name__ == "__main__":
    main()
