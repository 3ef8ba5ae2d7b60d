"""Central configuration.

One flat-ish config object referenced by every component, mirroring the
reference Conf (src/conf.hpp) and its TOML sections
(uncalled/conf/defaults.toml). Values below are the TOML defaults (which are
what the reference CLI actually runs with — e.g. the event detector's
max_mean is 40000 in the TOML, overriding the compiled-in 400).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class EventDetectorParams:
    window_length1: int = 3
    window_length2: int = 6
    threshold1: float = 1.4
    threshold2: float = 9.0
    peak_height: float = 0.2
    min_mean: float = 0.0
    max_mean: float = 40000.0


@dataclass
class EventProfilerParams:
    win_len: int = 25
    win_stdv_min: float = 5.0


@dataclass
class NormalizerParams:
    len: int = 6000
    tgt_mean: float = 90.20827
    tgt_stdv: float = 12.83266


@dataclass
class SeedTrackerParams:
    min_aln_len: int = 25
    min_mean_conf: float = 6.0
    min_top_conf: float = 1.85


@dataclass
class MapperParams:
    seed_len: int = 22
    min_rep_len: int = 0
    max_rep_copy: int = 50
    max_consec_stay: int = 8
    max_paths: int = 10000
    max_events: int = 30000
    max_stay_frac: float = 0.5
    min_seed_prob: float = -3.75
    evt_batch_size: int = 5
    evt_timeout: float = 1e6
    chunk_timeout: float = 4e6


@dataclass
class ReadParams:
    num_channels: int = 512
    bp_per_sec: int = 450
    sample_rate: int = 4000
    chunk_time: float = 1.0
    max_chunks: int = 1000000

    @property
    def chunk_len(self) -> int:
        return int(self.chunk_time * self.sample_rate)

    @property
    def bp_per_samp(self) -> float:
        return float(self.bp_per_sec) / self.sample_rate


@dataclass
class IndexParams:
    max_sample_dist: int = 100
    min_samples: int = 50000
    max_samples: int = 1000000
    kmer_len: int = 5
    matchpr1: float = 0.6334
    matchpr2: float = 0.9838
    pathlen_percentile: float = 0.05
    max_replen: int = 100


@dataclass
class RealtimeParams:
    host: str = "127.0.0.1"
    port: int = 8000
    duration: float = 0.0
    max_active_reads: int = 512
    active_chs: str = "full"  # full | even | odd
    realtime_mode: str = "deplete"  # deplete | enrich
    # backlog shedding: drop an incoming chunk when a channel already has
    # this many unconsumed events queued (the reference holds at most one
    # unprocessed chunk per channel and drops the rest,
    # mapper.cpp:282-287); 0 disables
    max_event_backlog: int = 256


@dataclass
class SimParams:
    ctl_seqsum: str = ""
    unc_seqsum: str = ""
    unc_paf: str = ""
    sim_speed: float = 1.0
    min_ch_reads: int = 10
    scan_time: float = 10.0
    scan_intv_time: float = 5400.0
    ej_time: float = 0.1
    sim_st: float = 0.0
    sim_en: float = 0.0
    sim_even: bool = False
    sim_odd: bool = False


@dataclass
class EngineParams:
    """TPU batching knobs (no reference equivalent; replaces thread counts)."""

    batch_reads: int = 64  # read slots per device batch
    max_paths: int = 1024  # device path budget per read (<= mapper.max_paths)
    max_seeds_per_evt: int = 24  # per-event seed buffer
    max_clusters: int = 384  # seed-cluster table capacity per read
    evt_block: int = 64  # events advanced per jitted super-step
    signal_block: int = 4096  # samples per event-detection block
    # batch-path DSP on device (ops/events.detect_block): batched event
    # detection for a whole refill wave in one jitted stream. Uses f32
    # block-local prefix sums, so event means differ from the host/C++
    # detector in the last ulps -> NOT byte-PAF-exact; opt in when
    # throughput matters more than reference byte-parity.
    device_dsp: bool = False
    # pooled engine (mapping/pooled.py): one flat path pool for the whole
    # batch instead of per-read [B, P] budgets — per-event cost tracks
    # ACTUAL live paths and the per-read budget is the reference's own
    # max_paths, so the remap ladder only backstops physical pool
    # exhaustion.  pool_slots_per_read sizes the pool (S = B * this).
    # Default engine for batch mapping (the classic fixed-budget engine
    # remains for the realtime channel-pinned path and as ladder rungs).
    pooled: bool = True
    pool_slots_per_read: int = 384
    # pool-exhaustion ladder tier: reads that trip a PHYSICAL pool cap
    # rerun on a pooled engine with this many slots/read on B/4 read
    # slots (per-read budgets are already the reference's, so scaling
    # the pools is the only dimension that matters); only ITS rare
    # physical cuts fall through to the classic final rung.  () disables
    # (ejects route straight onto the classic remap ladder).
    # WIDE + DEEP: bench ejects are dominated by foreign/un-decidable
    # reads that wander the whole reference — they accumulate clusters
    # without bound (the reference's std::set has no cap; CL=16384
    # absorbs every observed demand) AND burst 5-7k candidate flags per
    # event (dm_flags p99 ~6k), so a deep-but-narrow tier (384
    # slots/read) just re-ejects them through a second tier at the same
    # total cost (measured 7.8 + 13.9 s split vs 20.8 s single-tier for
    # the 18 foreign bench reads).  One wide+deep re-run is the floor
    # short of giving up early, which parity forbids.
    # slots_per_read 1536 -> 1024 from measured tier pool high-water
    # (BENCH r4: keep hw 11227, flags hw 16781 across the 14-monster
    # load at B=16 => S=16384 keeps 31% margin and cuts the tier's
    # S-proportional step cost ~25-30%; SC floors at 24576 regardless,
    # batch.py)
    pool_wide: tuple = (1024, 16384)  # (slots_per_read, clusters)
    # second pooled tier for the wide tier's own evictions (in practice:
    # un-decidable "foreign" reads that wander the whole reference and
    # accumulate clusters without bound — the reference's std::set has
    # no cap, so matching its output needs a deep table).  Before this
    # tier existed those reads fell through to the classic P=10000
    # rung, whose per-event cost is superlinear in P (~1.3 s/block:
    # 7 such reads burned ~315 s of a 353 s bench run).
    pool_max: tuple = (4096, 65536)  # (slots_per_read, clusters)
    # straggler drain: once the input queue is empty and few reads
    # remain, restart them on a B/8-wide mapper (step cost ~ B) instead
    # of paying full-width steps for a near-empty batch
    drain_shrink: bool = True
    # in-scan slot handoff (pooled engine): decided slots latch their
    # result and immediately restart on a standby read, recovering the
    # mid-block + pipeline slot-events every turnover wastes (~38% of
    # rung0 dispatch measured at r5).  Byte-parity preserving.
    slot_handoff: bool = True
    # drain chain shrink factor: B -> B/div per stage.  div=2 fires the
    # first drain at pending <= B/2 (the declining-occupancy tail at
    # 45-90% empty slots was ~4 s of the measured bench wall; the /4
    # chain waits until pending <= 64 to leave the full-width mapper).
    # More stages = more compiled programs (cached) + migrations.
    drain_div: int = 2
    # smallest B that still drains to B/4: low enough that the eject
    # TIERS (B=16) chain to B=4 drains too — their straggler tails are
    # the longest streams in the whole run (undecidable foreign reads)
    drain_min_batch: int = 8
    # remap ladder: reads whose engine run trips ANY fixed budget (path /
    # candidate / seed-row / cluster capacity) are EJECTED EARLY and
    # re-mapped on a wider rung, so narrow budgets are a throughput
    # optimization, never a semantics change.  Each rung is (paths,
    # batch, seed_rows, clusters, cand_ext; cand_ext 0 = auto); the LAST
    # rung runs the reference's exact max_paths budgets (mapper.cpp:83-86)
    # and ignores its own overflow flags (the reference's own budget cuts
    # apply there).  Rung sizing comes from the measured demand
    # distribution on honest reads (model-mismatched, repeat genome):
    # peak-live-path demand p50=1082 p90=1856 p99~3000 max~3400, flag
    # bursts p90=2635 p95=3560 — so P=2048/CE=4096 absorbs ~92% of the
    # P=1024 narrow rung's ejections and P=4096 nearly all the rest.
    # Reads route to the first rung covering their observed demand
    # (batch.py _rung_fits), skipping provably-too-small rungs.
    remap_wide: bool = True
    remap_ladder: tuple = (
        (2048, 128, 512, 2048, 4096),
        (4096, 64, 512, 2048, 5120),
        (10000, 32, 1024, 4096, 0),
    )


@dataclass
class Conf:
    bwa_prefix: str = ""
    idx_preset: str = "default"
    threads: int = 1
    read_list: str = ""
    max_reads: int = 0
    event_detector: EventDetectorParams = field(default_factory=EventDetectorParams)
    event_profiler: EventProfilerParams = field(default_factory=EventProfilerParams)
    normalizer: NormalizerParams = field(default_factory=NormalizerParams)
    seed_tracker: SeedTrackerParams = field(default_factory=SeedTrackerParams)
    mapper: MapperParams = field(default_factory=MapperParams)
    reads: ReadParams = field(default_factory=ReadParams)
    index: IndexParams = field(default_factory=IndexParams)
    realtime: RealtimeParams = field(default_factory=RealtimeParams)
    simulator: SimParams = field(default_factory=SimParams)
    engine: EngineParams = field(default_factory=EngineParams)

    def load_toml(self, path: str) -> None:
        import tomllib

        with open(path, "rb") as f:
            doc = tomllib.load(f)
        section_map = {
            "global": self,
            "event_detector": self.event_detector,
            "event_profiler": self.event_profiler,
            "normalizer": self.normalizer,
            "seed_tracker": self.seed_tracker,
            "mapper": self.mapper,
            "reads": self.reads,
            "index": self.index,
            "realtime": self.realtime,
            "simulator": self.simulator,
            "engine": self.engine,
        }
        alias = {"min_map_len": "min_aln_len", "max_chunk_wait": "chunk_timeout"}
        for sec, values in doc.items():
            tgt = section_map.get(sec)
            if tgt is None or not isinstance(values, dict):
                continue
            for k, v in values.items():
                k = alias.get(k, k)
                if hasattr(tgt, k):
                    setattr(tgt, k, v)
