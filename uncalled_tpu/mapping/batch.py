"""Host orchestration for batch mapping: reads -> events -> engine -> PAF.

Replaces the reference's MapPool thread model (map_pool.cpp:28-158) with
slot-based batched dispatch: B device read slots advance T events per jitted
step; finished slots are harvested and refilled from the read queue (the
divergent-lifecycle strategy from SURVEY.md §7).

Event detection + global normalization run on host with the sequential-parity
implementations (the reference normalizes whole batch reads the same way:
Normalizer::set_signal via mapper.cpp:188-200), then only normalized f32
event means cross to the device.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import Conf
from ..kmer import K
from ..ops.events import detect_events_np
from .engine import MapEngine
from .paf import Paf, Tag

F32 = np.float32
F64 = np.float64


def normalize_events(means: np.ndarray, tgt_mean: float, tgt_stdv: float):
    """Global z-score onto the model distribution; f64 accumulation in
    sequential order like the reference (normalizer.cpp:46-118 via the
    oracle; np.cumsum is a sequential reduction, so the sum order matches).
    """
    n = len(means)
    if n == 0:
        return means.astype(F32), F32(1), F32(0)
    m64 = means.astype(F64)
    gmean = np.cumsum(m64)[-1] / n
    varsum = np.cumsum((m64 - gmean) ** 2)[-1]
    scale = F32(tgt_stdv / np.sqrt(varsum / n))
    shift = F32(tgt_mean - scale * gmean)
    return (scale * means.astype(F32) + shift).astype(F32), scale, shift


@dataclass
class _Slot:
    read: object = None
    means: np.ndarray = None  # normalized event means
    fed: int = 0  # events fed to the device so far
    mean_evt_len: np.float32 = F32(0)
    t_start: float = 0.0  # wall-clock when the read entered its slot


class BatchMapper:
    """Map an iterable of reads, yielding Paf records (order of completion)."""

    def __init__(self, fmi, model, threshes, conf: Conf | None = None,
                 emit_timing: bool = False, _rung: int = 0,
                 _pool_tier: int = 0, engine=None, _B_entry: int = 0,
                 **over):
        self.conf = conf or Conf()
        if engine is None:
            if self.conf.engine.pooled and _rung == 0:
                from .pooled import PooledEngine

                # drop classic per-read budget knobs the pool doesn't have
                pover = {
                    k: v for k, v in over.items()
                    if k not in ("P", "C", "CE", "R")
                }
                engine = PooledEngine(fmi, model, threshes, self.conf, **pover)
            else:
                engine = MapEngine(fmi, model, threshes, self.conf, **over)
        self.eng = engine
        self.fmi = fmi
        self.model = model
        self.threshes = threshes
        self.T = self.conf.engine.evt_block
        self.emit_timing = emit_timing
        # position on the remap ladder: rung 0 is the narrow engine;
        # rungs 1..len(remap_ladder) are built lazily from conf.  The
        # last rung runs the reference's exact budgets and ignores its
        # own overflow flags.
        self._rung = _rung
        self._pool_tier = _pool_tier
        # entry batch size anchors the pooled-tier shrink (passed down
        # explicitly: reconstructing it from the clamped per-tier B
        # over-counts once the max(2, ...) clamp fires — ADVICE r3)
        self._B_entry = _B_entry or self.eng.params.B
        self._dsp_pool = None
        self._next_mapper = None
        self._over = dict(over)
        self._drain_mapper = None
        # per-read budget-overflow bitmask recorded at harvest time
        # (1=CL evict, 2=CE flags, 4=C cands, 8=P paths, 16=R rows);
        # diagnostics for tuning the remap ladder
        self.ovf_why: dict = {}
        # per-read demand maxima (flags, valid, paths, rows) at harvest;
        # lower bounds for overflowed reads, exact otherwise
        self.demand: dict = {}
        # slot-event accounting: dispatched = B*T per advance (the device
        # always runs the full arrays), useful = per-read evt_i at
        # harvest — their ratio is the measured slot utilization
        self.disp_events = 0
        self.useful_events = 0
        # host-overhead attribution (seconds): drain-handoff migrations
        # (incl. their device syncs) and refill/DSP walls — the bench's
        # wall minus device waits lives here
        self.t_migrate = 0.0
        self.t_refill = 0.0
        self.n_migrate = 0
        # [absorb_hw, n_paths device_get, migrate dispatch] seconds
        self.mig_phase = [0.0, 0.0, 0.0]
        self.n_handoff = 0  # device switches harvested (swap branch)
        # pool-global demand high-water (pooled engines only): max over
        # all events of [flags, valid, keep, entries, rows] WANT totals —
        # the sizing evidence for SC/S/RE/RT (state["dm_pool"])
        self.pool_hw = np.zeros(5, np.int64)

    def _pool_tiers(self):
        """Enabled pooled eject tiers, as a truthy PREFIX of
        (pool_wide, pool_max): disabling pool_wide disables the whole
        pooled tier chain (ejects route straight onto the classic
        ladder, as the pool_wide docstring promises)."""
        tiers = []
        for t in (self.conf.engine.pool_wide, self.conf.engine.pool_max):
            if not t:
                break
            tiers.append(t)
        return tiers

    def _get_next(self) -> "BatchMapper":
        """Next (wider) ladder rung for reads whose run here tripped a
        budget; built lazily, cached.

        Pooled entry engines get a POOLED wide tier first
        (conf.engine.pool_wide): per-read budgets are already the
        reference's, so only the physical pools need scaling — far
        cheaper than the classic [B, P] wide rungs, whose per-event cost
        is superlinear in P.  The classic FINAL rung stays as the
        backstop for the wide pool's own (rare^2) physical cuts."""
        from .pooled import PooledEngine

        en = self.conf.engine
        if self._next_mapper is None:
            tiers = self._pool_tiers()
            if (
                isinstance(self.eng, PooledEngine)
                and self._pool_tier < len(tiers)
            ):
                slots, CLw = tiers[self._pool_tier]
                # ejects are a few reads per batch; a narrow slot array
                # keeps the tier's per-event cost (~prop. to S) low.
                # Per SLOT-event the cost is ~flat in B (slots/read is
                # fixed, so S scales with B) — the only lever is PADDING:
                # BENCH_r04 measured 4 CL-evicted monsters burning 20.7 s
                # (53%% of wall) in a B=16 tier at 25%% occupancy.  B=4
                # runs the typical eject count at ~full occupancy; bigger
                # eject waves just run more (cheaper) waves at the same
                # total slot-event cost.  The entry batch size anchors
                # the shrink so chained tiers don't collapse to B=2.
                # Tier sizing (BENCH_r04 runs 1-3): the eject load is
                # ~12-16 reads per 1024 (rung0's 4 CL evicts PLUS the
                # drain chain's — drains eject monsters too), and the
                # tier's per-event cost is dominated by the S/SC-sized
                # stages, which AMORTIZE over more slots: B=16 ran the
                # load in one wave (20.7 s); B=4 took ~4 waves at the
                # same per-wave cost (30 s).  Keep B = B_entry/16.
                Bw = max(2, self._B_entry // (16 * (2 ** self._pool_tier)))
                if slots >= 512:
                    # floor 8 (tier 1: 4): at small entry batches the
                    # B-scaled tier pool collapses below the monsters'
                    # own path demand (100 Mb run at B_entry=64: tier
                    # S=4*1024=4096 < paths hw 5747 => 25 re-ejects
                    # through a useless tier, demand_scale).  Scoped to
                    # production-sized tiers so deliberately tiny
                    # pool_wide configs still trip (tests).
                    Bw = max(8 // (1 + self._pool_tier), Bw)
                # SC: Bw*slots*5/4 measured clean at B=16 (run 1), but a
                # SMALL tier's SC must floor at the monsters' per-EVENT
                # flag demand (max 9899/read; run 2's B=4-scaled SC=7680
                # cut 7 reads onto the B=2 max tier for 24.3 s); 5*S is
                # the structural cap (<=5 flags per slot).  Floor 24576:
                # tier dm_pool flags high-water 16781 across the full
                # 14-monster bench load (1.46x margin; an SC cut here
                # re-ejects to the max tier, so the margin stays fat).
                SCw = min(5 * Bw * slots,
                          max(Bw * slots + Bw * slots // 4, 24576))
                self._next_mapper = BatchMapper(
                    self.fmi, self.model, self.threshes, self.conf,
                    emit_timing=self.emit_timing,
                    _rung=max(len(en.remap_ladder) - 1, 0),
                    _pool_tier=self._pool_tier + 1,
                    _B_entry=self._B_entry,
                    engine=PooledEngine(
                        self.fmi, self.model, self.threshes, self.conf,
                        B=Bw, S=Bw * slots, SC=SCw,
                        CL=CLw, R=max(1024, self.eng.params.R), FS=512,
                        RE=2048, RT=max(8192, self.eng.params.RT),
                    ),
                )
                # tiers run a handful of monster reads for thousands of
                # events: double the event block to halve the per-block
                # dispatch/readout round trips (same trade the drain makes)
                self._next_mapper.T = min(2 * self.T, 128)
                return self._next_mapper
            P, B, R, CL, CE = en.remap_ladder[self._rung]
            self._next_mapper = BatchMapper(
                self.fmi, self.model, self.threshes, self.conf,
                emit_timing=self.emit_timing, _rung=self._rung + 1,
                B=B, P=P, C=P, R=R, CL=CL, CE=CE,
            )
        return self._next_mapper

    def _get_drain(self) -> "BatchMapper":
        """Straggler-drain mapper: same budgets and ladder rung, B/4 read
        slots.  Once the input queue is empty and few reads remain, the
        full-width batch pays its whole step cost for a near-empty slot
        array — the tail of long-deciding reads dominated wall time on
        the measured bench.  Restarting the stragglers on a narrow batch
        costs a re-run of their events at ~1/4 the step price, and the
        drain mapper CHAINS (256 -> 64 -> 16) so the tail shrinks
        geometrically with the straggler count."""
        if self._drain_mapper is None:
            # NOTE: with LPT scheduling (map_reads) the tail reads are
            # the SHORT ones, so drain pools keep the default
            # slots/read — an S/2-sized drain pool was measured 2.9 s
            # slower on the bench (light tails don't need the headroom;
            # path-heavy reads now finish inside the full batch)
            Bd = max(4, self.eng.params.B // self.conf.engine.drain_div)
            if self._pool_tier > 0:
                # EJECT-TIER drain: the tier runs a handful of monster
                # reads whose wall is set by the LONGEST one (BENCH_r04:
                # 21.1 s of 39.5 for 14 monsters at B=16, the late
                # blocks ~6% occupied).  Per-event cost is ~prop. to
                # S/SC, so chaining B 16 -> 8 -> 4 while the monsters
                # finish cuts the single-straggler tail ~4x.  The drain
                # must inherit the TIER's per-read pool geometry
                # (slots/read, CL, R, RE, RT) — a conf-default drain
                # (384 slots, CL=2048) would instantly re-evict the
                # very reads the tier exists for — and migration
                # additionally requires equal CL (migrate_pool_state).
                from .pooled import PooledEngine

                pp = self.eng.params
                slots = pp.S // pp.B
                self._drain_mapper = BatchMapper(
                    self.fmi, self.model, self.threshes, self.conf,
                    emit_timing=self.emit_timing, _rung=self._rung,
                    _pool_tier=self._pool_tier, _B_entry=self._B_entry,
                    engine=PooledEngine(
                        self.fmi, self.model, self.threshes, self.conf,
                        B=Bd, S=Bd * slots,
                        # per-EVENT flag demand is per-read (monsters
                        # burst up to ~10k flags), so SC keeps the
                        # tier's floor rather than scaling with B
                        SC=min(5 * Bd * slots,
                               max(Bd * slots + Bd * slots // 4, pp.SC)),
                        CL=pp.CL, R=pp.R, FS=pp.FS, RE=pp.RE, RT=pp.RT,
                    ),
                )
            else:
                # proportional pools (conf formula): correct for the
                # LIGHT LPT tail the re-admit policy delivers (a 1.5x-S
                # SC margin for heavier populations benched 28.5 vs
                # 36.4+ — see _pull's policy note)
                self._drain_mapper = BatchMapper(
                    self.fmi, self.model, self.threshes, self.conf,
                    emit_timing=self.emit_timing, _rung=self._rung,
                    **{**self._over, "B": Bd},
                )
            # double the event block to halve per-block dispatch/readout
            # round trips.  (Under LPT the tail holds SHORT reads, so
            # this trades a little finalize latency per read for fewer
            # round trips.)  A T=512 trial for B<=8 drains MEASURED
            # WORSE (35.7 vs 37.1 reads/s, r5_i): narrow tier-drain
            # blocks are COMPUTE-bound at the tier's SC floor (~1.8
            # ms/event — monster flag bursts keep SC at 24576 at any
            # width), and coarse blocks overshoot stream ends.
            self._drain_mapper.T = min(2 * self.T, 128)
        return self._drain_mapper

    def _rung_fits(self, rung_i: int, why: int, dm) -> bool:
        """Could ladder rung ``rung_i`` hold a read whose overflow
        bitmask/demand lower bounds are (why, dm)?  Demand maxima are
        exact until the first budget cut, so a rung whose budgets don't
        even cover the OBSERVED demand is a guaranteed re-overflow —
        skip it (the last rung always fits: its own budgets are the
        reference's)."""
        ladder = self.conf.engine.remap_ladder
        if rung_i >= len(ladder):
            return True
        P, _, R, CL, CE = ladder[rung_i]
        CE = CE if CE else P + max(P // 4, 256)
        fl, va, pa, rw = dm[:4]
        # dm_cl (dm[4], sticky max live clusters) is a true cluster-demand
        # lower bound: a rung whose CL doesn't exceed it re-overflows
        cl_dm = dm[4] if len(dm) > 4 else 0
        if fl > CE or va > P or pa > P or rw > R or cl_dm > CL:
            return False
        # for a cluster-table eviction (bit 1) the observed dm_cl is
        # itself capped at the tripped table's CL, so true demand exceeds
        # it: require strictly more cluster capacity than both
        if (why & 1) and CL <= max(self.eng.params.CL, cl_dm):
            return False
        return True

    # ------------------------------------------------------------- events
    def _prepare_wave(self, reads) -> list:
        """Batched on-device DSP for a refill wave (conf.engine.device_dsp):
        one detect_block stream over all new reads at once instead of
        serial per-read host detection.  The JAX detector's f32
        block-local sums make event means differ in the last ulps from
        the host/C++ path, so this mode trades reference byte-parity for
        throughput (see EngineParams docs)."""
        import jax.numpy as jnp

        from ..ops.events import detect_block, make_detector_state

        sb = self.conf.engine.signal_block
        Bw = len(reads)
        L = max(r.raw_len for r in reads)
        nb = max(-(-L // sb), 1)
        sigs = np.zeros((Bw, nb * sb), np.float32)
        for i, r in enumerate(reads):
            sigs[i, : r.raw_len] = r.signal
        state = make_detector_state(Bw)
        means = [[] for _ in reads]
        lens = [[] for _ in reads]
        ed = self.conf.event_detector
        for b in range(nb):
            state, out = detect_block(
                state, jnp.asarray(sigs[:, b * sb : (b + 1) * sb])
            )
            fired = np.asarray(out["fired"])
            m = np.asarray(out["mean"])
            ln = np.asarray(out["length"])
            st = np.asarray(out["start"])
            for i, r in enumerate(reads):
                # drop events born in the zero padding past the signal
                keep = fired[i] & (st[i] < r.raw_len)
                means[i].append(m[i][keep])
                lens[i].append(ln[i][keep])
        slots = []
        cap = self.conf.mapper.max_events
        for i, r in enumerate(reads):
            mm = np.concatenate(means[i]) if means[i] else np.zeros(0, F32)
            ll = np.concatenate(lens[i]) if lens[i] else np.zeros(0, F32)
            mask = (mm >= ed.min_mean) & (mm <= ed.max_mean)
            mm, ll = mm[mask], ll[mask]
            mel = F32(ll.sum()) / F32(len(ll)) if len(ll) else F32(0)
            # normalization targets are the PORE MODEL's own mean/stdv
            # (mapper.cpp:94 set_target(model.get_means_mean(), ...)); the
            # conf defaults are only the Normalizer PRMS_DEF fallback
            norm, _, _ = normalize_events(
                mm, self.model.means_mean, self.model.means_stdv,
            )
            slots.append(
                _Slot(read=r, means=norm[:cap], fed=0, mean_evt_len=mel)
            )
        return slots

    def _prepare(self, read) -> _Slot:
        ed = self.conf.event_detector
        from .. import native

        ev = native.detect_events(read.signal, ed.min_mean, ed.max_mean)
        if ev is None:  # no native lib: python oracle fallback (slow)
            ev = detect_events_np(read.signal, ed.min_mean, ed.max_mean)
        if ev["total_events"] > 0:
            mel = F32(ev["len_sum"]) / F32(ev["total_events"])
        else:
            mel = F32(0)
        norm, _, _ = normalize_events(
            ev["mean"], self.model.means_mean, self.model.means_stdv
        )
        cap = self.conf.mapper.max_events
        return _Slot(read=read, means=norm[:cap], fed=0, mean_evt_len=mel)

    # ---------------------------------------------------------------- paf
    def _event_to_bp(self, evt_i, mel, last=False):
        # parity with mapper.cpp:703-706 (u32 wrap + f32 multiply chain)
        e = np.uint32(np.int64(int(evt_i)) & 0xFFFFFFFF)
        bp_per_samp = F32(self.conf.reads.bp_per_samp)
        v = F32(F32(F32(e) * mel) * bp_per_samp) + F32(int(last) * (K - 1))
        return int(v)

    def _finalize(self, slot: _Slot, ro, b) -> Paf:
        import time

        read = slot.read
        paf = Paf(rd_name=read.id)
        if self.emit_timing:
            # mt: wall time the read spent in its device slot (the
            # reference's mt is per-read map_read wall time,
            # read_buffer.cpp:34-50; under batched dispatch this time is
            # shared with B-1 other reads)
            paf.set_float(Tag.MAP_TIME, (time.time() - slot.t_start) * 1000.0)
        paf.set_int(Tag.CHANNEL, read.channel)
        paf.set_int(Tag.READ_START, read.start_sample)
        paf.rd_len = int(F32(F32(read.raw_len) * F32(self.conf.reads.bp_per_samp)))
        if not ro["success"][b]:
            return paf

        mel = slot.mean_evt_len
        ref_st = int(ro["mm_ref_st"][b])
        ref_en_end = int(ro["mm_r2e"][b])
        evt_st = int(ro["mm_evt_st"][b])
        evt_en = int(ro["mm_evt_en"][b])
        total_len = int(ro["mm_len"][b])
        event_i = int(ro["dec_evt"][b])

        fwd = ref_st < self.fmi.n // 2
        sa_st = ref_st if fwd else self.fmi.n - (ref_en_end + K - 1)
        rd_st = self._event_to_bp(evt_st - self.conf.mapper.seed_len, mel)
        rd_en = self._event_to_bp(evt_en, mel, True)
        rd_len = self._event_to_bp(event_i, mel, True)
        rf_name, rf_st, rf_len = self.fmi.translate_loc(sa_st)
        rf_en = rf_st + (ref_en_end - ref_st + K)
        paf.rd_len = rd_len
        paf.set_mapped(
            rd_st, rd_en, rf_name, rf_st, rf_en, rf_len, fwd, total_len + K - 1
        )
        return paf

    # --------------------------------------------------------------- main
    def map_reads(self, reads):
        """Generator over Paf results; `reads` is any iterable of Read-likes.

        When the input is a materialized sequence, reads are scheduled
        LONGEST-FIRST (LPT): the handful of slow-deciding monster reads
        then amortize inside the full batch instead of serializing in
        the end-of-run straggler drain at 1/16th parallelism (bench
        telemetry: the drain tail was ~34%% of wall at arrival order).
        Output order is completion order either way — PAF consumers
        (and the reference's own thread pool) are order-agnostic.
        """
        if hasattr(reads, "__len__"):
            reads = sorted(
                reads, key=lambda r: len(r.signal), reverse=True
            )
        B = self.eng.params.B
        yield from self._run(
            iter(reads), [None] * B, self.eng.fresh_state(), 0, False, None
        )

    def _try_migrate(self, dm, state, keep):
        """Drain-by-migration: move the stragglers' device state into the
        narrow mapper instead of restarting them (a restart re-burns each
        read's whole event history at drain step cost).  Returns the
        migrated state, or None when migration doesn't apply (classic
        engines, too many reads, pool wouldn't fit, mismatched shapes)."""
        from .pooled import PooledEngine

        self.n_migrate += 1
        if not (
            isinstance(self.eng, PooledEngine)
            and isinstance(dm.eng, PooledEngine)
        ):
            return None
        ps, pd = self.eng.params, dm.eng.params
        if len(keep) > pd.B or ps.CL != pd.CL or ps.seed_len != pd.seed_len:
            return None
        import time as _time

        import jax

        t0 = _time.time()
        # ONE device round trip for both the hw absorb and the fit check
        # (two sequential device_gets measured as a per-hop stall)
        hw, n_paths = jax.device_get(
            (state.get("dm_pool"), state["n_paths"])
        ) if "dm_pool" in state else (None, jax.device_get(state["n_paths"]))
        if hw is not None:
            np.maximum(self.pool_hw, np.asarray(hw), out=self.pool_hw)
        n_paths = np.asarray(n_paths)
        t2 = _time.time()
        self.mig_phase[1] += t2 - t0
        if int(n_paths[keep].sum()) > pd.S:
            return "nofit"  # caller may wait for fewer stragglers
        sel = np.full(pd.B, -1, np.int32)
        sel[: len(keep)] = keep
        out = self.eng.migrate(state, sel, dm.eng)
        self.mig_phase[2] += _time.time() - t2
        return out

    def _absorb_hw(self, state):
        """Fold the device's pool-global demand high-water into the
        host-side record (called once per run end / pre-migration)."""
        if isinstance(state, dict) and "dm_pool" in state:
            import jax

            hw = np.asarray(jax.device_get(state["dm_pool"]))
            np.maximum(self.pool_hw, hw, out=self.pool_hw)

    def _run(self, it, slots, state, pending, input_done, ovf_sink):
        """Core slot loop.  ``ovf_sink`` non-None routes budget ejects to
        the caller's list (drain mappers hand ejects UP so only the entry
        mapper's ladder instances — and their compiled programs — exist).

        Slot-handoff protocol (PoolParams.handoff): each occupied slot
        carries a STANDBY read whose 0-based [0, 2T) event window rides
        every advance; when the primary decides mid-scan the DEVICE
        latches its result and restarts the slot as the standby read
        (pooled._pool_event_step).  The host sees the switch one block
        late (pipelining), emits the latched PAF, makes the standby the
        primary lane at exactly fed = evt_i + T (the in-flight block's
        standby consumption is deterministic), and arms the next read.
        This removes the ~T/2 mid-block + ~T pipeline slot-events every
        read turnover used to waste (61% rung0 utilization, BENCH r5).
        """
        B, T = self.eng.params.B, self.T
        ho = bool(getattr(self.eng.params, "handoff", False))
        if ho:
            from .pooled import LATCH_KEYS
        standby: dict = {}  # b -> armed standby _Slot
        promote_pending = np.zeros(B, bool)
        ready: list = []  # (b, slot): standbys promoted the classic way
        returned: list = []  # disarmed standbys' reads, re-queued for
        # the straggler drain (see the tail-mode disarm below)
        stale = np.zeros(B, bool)  # freed-but-alive slots needing reset

        def _pull():
            """Next read: disarmed-standby returns first, then the
            input iterator (StopIteration only when both are dry).

            MEASURED POLICY NOTE: re-admitting returns as full-width
            primaries looks like it defeats the tail-mode disarm, but
            HOLDING them for the drain was tried and benched WORSE
            twice (36.4-37.1 -> 33.8/28.5 reads/s): exact-threshold
            drains then migrate mid-flight HEAVY reads whose combined
            flag/path demand overflows the half-sized drain pools
            (fresh why=2/why=8 ejects onto the wide tier), and widening
            the drain SC to compensate taxes every drain block.  The
            re-admit path keeps the drain population the LIGHT tail the
            pools are sized for."""
            nonlocal input_done
            if returned:
                return returned.pop(0)
            try:
                return next(it)
            except StopIteration:
                input_done = True
                raise

        def refill(state):
            nonlocal pending, input_done
            _t0 = __import__("time").time()
            try:
                return _refill(state)
            finally:
                self.t_refill += __import__("time").time() - _t0

        def _refill(state):
            nonlocal pending, input_done
            mask = stale.copy()  # latch-fallback slots: state still alive
            stale[:] = False
            # standbys whose primary never switched (exhausted/ejected
            # reads) enter their slot the classic way: fresh reset, any
            # stray device-side switch state is wiped by the same reset
            while ready:
                b, s = ready.pop()
                assert slots[b] is None
                s.t_start = __import__("time").time()
                slots[b] = s
                mask[b] = True  # pending was counted at standby attach
            incoming = []
            for b in range(B):
                if slots[b] is None:
                    try:
                        incoming.append((b, _pull()))
                    except StopIteration:
                        break
            if not incoming:
                if ho:
                    state = _arm_standbys(state)
                return self.eng.reset_slots(state, mask) if mask.any() else state
            if self.conf.engine.device_dsp and len(incoming) > 1:
                new_slots = self._prepare_wave([r for _, r in incoming])
            elif len(incoming) > 3:
                # host DSP threads: the native detector is a ctypes call
                # (GIL released) and normalization is numpy, so a refill
                # wave's per-read prep parallelizes across cores
                from concurrent.futures import ThreadPoolExecutor

                if self._dsp_pool is None:
                    self._dsp_pool = ThreadPoolExecutor(max_workers=8)
                new_slots = list(
                    self._dsp_pool.map(
                        self._prepare, [r for _, r in incoming]
                    )
                )
            else:
                new_slots = [self._prepare(r) for _, r in incoming]
            now = __import__("time").time()
            for (b, _), s in zip(incoming, new_slots):
                s.t_start = now
                slots[b] = s
                mask[b] = True
                pending += 1
            if ho:
                state = _arm_standbys(state)
            return self.eng.reset_slots(state, mask)

        def _arm_standbys(state):
            """Attach the next queued read to every occupied slot that
            lacks one (host-side; the device sees it via the sb window
            at the next dispatch)."""
            nonlocal pending, input_done
            want = [
                b for b in range(B)
                if slots[b] is not None and b not in standby
            ]
            incoming = []
            for b in want:
                # never arm past end-of-input: tail-mode returns would
                # re-arm and cycle with the disarm above
                if input_done:
                    break
                try:
                    incoming.append((b, _pull()))
                except StopIteration:
                    break
            if not incoming:
                return state
            if len(incoming) > 3:
                from concurrent.futures import ThreadPoolExecutor

                if self._dsp_pool is None:
                    self._dsp_pool = ThreadPoolExecutor(max_workers=8)
                prepped = list(
                    self._dsp_pool.map(
                        self._prepare, [r for _, r in incoming]
                    )
                )
            else:
                prepped = [self._prepare(r) for _, r in incoming]
            now = __import__("time").time()
            for (b, _), s in zip(incoming, prepped):
                s.t_start = now
                standby[b] = s
                pending += 1
            return state

        remap = (
            self.conf.engine.remap_wide
            and self._rung < len(self.conf.engine.remap_ladder)
        )
        overflowed = [] if ovf_sink is None else ovf_sink
        drained = []
        # drain at the entry rung AND at pooled eject tiers (the tier
        # wall is set by the longest monster read at shrinking occupancy
        # — BENCH_r04: 53% of bench wall at ~25% occupancy); classic
        # ladder rungs stay drain-free (their batches are already small
        # and a drain mapper is another compiled program per rung)
        can_drain = (
            self.conf.engine.drain_shrink
            and B >= self.conf.engine.drain_min_batch
            and (self._rung == 0 or self._pool_tier > 0)
            # the B//div shrink floors at 4: a drain that wouldn't
            # actually narrow the batch is pure program churn
            and max(4, B // self.conf.engine.drain_div) < B
        )

        def emit_latched(s, ro, b):
            """Emit the latched (lt_*) readout of a switched-away
            primary: returns a Paf to yield, or None when the read was
            routed to the eject ladder instead."""
            lt = {k: ro["lt_" + k] for k in LATCH_KEYS}
            self.useful_events += int(lt["evt_i"][b])
            dm = tuple(
                int(lt["dm_" + k2][b])
                for k2 in ("flags", "valid", "paths", "rows", "cl")
            )
            self.demand[s.read.id] = dm
            if lt["ovf"][b]:
                self.ovf_why[s.read.id] = int(lt["ovf_why"][b])
                if remap:
                    overflowed.append((s.read, int(lt["ovf_why"][b]), dm))
                    return None
            return self._finalize(s, lt, b)

        state = refill(state)
        drain_cont = None
        _zeros_b = np.zeros(B, bool)
        nofit_at = None  # straggler count at the last nofit migration
        # Speculative double-buffering (PERF.md): dispatch block k+1 and
        # its readout BEFORE fetching block k's readout, so host work
        # (readout transfer, harvest, DSP, refill) overlaps device
        # compute.  Done slots are frozen by the engine's alive mask, so
        # feeding a just-finished read one extra block is a no-op; newly
        # refilled reads start at block k+2.  ``pend`` holds the one
        # in-flight block: (readout handle, [(slot idx, slot, fed_after)]).
        pend = None
        while pending or pend is not None or returned:
            if returned and not pending and pend is None:
                state = refill(state)  # re-admit disarmed standbys
            # drain at <= B/2 actives (post-input the un-armed batch is
            # mostly empty padding — a B/4 threshold trial cost 5 extra
            # full-width blocks AND kept the tier at B=16 through the
            # whole monster procession, r5_l); the heavier migrated
            # population gets SC margin in the drain pool instead
            # (_get_drain)
            thresh = max(4, B // self.conf.engine.drain_div)
            if (
                ho and can_drain and input_done and standby
                and pending - len(standby) <= thresh
                and (nofit_at is None or pending - len(standby) < nofit_at)
            ):
                # TAIL MODE: the straggler drain must not be starved by
                # lingering standbys (first handoff bench: the ~128-read
                # tail ran at full B=256 for ~90 extra blocks).  Disarm:
                # stop feeding the standby windows and re-queue the
                # unswitched standbys for the drain mapper.  A standby
                # the in-flight block ALREADY switched to is caught at
                # harvest by the latch fallback below (r1 emitted from
                # lt_*, the standby re-runs from scratch).
                for b in list(standby):
                    returned.append(standby.pop(b).read)
                    pending -= 1  # re-counted when pulled again
            want_drain = (
                can_drain and input_done and pending <= thresh
                # handoff state must be fully settled before a migration
                # (standby windows and unpromoted switches don't travel)
                and not standby and not promote_pending.any() and not ready
                # a nofit migration attempt idles the device (the
                # pipeline must be dry to migrate): don't retry until
                # the straggler count actually dropped
                and (nofit_at is None or pending < nofit_at)
            )
            if pend is None and pending and want_drain:
                # straggler drain (pipeline empty, state fully settled):
                # continue the few remaining reads on a B/4-wide mapper
                # instead of paying full-width steps — by STATE MIGRATION
                # when pooled (no event re-burn), restart otherwise
                dm = self._get_drain()
                keep = [b for b in range(B) if slots[b] is not None]
                _tm = __import__("time").time()
                mig = self._try_migrate(dm, state, keep)
                self.t_migrate += __import__("time").time() - _tm
                if mig == "nofit":
                    nofit_at = pending
                if mig == "nofit" and (
                    self._pool_tier > 0
                    or pending > max(
                        4, B // (2 * self.conf.engine.drain_div)
                    )
                ):
                    # path-heavy stragglers exceed the narrow pool: stay
                    # on the wide mapper until fewer remain rather than
                    # restarting (re-burning) all of them.  Tier monsters
                    # NEVER restart-drain: re-burning a multi-thousand-
                    # event monster at drain step cost exceeds any width
                    # saving
                    mig = None
                    want_drain = False
                elif mig == "nofit":
                    mig = None
                    drained = [s.read for s in slots if s is not None]
                elif mig is not None:
                    dslots = [slots[b] for b in keep]
                    dslots += [None] * (dm.eng.params.B - len(keep))
                    drain_cont = (dm, dslots, mig, len(keep))
                else:
                    drained = [s.read for s in slots if s is not None]
                if mig is not None or drained:
                    slots = [None] * B
                    pending = 0
                    break
            if pending and not want_drain:
                means = np.zeros((B, T), np.float32)
                on = np.zeros((B, T), bool)
                snap = []
                for b, s in enumerate(slots):
                    if s is None:
                        continue
                    nxt = s.means[s.fed : s.fed + T]
                    means[b, : len(nxt)] = nxt
                    on[b, : len(nxt)] = True
                    s.fed += len(nxt)
                    snap.append((b, s, s.fed))
                if ho and (standby or promote_pending.any()):
                    W = 2 * T
                    sb_m = np.zeros((B, W), np.float32)
                    sb_o = np.zeros((B, W), bool)
                    armed = np.zeros(B, bool)
                    for b, ss in standby.items():
                        w = ss.means[:W]
                        sb_m[b, : len(w)] = w
                        sb_o[b, : len(w)] = True
                        armed[b] = True
                    prom = promote_pending.copy()
                    promote_pending[:] = False
                    state = self.eng.advance(
                        state, means, on, sb=(sb_m, sb_o, armed, prom)
                    )
                else:
                    state = self.eng.advance(state, means, on)
                self.disp_events += B * T
                new_pend = (self.eng.readout_start(state), snap)
            else:
                new_pend = None
            if pend is not None:
                ro = self.eng.readout_get(pend[0])
                for b, s, fed_after in pend[1]:
                    if slots[b] is not s:
                        continue  # harvested at an earlier block
                    ro_sw = ro["sw"] if (ho and "sw" in ro) else _zeros_b
                    if ho and b in standby and bool(ro_sw[b]):
                        # the device switched this slot to its standby:
                        # emit the latched primary and promote the
                        # standby to the primary lane at the exact
                        # deterministic offset (evt_i at readout + T
                        # consumed during the in-flight block)
                        paf = emit_latched(s, ro, b)
                        if paf is not None:
                            yield paf
                        ss = standby.pop(b)
                        ss.fed = min(int(ro["evt_i"][b]) + T, len(ss.means))
                        slots[b] = ss
                        promote_pending[b] = True
                        pending -= 1
                        self.n_handoff += 1
                        continue  # the promoted read reports next block
                    if ho and bool(ro_sw[b]) and not promote_pending[b]:
                        # LATCH FALLBACK: the device switched but the
                        # standby was disarmed (tail mode) before this
                        # harvest — emit the finished primary from the
                        # latch; the standby (already in `returned`)
                        # re-runs from scratch, its partial device
                        # progress is discarded by the slot reset.
                        paf = emit_latched(s, ro, b)
                        if paf is not None:
                            yield paf
                        slots[b] = None
                        stale[b] = True  # r2's live rows need a reset
                        pending -= 1
                        continue
                    exhausted = fed_after >= len(s.means)
                    # EARLY EJECT: once the sticky overflow flag is set
                    # this rung's result will be discarded in favor of a
                    # wider remap, so free the slot now instead of
                    # letting the (possibly path-lost) read burn its
                    # whole event stream
                    if remap and ro["ovf"][b]:
                        self.ovf_why[s.read.id] = int(ro["ovf_why"][b])
                        self.demand[s.read.id] = dm = (
                            int(ro["dm_flags"][b]), int(ro["dm_valid"][b]),
                            int(ro["dm_paths"][b]), int(ro["dm_rows"][b]),
                            int(ro["dm_cl"][b]),
                        )
                        overflowed.append((s.read, int(ro["ovf_why"][b]), dm))
                        self.useful_events += int(ro["evt_i"][b])
                        slots[b] = None
                        pending -= 1
                        if ho and b in standby:
                            # unswitched standby takes the slot classically
                            ready.append((b, standby.pop(b)))
                    elif ro["done"][b] or exhausted:
                        if ro["ovf"][b]:
                            self.ovf_why[s.read.id] = int(ro["ovf_why"][b])
                        self.demand[s.read.id] = (
                            int(ro["dm_flags"][b]), int(ro["dm_valid"][b]),
                            int(ro["dm_paths"][b]), int(ro["dm_rows"][b]),
                            int(ro["dm_cl"][b]),
                        )
                        self.useful_events += int(ro["evt_i"][b])
                        yield self._finalize(s, ro, b)
                        slots[b] = None
                        pending -= 1
                        if ho and b in standby:
                            ready.append((b, standby.pop(b)))
                # refill resets slots on the LATEST dispatched state, so
                # new reads join the block after the in-flight one
                state = refill(state)
            pend = new_pend

        self._absorb_hw(state)
        if drain_cont is not None:
            dm, dslots, mig, dn = drain_cont
            # disarmed standbys re-enter via the drain's own input
            yield from dm._run(
                iter(returned), dslots, mig, dn, not returned, overflowed
            )
            returned = []
        elif drained:
            dm = self._get_drain()
            yield from dm._run(
                iter(drained + returned), [None] * dm.eng.params.B,
                dm.eng.fresh_state(), 0, False, overflowed,
            )
            returned = []
        assert not returned, "disarmed standbys must re-enter a mapper"

        if ovf_sink is not None:
            return  # ejects routed by the entry mapper

        if overflowed:
            # pooled entry tier: ejects are PHYSICAL pool cuts — the
            # per-read budget is already the reference's — so they all
            # go to the single pooled wide tier (no demand routing over
            # classic budgets)
            from .pooled import PooledEngine

            if (
                isinstance(self.eng, PooledEngine)
                and self._pool_tier < len(self._pool_tiers())
            ):
                yield from self._get_next().map_reads(
                    [read for read, _, _ in overflowed]
                )
                return
            # remap pass: reads that tripped a budget rerun on a wider
            # rung; the final rung is the reference's exact max_paths
            # budgets (mapper.cpp:83-86).  Demand-routed: each read goes
            # to the FIRST rung whose budgets cover its observed demand
            # lower bounds (skipping rungs that would provably re-trip).
            ladder = self.conf.engine.remap_ladder
            groups: dict = {}
            for read, why, dm in overflowed:
                j = self._rung
                while not self._rung_fits(j, why, dm):
                    j += 1
                groups.setdefault(min(j, len(ladder) - 1), []).append(read)
            for j in sorted(groups):
                m = self
                while m._rung <= j:
                    m = m._get_next()
                yield from m.map_reads(groups[j])
