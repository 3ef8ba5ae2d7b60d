"""Pooled device mapping engine: one flat path pool for the whole batch.

The per-read engine (engine.py) sizes every array to a per-read budget
P, so each event step pays B x P work while the MEAN live path count on
real reads is ~300 (measured: p50=1082 peak but ~319 mean, PERF.md) —
and a too-small P silently loses the true path, so the remap ladder
rungs multiply the cost again.  This engine instead keeps ALL reads'
paths in one flat structure-of-arrays pool of S slots:

  * pool slots are sorted by (owner read, creation order); a read's
    paths are a contiguous segment, located via the per-read path
    counts carried in state — every "per read" quantity becomes a
    boundary gather on a global exclusive cumsum,
  * per-path work (flags, FM extension, scoring) is elementwise or
    gathered over [S]/[SC] flat arrays via the two-level MXU one-hot
    kernel (ops/flat_gather.py), so cost tracks ACTUAL live paths,
  * the per-read budget is the reference's own max_paths (10000,
    mapper.cpp:83-86) enforced by within-read position — budget parity
    BY CONSTRUCTION, no remap ladder; only physical pool exhaustion
    (burst > S across the whole batch) sets the overflow flag, and
    those rare reads fall back to the classic wide engine.

Semantics are the reference mapper's event loop (mapper.cpp:433-663)
exactly as re-derived in engine.py — candidate flags in creation order,
FM-valid budget counting, sorted dedup, head/gap/full source creation,
ended-parent seed checks with budget-break parity, the SeedTracker
cluster table — and the tracker/decision stages reuse engine.py's
[B, CL] implementations unchanged.  Golden-PAF parity is the test bar.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..config import Conf
from ..kmer import KMER_COUNT
from .engine import (
    INT32_MAX,
    _extend,
    _fm_bin,
    _jnp,
    _match_probs,
    _ring_read,
    _sa_lookup,
    _shard_take,
    _tracker_add,
    _tracker_decide,
    device_index,
)


@dataclass(frozen=True)
class PoolParams:
    """Static parameters of the pooled engine."""

    B: int = 256  # read slots
    S: int = 98304  # path pool slots (whole batch)
    SC: int = 131072  # candidate pool slots per event
    FS: int = 256  # full-range sources kept per read per event
    RE: int = 1024  # seed-group entries per event (whole batch)
    RT: int = 6144  # expanded seed rows per event (whole batch)
    # seed rows per read per event ([B, R] tracker feed): the honest
    # 1024-read bench measured per-read demand p99=364 max=784, and R
    # was the ONLY eject cause left (eject_why bit 16: 9/1024 reads,
    # whose wide-tier reruns burned 23% of bench wall).  With the
    # VMEM tracker kernel a wide R costs only the [B, R] row-feed pack
    # (~+0.4 ms/event at R=1024) — far cheaper than the reruns.
    R: int = 1024
    # seed-cluster table capacity per read.  Sized ABOVE the highest
    # cluster count observed through the reference-budget oracle on
    # honest reads (max 1716, p99 1563): a CL eviction ejects the read
    # to the wide tier, and those ejected repeat-heavy reads are
    # exactly the long-running ones — a near-empty wide batch then
    # costs far more wall than the ~2x tracker-traffic of the wider
    # table costs everyone (measured: 10-16 ejects burned ~300-700 s
    # of an 800 s bench at CL=1024).
    CL: int = 2048
    PC: int = 10000  # per-read path budget (the reference's max_paths)
    # mapper / tracker params (identical to EngineParams)
    seed_len: int = 22
    min_rep_len: int = 0
    max_rep_copy: int = 50
    max_consec_stay: int = 8
    max_stay_frac: float = 0.5
    min_seed_prob: float = -3.75
    min_aln_len: int = 25
    min_mean_conf: float = 6.0
    min_top_conf: float = 1.85
    exact_probs: bool = True
    # candidate-sort implementation: "flat" = [1, SC] lax.sort;
    # "bitonic" = hybrid row-parallel bitonic merge (_sort1d_bitonic)
    sort_mode: str = "flat"
    mxu: bool = False
    # seed tracker as the VMEM-resident Pallas kernel (TPU default):
    # bit-identical to the while_loop fold (tests/test_tracker_kernel.py)
    tracker_kernel: bool = False
    # pooled-step stage kernels (ops/stepkern.py; TPU default) —
    # bit-exact to the XLA stages they replace (tests/test_stepkern.py)
    stepkern: bool = False
    stepkern_interpret: bool = False  # CPU tests: pallas interpret mode
    # bitonic merge levels as VMEM Pallas kernels (ops/sortkern.py; TPU
    # default): one call per merge level runs all stride>=C XOR passes
    # on the VMEM-resident chunk — bit-exact (tests/test_sortkern.py)
    sortkern: bool = False
    # in-scan slot handoff: a slot whose read decides mid-block latches
    # its result (lt_* fields) and immediately restarts on a host-armed
    # STANDBY read's event stream, recovering the ~T/2 mid-block +
    # ~T pipeline slot-events every read turnover wastes (measured 61%
    # rung0 slot utilization, BENCH r5).  Byte-parity-preserving: the
    # in-step reset is exactly reset_pool_rows' recipe.  See
    # batch.py's standby protocol for the host side.
    handoff: bool = False
    sampled_sa: bool = False
    sa_intv: int = 32

    @staticmethod
    def from_conf(conf: Conf, **over) -> "PoolParams":
        mp, st, en = conf.mapper, conf.seed_tracker, conf.engine
        kw = dict(
            B=en.batch_reads,
            handoff=getattr(en, "slot_handoff", False),
            PC=mp.max_paths,
            seed_len=mp.seed_len,
            min_rep_len=mp.min_rep_len,
            max_rep_copy=mp.max_rep_copy,
            max_consec_stay=mp.max_consec_stay,
            max_stay_frac=mp.max_stay_frac,
            min_seed_prob=mp.min_seed_prob,
            min_aln_len=st.min_aln_len,
            min_mean_conf=st.min_mean_conf,
            min_top_conf=st.min_top_conf,
        )
        kw.update(over)
        if "S" not in over:
            kw["S"] = max(4096, kw["B"] * en.pool_slots_per_read)
        if "SC" not in over:
            kw["SC"] = kw["S"] + kw["S"] // 4
        # RE/RT are BATCH-total per-event row budgets: scale with B
        # (fixed defaults mass-ejected every read at B=512 — the batch
        # aggregate spills even though per-read demand is unchanged)
        if "RE" not in over:
            kw["RE"] = max(1024, 4 * kw["B"])
        if "RT" not in over:
            kw["RT"] = max(6144, 24 * kw["B"])
        return PoolParams(**kw)


# readout fields a slot handoff latches for the finished read (all of
# MapEngine.READOUT_KEYS except the live lifecycle flag "done")
LATCH_KEYS = (
    "success", "dec_evt", "evt_i", "ovf", "ovf_why",
    "dm_flags", "dm_valid", "dm_paths", "dm_rows", "dm_cl",
    "mm_len", "mm_ref_st", "mm_r1", "mm_r2e", "mm_evt_st", "mm_evt_en",
)

# per-read fields the in-scan switch resets for the standby read —
# exactly reset_pool_rows' recipe (fresh per-read scalars/tables,
# n_paths kept: the read still owns its emptied slots)
_SWITCH_RESET = (
    "cl_valid", "cl_count", "cl_ref_st", "cl_r1", "cl_r2e", "cl_evt_st",
    "cl_evt_en", "cl_total", "len_sum", "n_cl", "mm_len", "mm_ref_st",
    "mm_r1", "mm_r2e", "mm_evt_st", "mm_evt_en", "evt_i", "success",
    "dec_evt", "ovf", "ovf_why", "dm_flags", "dm_valid", "dm_paths",
    "dm_rows", "dm_cl",
)


def make_pool_state(p: PoolParams):
    """Fresh pooled state: empty pool, B empty read slots."""
    jnp = _jnp()
    i32, f32 = jnp.int32, jnp.float32
    B, S, CL = p.B, p.S, p.CL
    z = lambda *s: jnp.zeros(s, i32)
    return {
        # flat path pool (rid == B marks a dead slot; sorted by rid)
        "q_rid": jnp.full((S,), B, i32),
        "q_start": z(S),
        "q_end": z(S),
        "q_kmer": z(S),
        "q_total": z(S),
        "q_consec": z(S),
        "q_moves": z(S),
        "q_sa": jnp.zeros((S,), bool),
        "q_cum": jnp.zeros((S, p.seed_len + 1), f32),
        # per-read pool occupancy (slots OWNED, including empty ones)
        "n_paths": z(B),
        # seed-cluster tracker + decision state: identical to engine.py
        "cl_valid": jnp.zeros((B, CL), bool),
        "cl_count": jnp.zeros((B, CL), bool),
        "cl_ref_st": z(B, CL),
        "cl_r1": z(B, CL),
        "cl_r2e": z(B, CL),
        "cl_evt_st": z(B, CL),
        "cl_evt_en": z(B, CL),
        "cl_total": z(B, CL),
        "len_sum": jnp.zeros((B,), f32),
        "n_cl": z(B),
        "mm_len": z(B),
        "mm_ref_st": z(B),
        "mm_r1": z(B),
        "mm_r2e": z(B),
        "mm_evt_st": z(B),
        "mm_evt_en": z(B),
        "evt_i": z(B),
        "done": jnp.ones((B,), bool),
        "success": jnp.zeros((B,), bool),
        "dec_evt": z(B),
        # pool-exhaustion overflow (physical cuts only; the per-read
        # budget is the reference's).  Bits: 2=candidate pool, 4=full-
        # source cap, 8=path pool, 16=seed-row caps, 1=CL evict.
        "ovf": jnp.zeros((B,), bool),
        "ovf_why": z(B),
        "dm_flags": z(B),
        "dm_valid": z(B),
        "dm_paths": z(B),
        "dm_rows": z(B),
        "dm_cl": z(B),  # sticky max live clusters (see engine.py)
        # POOL-GLOBAL demand high-water (uncut WANT totals), the sizing
        # evidence for S/SC/RE/RT: [flags(vs SC), valid, keep(vs S),
        # entries(vs RE), rows(vs RT)].  Per-read dm_* maxima cannot
        # size the shared pools (transient per-read peaks amortize).
        "dm_pool": z(5),
        # slot-handoff latch (PoolParams.handoff): sw marks a slot that
        # switched to its standby read mid-scan; lt_* hold the finished
        # read's readout fields until the host harvests + promotes.
        "sw": jnp.zeros((B,), bool),
        **{"lt_" + k: (jnp.zeros((B,), bool) if k in ("success", "ovf")
                       else z(B))
           for k in LATCH_KEYS},
    }


def reset_pool_rows(state, mask):
    """Reset read slots where mask[B]: per-read scalars/tables go fresh;
    the read's pool slots are emptied in place (q_total=0; the next
    event's assembly drops them)."""
    jnp = _jnp()
    B = state["done"].shape[0]
    fresh = None
    out = {}
    for k, v in state.items():
        if k == "dm_pool":  # pool-global, survives per-read resets
            out[k] = v
            continue
        if k.startswith("q_"):
            rid = jnp.minimum(state["q_rid"], B - 1)
            hit = mask[rid] & (state["q_rid"] < B)
            if k == "q_total":
                out[k] = jnp.where(hit, 0, v)
            else:
                out[k] = v
            continue
        if fresh is None:
            fresh = make_pool_state(
                PoolParams(
                    B=B,
                    S=state["q_rid"].shape[0],
                    CL=state["cl_valid"].shape[1],
                    seed_len=state["q_cum"].shape[1] - 1,
                )
            )
        m = mask
        while m.ndim < v.ndim:
            m = m[..., None]
        if k == "n_paths":
            out[k] = v  # reset reads still OWN their (emptied) slots
        elif k == "done":
            out[k] = jnp.where(mask, False, v)
        else:
            out[k] = jnp.where(m, fresh[k], v)
    return out


# ---------------------------------------------------------------------------
# flat-array helpers
# ---------------------------------------------------------------------------

# DEV-ONLY knockout profiling: UNCALLED_POOL_KNOCKOUT=sort,tracker,...
# stubs the named stage with a shape-identical no-op so a loop-carried
# timing run attributes step cost per stage.  Breaks mapping semantics —
# never set outside profiling runs.  Stages: sort, tracker, compact,
# occ, pairc, gathers (all _flat_take/_flat_pack), probs.
_KNOCKOUT = frozenset(
    os.environ.get("UNCALLED_POOL_KNOCKOUT", "").split(",")
) - {""}


def _sort1d(keys, payloads=(), num_keys=None):
    """lax.sort over flat arrays (shaped [1, N] for the TPU lowering)."""
    import jax

    ops = tuple(k[None, :] for k in (*keys, *payloads))
    res = jax.lax.sort(ops, dimension=1, num_keys=num_keys or len(keys))
    return tuple(r[0] for r in res)


def _f32_sort_key(x):
    """i32 key reproducing lax.sort's f32 comparator exactly: monotone
    sign-magnitude flip, with +/-0 EQUAL (key 0) and every NaN EQUAL and
    LARGEST (key INT32_MAX) — measured lax.sort order:
    -inf < finite (-0 == +0) < +inf < nan (any sign/payload)."""
    import jax

    jnp = _jnp()
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    mono = i ^ jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(i, np.int32(31)), np.int32(1)
    )
    return jnp.where(
        jnp.isnan(x), np.int32(INT32_MAX),
        jnp.where(x == 0, np.int32(0), mono),
    )


def _f32_from_sort_key(k):
    """Inverse of the monotone part of :func:`_f32_sort_key` (NaN keys
    recover as a canonical NaN, the zero key as +0.0 — downstream use is
    value comparisons only, for which these are equivalent)."""
    import jax

    jnp = _jnp()
    mono = k ^ jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(k, np.int32(31)), np.int32(1)
    )
    return jax.lax.bitcast_convert_type(mono, jnp.float32)


def _sort1d_bitonic(keys, kernel=False, kernel_interpret=False):
    """Flat ascending sort of i32 key tuples via hybrid bitonic merge.

    A [1, N] lax.sort has no row parallelism on TPU; this sorts [G, C]
    rows with row-parallel lax.sort, then runs the standard XOR-pairing
    bitonic network with STATIC-stride compare-exchange passes at
    strides >= C; once a level's remaining work is C-sized bitonic
    blocks, one row-parallel lax.sort finishes the level.  Block sort
    DIRECTIONS follow the classic (i & k) rule — descending rows sort
    via the bitwise-NOT trick — so no reversed views are ever
    materialized (XLA `rev` measured ~20x bandwidth cost: the reversing
    flip-merge formulation burned ~1 ms/event at the bench shape).
    All keys participate in the comparator (append an iota key for
    stability), so the result equals lax.sort(num_keys=all) exactly.
    """
    import jax

    jnp = _jnp()
    i32 = jnp.int32
    N = keys[0].shape[0]
    # finisher row width (per level below when the kernel is on): the
    # merge kernel absorbs every stride >= C as near-free VMEM passes
    # (strides >= 128 are sublane-expressible), so finishers shrink to
    # width-128 lax.sorts (network depth ~ log^2 W: 92 us at W=1024 vs
    # ~45 at 128).  Only for levels whose chunk block stays small: at
    # k_lv=131072 the extra unrolled passes of C=128 ran the Mosaic AOT
    # compiler out of its 16 MB scoped-vmem stack (17.63M needed), so
    # big levels keep the proven C=1024 shape.
    C = 1024
    C0 = 8192  # initial sorted-run length
    NP = 1 << max(int(np.ceil(np.log2(max(N, C0)))), 0)
    MAXV = np.int32(INT32_MAX)

    def lt(a, b):
        """Lexicographic a < b over key tuples."""
        out = None
        eq = None
        for x, y in zip(a, b):
            l_ = x < y
            if out is None:
                out, eq = l_, x == y
            else:
                out = out | (eq & l_)
                eq = eq & (x == y)
        return out

    ks = [jnp.pad(k, (0, NP - N), constant_values=MAXV) for k in keys]

    def rowsort(arrs, width, k_level):
        """Row-parallel sort; row r descends iff (r*width & k_level) —
        the classic bitonic direction rule (at the final level
        k_level == NP every start has the bit clear: all ascending)."""
        G = NP // width
        desc = (
            (jnp.arange(G, dtype=i32) * np.int32(width)) & np.int32(k_level)
        ) != 0
        desc = desc[:, None]
        ops = tuple(
            jnp.where(desc, ~a.reshape(G, width), a.reshape(G, width))
            for a in arrs
        )
        res = jax.lax.sort(ops, dimension=1, num_keys=len(ops))
        return [jnp.where(desc, ~r, r).reshape(NP) for r in res]

    # initial runs of C0, alternating direction (level k = C0)
    W0 = min(C0, NP)
    ks = rowsort(ks, W0, W0 if W0 < NP else NP)
    k_lv = 2 * W0
    while k_lv <= NP:
        s = k_lv // 2
        C = 1024
        if kernel:
            C = 128 if k_lv <= 32768 else 1024
        if kernel and s >= C:
            # all of this level's XOR passes in one VMEM kernel call
            from ..ops.sortkern import merge_level

            ks = list(
                merge_level(tuple(ks), k_lv, C, interpret=kernel_interpret)
            )
            s = C // 2  # level handled; skip the XLA pass loop
        while s >= C:
            # XOR pass: partner of i is i^s; within the [NP/(2s), 2, s]
            # reshape the a/b halves pair elementwise, and the block
            # direction (i & k_lv) is constant per a-row
            G = NP // (2 * s)
            up = (
                (jnp.arange(G, dtype=i32) * np.int32(2 * s))
                & np.int32(k_lv)
            ) == 0
            up = up[:, None]
            v = [k.reshape(G, 2, s) for k in ks]
            a = [x[:, 0, :] for x in v]
            b = [x[:, 1, :] for x in v]
            swap = jnp.where(up, lt(b, a), lt(a, b))
            ks = [
                jnp.stack(
                    [jnp.where(swap, bb, aa), jnp.where(swap, aa, bb)],
                    axis=1,
                ).reshape(NP)
                for aa, bb in zip(a, b)
            ]
            s //= 2
        ks = rowsort(ks, min(C, NP), k_lv)
        k_lv *= 2
    return tuple(k[:N] for k in ks)


def _seg_running_max(seg_id, vals):
    """Running max within contiguous segments: out[i] = max(vals[j] for
    j <= i with seg_id[j] == seg_id[i]).

    Two-level decomposition — row-parallel inner scans on a [R0, C]
    reshape plus a tiny cross-row carry scan — because a flat [1, N]
    associative_scan has no row parallelism on TPU (like flat sorts;
    measured 0.61 ms/event at N=122880 vs ~0.15 for the rows version).
    Exact (i32 max is associative)."""
    import jax

    jnp = _jnp()
    i32 = jnp.int32
    N = seg_id.shape[0]

    def _segmax(a, b):
        sa_, ma = a
        sb, mb = b
        return sb, jnp.where(sa_ == sb, jnp.maximum(ma, mb), mb)

    C = next(
        (c for c in (2048, 1536, 1280, 1024, 512)
         if N % c == 0 and N // c >= 8),
        0,
    )
    if not C:
        _, out = jax.lax.associative_scan(
            _segmax, (seg_id[None], vals[None]), axis=1
        )
        return out[0]
    R0 = N // C
    sv = seg_id.reshape(R0, C)
    mv = vals.reshape(R0, C)
    _, row_run = jax.lax.associative_scan(_segmax, (sv, mv), axis=1)
    last_seg = sv[:, -1]
    _, carry = jax.lax.associative_scan(
        _segmax, (last_seg[None], row_run[:, -1][None]), axis=1
    )
    NEGI = np.int32(-(2**31))
    in_seg = jnp.concatenate([jnp.full((1,), -1, i32), last_seg[:-1]])
    in_max = jnp.concatenate([jnp.full((1,), NEGI, i32), carry[0][:-1]])
    out = jnp.where(
        sv == in_seg[:, None],
        jnp.maximum(row_run, in_max[:, None]),
        row_run,
    )
    return out.reshape(N)


def _flat_take(tbl, idx, mxu, kn=None):
    """Flat shared-table gather.  With ``mxu`` the two-level MXU kernel
    serves it WHEN PROFITABLE (4-plane MAC cost vs XLA's ~10.5 ns/idx:
    flat_gather.profitable); bit-exact either way.  ``kn`` names the
    call site for knockout profiling (UNCALLED_POOL_KNOCKOUT)."""
    import jax

    jnp = _jnp()
    if "gathers" in _KNOCKOUT or (kn is not None and kn in _KNOCKOUT):
        return jnp.broadcast_to(tbl[0], idx.shape + tbl.shape[1:])
    from ..ops.flat_gather import flat_gather

    # force=False still routes through flat_gather: its XLA path carries
    # the 1D->rows lane trick (1D gathers run ~7 ns/idx on TPU even from
    # VMEM; 2D row gathers ~1.5-4.5 ns/idx)
    with jax.named_scope(kn or "gtk"):
        return flat_gather(tbl, idx, force=None if mxu else False)


def _flat_pack(fields, idx, mxu, kn=None):
    """Gather many same-length flat fields with ONE row gather (f32/bool
    fields bitcast to i32, unpacked on return) — the flat-table analog of
    engine._pack_gather.  ``kn`` names the call site for knockout
    profiling."""
    import jax

    jnp = _jnp()
    i32 = jnp.int32
    if "gathers" in _KNOCKOUT or (kn is not None and kn in _KNOCKOUT):
        return [jnp.broadcast_to(f[0], idx.shape) for f in fields]
    cols, kinds = [], []
    for f in fields:
        if f.dtype == jnp.float32:
            cols.append(jax.lax.bitcast_convert_type(f, i32))
            kinds.append("f32")
        elif f.dtype == jnp.bool_:
            cols.append(f.astype(i32))
            kinds.append("bool")
        else:
            cols.append(f.astype(i32))
            kinds.append("i32")
    from ..ops.flat_gather import flat_gather_fields

    with jax.named_scope(kn or "gpk"):
        packed = jnp.stack(cols, axis=1)  # [N, F]
        gcols = flat_gather_fields(packed, idx, force=None if mxu else False)
    out = []
    for k, kind in enumerate(kinds):
        v = gcols[k]
        if kind == "f32":
            v = jax.lax.bitcast_convert_type(v, jnp.float32)
        elif kind == "bool":
            v = v.astype(bool)
        out.append(v)
    return out


def _bucket_of(starts, w_out):
    """For sorted segment-start positions ``starts`` [G], the segment id
    of each output slot j in [0, w_out): r[j] = (# starts <= j) - 1.

    A histogram scatter (G elements, tiny) + one cumsum replaces the
    [w_out, G] broadcast compare-sum — the broadcast was O(w_out * G)
    VPU work (47M ops at the assembly shapes) for what is a monotone
    step function."""
    import jax

    jnp = _jnp()
    i32 = jnp.int32
    sidx = jnp.where(starts < w_out, starts, np.int32(w_out))
    hist = jnp.zeros((w_out + 1,), i32).at[sidx].add(np.int32(1))
    return jnp.cumsum(hist[:w_out], dtype=i32) - 1


def _seg_broadcast(fields, starts, w_out):
    """Broadcast per-segment values onto contiguous ranges:
    out_f[j] = f[max {g : starts[g] <= j}] for each field f [G]
    (``starts`` sorted, starts[0] == 0; an extra trailing entry is
    ignored so [B+1] offset vectors can be passed whole).

    Replaces a ``_flat_pack(fields, owner)`` row gather: even from a
    tiny VMEM table, a [w_out]-index gather costs ~1.5 ns/idx plus a
    full layout copy (measured 150+36 us per pack at S=98304 — trace
    r5); telescoping per-read DIFFS scattered at the segment starts and
    re-accumulated with one exact i32 cumsum costs ~10 us.  Duplicate
    starts (empty segments) telescope correctly: their diffs stack at
    the same position and the later read wins, which is exactly the
    max-b owner.  Slots past off[-1] get fields[.][B-1], matching the
    gather-at-min(rid, B-1) convention for dead tail slots.  i32/bool
    fields only (cumsum must be exact)."""
    jnp = _jnp()
    i32 = jnp.int32
    if starts.shape[0] == fields[0].shape[0] + 1:
        starts = starts[:-1]
    offc = jnp.minimum(starts, np.int32(w_out))  # [G] segment starts
    out = []
    for f in fields:
        kind = "bool" if f.dtype == jnp.bool_ else None
        fi = f.astype(i32)
        diff = jnp.concatenate([fi[:1], fi[1:] - fi[:-1]])
        acc = jnp.zeros((w_out,), i32).at[offc].add(
            diff, mode="drop", indices_are_sorted=True,
        )
        v = jnp.cumsum(acc, dtype=i32)
        out.append(v.astype(bool) if kind else v)
    return out


class _CompactMap:
    """Lazy stable-compaction map over a flat validity mask.

    ``at(q)`` returns, for each query position j in ``q``, the source
    index of the j-th True element (clamped).  Build cost is one
    row-parallel [G, C] sort; each query batch costs two gathers sized
    by the QUERY, so callers that only read a few positions (the
    assembly classes read S of a 2*SC-slot map) never pay for a full
    materialization."""

    def __init__(self, valid):
        import jax

        jnp = _jnp()
        i32 = jnp.int32
        self._N = N = valid.shape[0]
        C = self._C = 1280
        G = self._G = _cdiv_int(N, C)
        Np = G * C
        v2 = jnp.pad(valid, (0, Np - N)).reshape(G, C)
        in_row = jax.lax.broadcasted_iota(i32, (G, C), 1)
        # per-chunk compaction order (invalid -> C, sorted to the tail)
        self._skey = jax.lax.sort(
            jnp.where(v2, in_row, np.int32(C)), dimension=1
        ).reshape(Np)
        cnt = jnp.sum(v2, axis=1, dtype=i32)  # [G]
        self._start = jnp.cumsum(cnt, dtype=i32) - cnt
        self.total = self._start[-1] + cnt[-1]

    def at(self, q, mxu, kn=None):
        import jax

        jnp = _jnp()
        i32 = jnp.int32
        C, G, N = self._C, self._G, self._N
        if "compact" in _KNOCKOUT:
            return jnp.clip(q, np.int32(0), np.int32(N - 1))
        # chunk of the q-th True: last g with start[g] <= q.  The starts
        # are only [G~288] wide, so a fused broadcast compare-sum
        # (searchsorted as a rank count, ~Q*G VPU ops) beats the
        # domain-wide [N] step-function table + gather it replaces: the
        # table gather ran 150 us when the allocator kept the table in
        # VMEM and 830 us when it fell to HBM (trace r5) — the
        # compare-sum is layout-insensitive and builds nothing.
        qc = jnp.clip(q, np.int32(0), np.int32(N - 1))
        r = jnp.clip(
            jnp.sum(
                self._start[None, :] <= qc[:, None], axis=1,
                dtype=i32,
            ) - 1,
            np.int32(0), np.int32(G - 1),
        )
        q = qc
        within = q - _flat_take(self._start, r, True, kn=kn)
        src_in_row = _flat_take(
            self._skey,
            r * np.int32(C) + jnp.clip(within, np.int32(0), np.int32(C - 1)),
            mxu, kn=kn,
        )
        src = r * np.int32(C) + jnp.minimum(src_in_row, np.int32(C - 1))
        return jnp.minimum(src, np.int32(N - 1))


def _compact1d(valid, w_out):
    """Stable flat compaction indices: src[j] = index of the j-th True.

    Two-level: a [1, N] lax.sort has no row parallelism on TPU (only the
    lane dimension vectorizes, and the bitonic depth grows log^2 N), so
    compact [G, C] row chunks with a row-parallel 2D sort, then place
    each row's run at its global offset (step-function bucket + one
    gather)."""
    import jax

    jnp = _jnp()
    i32 = jnp.int32
    N = valid.shape[0]
    if "compact" in _KNOCKOUT:
        j = jax.lax.iota(i32, w_out)
        return jnp.minimum(j, np.int32(N - 1)), j < np.int32(N)
    m = _CompactMap(valid)
    C, G = m._C, m._G
    j = jax.lax.iota(i32, w_out)
    # row of output slot j: last g with start[g] <= j (rows are
    # disjoint).  Both r and start[r] are step functions of j, so the
    # telescoping broadcast replaces the bucket table AND the start
    # gather (the latter measured 190 us at w_out=SC — trace r5).
    r, start_r = _seg_broadcast(
        [jax.lax.iota(i32, G), m._start], m._start, w_out
    )
    r = jnp.clip(r, np.int32(0), np.int32(G - 1))
    within = j - start_r
    src_in_row = _flat_take(
        m._skey, r * np.int32(C) + jnp.minimum(within, np.int32(C - 1)),
        True,
    )
    src = r * np.int32(C) + jnp.minimum(src_in_row, np.int32(C - 1))
    ok = j < m.total
    return jnp.minimum(src, np.int32(N - 1)), ok


def _cdiv_int(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# the pooled event step
# ---------------------------------------------------------------------------


def _pool_event_step(idx, p: PoolParams, st, ev, ev_on, sb=None):
    import jax

    jnp = _jnp()
    i32, f32 = jnp.int32, jnp.float32
    B, S, SC, SL = p.B, p.S, p.SC, p.seed_len
    KMASK = KMER_COUNT - 1
    PATH_MASK = (1 << SL) - 1
    TAIL_MOVE = 1 << (SL - 1)
    RING = SL + 1
    RINGi = np.int32(RING)
    PC = p.PC
    n = idx["n"]

    swm = None
    if p.handoff and sb is not None:
        # ---- in-scan slot handoff (PoolParams.handoff) ---------------
        # A done slot with an armed standby latches its readout fields
        # and restarts AS the standby read this very event: per-read
        # state resets exactly like reset_pool_rows (n_paths kept, the
        # read's pool rows emptied via q_total below), and the event
        # source flips to the 0-based standby stream indexed by the
        # post-reset evt_i.  The host's standby window covers [0, 2T)
        # — a switched read consumes at most 2T events before the host
        # learns of the switch (one block of pipelining) and promotes
        # it to the primary lane (batch.py standby protocol).
        sb_m, sb_o, sb_armed = sb
        W = sb_m.shape[1]
        swm = st["done"] & sb_armed & (~st["sw"])
        use_sb = st["sw"] | swm
        rel = jnp.where(swm, np.int32(0),
                        jnp.clip(st["evt_i"], np.int32(0), np.int32(W - 1)))
        sb_ev = jnp.take_along_axis(sb_m, rel[:, None], axis=1)[:, 0]
        sb_ok = (
            jnp.take_along_axis(sb_o, rel[:, None], axis=1)[:, 0]
            & (jnp.where(swm, np.int32(0), st["evt_i"]) < np.int32(W))
        )
        ev = jnp.where(use_sb, sb_ev, ev)
        ev_on = jnp.where(use_sb, sb_ok, ev_on)
        st = dict(st)
        for k in LATCH_KEYS:
            st["lt_" + k] = jnp.where(swm, st[k], st["lt_" + k])
        st["sw"] = use_sb
        for k in _SWITCH_RESET:
            v = st[k]
            m = swm
            while m.ndim < v.ndim:
                m = m[..., None]
            st[k] = jnp.where(m, jnp.zeros((), v.dtype), v)
        st["done"] = st["done"] & (~swm)

    alive = (~st["done"]) & ev_on  # [B]
    if "probs" in _KNOCKOUT:
        probs = jnp.zeros((B, KMER_COUNT), f32) + ev[:, None]
    else:
        probs = _match_probs(idx, ev, p.exact_probs)  # [B, 1024] f32

    rid = st["q_rid"]  # [S], B = dead
    ridc = jnp.minimum(rid, np.int32(B - 1))
    owned = rid < B

    # per-read segment boundaries in SLOT space (reads own contiguous
    # segments by the assembly invariant)
    off = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(st["n_paths"], dtype=i32)]
    )  # [B+1]
    if swm is not None:
        # empty the switching reads' pool rows in place (q_total=0 kills
        # their flags/carry; the assembly drops them) — the
        # reset_pool_rows recipe, in-scan
        (sw_slot,) = _seg_broadcast([swm], off, S)
        st["q_total"] = jnp.where(sw_slot & owned, np.int32(0),
                                  st["q_total"])
    # one slot-space broadcast serves all step-start read scalars
    # (telescoping diff+cumsum: ~20x cheaper than the row gather at S
    # indices, see _seg_broadcast)
    al_slot, run_slot = _seg_broadcast(
        [alive, alive | st["done"]], off, S
    )
    slot_alive = owned & al_slot & (st["q_total"] > 0)

    # ---- candidate flags in creation order -------------------------------
    pv = slot_alive
    fmlen = st["q_end"] - st["q_start"] + 1
    # stay + move probs are both 4-wide rows of the SAME [B*256, 4]
    # reshape of probs (no materialized 5-lane table, which the device
    # trace showed living in HBM at ~10 ns/idx): stay prob probs[b, k]
    # sits at row b*256 + (k>>2) lane k&3; the 4 move probs
    # probs[b, ((k<<2)&1023)|0..3] ARE row b*256 + (k&255).
    KQ = KMER_COUNT // 4
    p4 = probs.reshape(B * KQ, 4)
    lane = lambda g4, j: jnp.sum(
        jnp.where(
            jax.lax.broadcasted_iota(i32, g4.shape, 1) == j[:, None],
            g4, f32(0),
        ),
        axis=1,
    )
    ridq = ridc * np.int32(KQ)
    stay_p = lane(
        _flat_take(p4, ridq + (st["q_kmer"] >> 2), p.mxu, kn="gprob"),
        st["q_kmer"] & 3,
    )
    mv_p = _flat_take(
        p4, ridq + (st["q_kmer"] & np.int32(KQ - 1)), p.mxu, kn="gprob"
    )  # [S, 4]
    # fm-bin thresholds: the [NT/4, 4] table is index-static and shared
    # by every read, so the gather needs no read dimension
    fm_bin = _fm_bin(fmlen)
    NT = idx["threshes"].shape[0]
    NT4 = NT // 4
    gt = _flat_take(idx["threshes"].reshape(NT4, 4), fm_bin >> 2, p.mxu,
                    kn="gprob")
    thresh = lane(gt, fm_bin & 3)
    stay_f = pv & (st["q_consec"] < p.max_consec_stay) & (stay_p >= thresh)
    # NaN-threshold polarity parity (mapper.cpp:471,489)
    mv_f = pv[:, None] & ~(mv_p < thresh[:, None])

    flags = jnp.concatenate([stay_f[:, None], mv_f], axis=1)  # [S, 5]

    # ---- compact to the candidate pool (global, order-preserving) --------
    flat = flags.reshape(5 * S)
    # flag positions are only ever read at slot granularity (stay is flag
    # 0 of its slot), so a [S] cumsum of per-slot counts replaces the
    # [5S] flag-space cumsum
    cflags = jnp.sum(flags, axis=1, dtype=i32)  # [S]
    pstart = jnp.cumsum(cflags, dtype=i32) - cflags  # excl. flag pos of slot
    total_flags = pstart[-1] + cflags[-1]
    pstart_pad = jnp.concatenate([pstart, total_flags[None]])
    cb = _flat_take(pstart_pad, off, False)  # cand-space read starts [B+1]
    n_flags_r = cb[1:] - cb[:-1]  # [B]

    cidx, cval = _compact1d(flat, SC)  # cidx = flat code of the j-th flag
    cpar = jnp.where(cval, jax.lax.div(cidx, np.int32(5)), np.int32(S))
    move = jnp.where(cval, jax.lax.rem(cidx, np.int32(5)), np.int32(0))
    cpar_g = jnp.minimum(cpar, np.int32(S - 1))

    # candidate-pool exhaustion: reads whose flag segment spills past SC
    cut_cand = (jnp.minimum(cb[1:], np.int32(SC)) - jnp.minimum(cb[:-1], np.int32(SC))) != n_flags_r

    # ---- parent fields + FM extension ------------------------------------
    cumnow_p = _ring_read(st["q_cum"][None], (st["q_total"] % RINGi)[None])[0]
    wslot_p = jnp.where(
        st["q_total"] + 1 >= SL, (st["q_total"] + 1 - SL) % RINGi, 0
    )
    wstart_p = _ring_read(st["q_cum"][None], wslot_p[None])[0]
    # the 5 flag probs ride in the parent pack (row-gather width is
    # ~free), so the candidate's own prob needs no second table gather:
    # stay keeps the parent k-mer's prob, move b is neighbor b's prob
    (cs, ce_, ck, ctot, ccons, cmvs, csa, ccum, cwst,
     cp_stay, cp_m0, cp_m1, cp_m2, cp_m3) = _flat_pack(
        [st["q_start"], st["q_end"], st["q_kmer"], st["q_total"],
         st["q_consec"], st["q_moves"], st["q_sa"], cumnow_p, wstart_p,
         stay_p, mv_p[:, 0], mv_p[:, 1], mv_p[:, 2], mv_p[:, 3]],
        cpar_g, p.mxu, kn="gpar",
    )
    # the parent's read id needs no gather: candidates are created in
    # slot order, so they are read-contiguous with boundaries cb
    (crid,) = _seg_broadcast([jnp.arange(B, dtype=i32)], cb, SC)
    crid = jnp.where(cval, crid, np.int32(B))
    crid_g = jnp.minimum(crid, np.int32(B - 1))

    is_mv = move >= 1
    mvbase = jnp.clip(move - 1, np.int32(0), np.int32(3))
    nk = jnp.where(is_mv, ((ck << 2) & KMASK) | mvbase, ck)
    if "occ" in _KNOCKOUT:
        ns_m, ne_m = cs, ce_
    else:
        ns_m, ne_m = _extend(idx, cs, ce_, mvbase)
    ns = jnp.where(is_mv, ns_m, cs)
    ne = jnp.where(is_mv, ne_m, ce_)
    cv_fm = cval & ((~is_mv) | (ns <= ne))

    # within-read FM-valid count -> the reference's max_paths budget
    vcum = jnp.cumsum(cv_fm, dtype=i32) - cv_fm
    vcum_pad = jnp.concatenate([vcum, (vcum[-1] + cv_fm[-1])[None]])
    cb_c = jnp.minimum(cb, np.int32(SC))
    vbase_b = _flat_take(vcum_pad, cb_c, False)  # [B+1]
    (wv_base,) = _seg_broadcast([vbase_b[:-1]], cb, SC)
    wvalid = vcum - wv_base
    cvalid = cv_fm & (wvalid < PC)
    n_valid_r = vbase_b[1:] - vbase_b[:-1]  # per-read FM-valid totals
    # read boundaries in SORTED-candidate space: the sort is keyed by
    # (rid if cvalid else B, ...), so read b's sorted segment starts at
    # the number of budget-kept valid candidates before it — NOT at the
    # flag-space boundary cb (a global sort forgives constant within-read
    # shifts; absolute position arithmetic does not).
    # NOTE vbase_b cannot merge into this take: cvalid depends on it.
    ccum2 = jnp.cumsum(cvalid, dtype=i32) - cvalid
    ccum2_pad = jnp.concatenate([ccum2, (ccum2[-1] + cvalid[-1])[None]])
    svb = _flat_take(ccum2_pad, cb_c, False)  # [B+1]
    svb_c = jnp.minimum(svb, np.int32(SC))

    prob = jnp.where(
        move == 0, cp_stay,
        jnp.where(
            move == 1, cp_m0,
            jnp.where(move == 2, cp_m1, jnp.where(move == 3, cp_m2, cp_m3)),
        ),
    )
    new_tot = ctot + 1
    newcum = ccum + prob
    seedprob = jnp.where(
        new_tot >= SL,
        (newcum - cwst) / f32(SL),
        newcum / new_tot.astype(f32),
    )
    nmoves = ((cmvs << 1) | is_mv.astype(i32)) & PATH_MASK
    nmoves = jnp.where(ctot >= SL, nmoves | TAIL_MOVE, nmoves)
    nconsec = jnp.where(is_mv, 0, ccons + 1)

    # ---- ended parents (budget-break parity, mapper.cpp:455-520) ---------
    k_i = pstart  # [S] global compacted position of each stay flag
    nxt_rid = jnp.concatenate([rid[1:], jnp.full((1,), B, i32)])
    is_last = nxt_rid != rid
    # one slot-space broadcast for the candidate-segment scalars
    seg_end_c, tot_valid_slot = _seg_broadcast([cb[1:], n_valid_r], off, S)
    wv_pad = jnp.concatenate([wvalid, jnp.zeros((1,), i32)])

    # within-read valid count at a global candidate position (clamped to
    # the read's own segment end => its valid total).  Only the k_i
    # probe needs a gather: for non-last slots k_next = k_i of the NEXT
    # slot and that slot shares the read's segment bounds, so its vb IS
    # this slot's vb_next (shift); for last-in-read slots the probe sits
    # at the segment end where inseg is False by construction, so the
    # answer is the read's valid total — no gather either way (this
    # halved the 2S-row probe gather, ~0.3 ms/event at B=256).
    v1 = _flat_take(wv_pad, jnp.minimum(k_i, np.int32(SC)), p.mxu)
    inseg1 = (k_i < seg_end_c) & (k_i < SC)
    vb = jnp.where(inseg1, v1, tot_valid_slot)
    vb_next = jnp.where(
        is_last,
        tot_valid_slot,
        jnp.concatenate([vb[1:], tot_valid_slot[-1:]]),
    )
    child_any = jnp.minimum(vb_next, np.int32(PC)) > jnp.minimum(vb, np.int32(PC))
    reached = (k_i < SC) & (vb < PC)
    pmc = jax.lax.population_count(st["q_moves"]).astype(i32)
    tot_q = st["q_total"]
    cum_now_q = cumnow_p
    wslot_q = jnp.where(tot_q >= SL, (tot_q - SL) % RINGi, 0)
    wstart_q = _ring_read(st["q_cum"][None], wslot_q[None])[0]
    pseedprob = jnp.where(
        tot_q >= SL,
        (cum_now_q - wstart_q) / f32(SL),
        cum_now_q / jnp.maximum(tot_q, 1).astype(f32),
    )
    ended = pv & (~child_any) & (~st["q_sa"]) & reached
    e_rep = (fmlen <= p.max_rep_copy) & (pmc >= p.min_rep_len)
    e_unique = (
        (fmlen == 1)
        & ((st["q_moves"] & 1) == 1)
        & ((SL - pmc) <= p.max_stay_frac * SL)
    )
    e_valid = (
        ended
        & (jnp.minimum(tot_q, SL) == SL)
        & (pseedprob >= p.min_seed_prob)
        & (e_unique | e_rep)
    )
    e_rows = jnp.where(e_valid, jnp.minimum(fmlen, p.max_rep_copy), 0)

    # ---- sort candidates by (read, fm_start, fm_end, seed_prob) ----------
    rid_key = jnp.where(cvalid, crid, np.int32(B))
    k1 = jnp.where(cvalid, ns, INT32_MAX)
    k2 = jnp.where(cvalid, ne, INT32_MAX)
    iota_c = jax.lax.iota(i32, SC)
    if "sort" in _KNOCKOUT:
        rks, k1s, k2s, k3s, perm = rid_key, k1, k2, seedprob, iota_c
    elif p.sort_mode == "bitonic":
        # final key = creation index: full (rid, start, end, prob) ties
        # keep creation order — the parity rig's pinned STABLE tie order
        # (see oracle.py map_read's sort comment); dedup keeps the run's
        # latest-created member, matching std::stable_sort byte-for-byte
        rks, k1s, k2s, k3i, perm = _sort1d_bitonic(
            (rid_key, k1, k2, _f32_sort_key(seedprob), iota_c),
            kernel=p.sortkern, kernel_interpret=p.stepkern_interpret,
        )
        k3s = _f32_from_sort_key(k3i)
    else:
        rks, k1s, k2s, k3s, perm = _sort1d(
            (rid_key, k1, k2, seedprob, iota_c), (), num_keys=5
        )
    svalid = rks < B
    ns_s, ne_s, seedprob_s = k1s, k2s, k3s
    rid_s = jnp.minimum(rks, np.int32(B - 1))
    # one pack brings EVERY candidate-space field the rest of the step
    # needs into sorted space (the assembly reads sorted-space records
    # only, so no second candidate-space gather is needed downstream)
    (nk_s, prob_s, ntot_s, nmoves_s, ncons_s, csa_s, newcum_s,
     cpar_s) = _flat_pack(
        [nk, prob, new_tot, nmoves, nconsec, csa, newcum, cpar_g],
        perm, p.mxu, kn="gsrt",
    )

    nxt1 = lambda a, fill: jnp.concatenate([a[1:], jnp.full((1,), fill, a.dtype)])
    same_next = nxt1(rks, B) == rks
    dup = (
        svalid
        & nxt1(svalid, False)
        & same_next
        & (ns_s == nxt1(ns_s, -1))
        & (ne_s == nxt1(ne_s, -1))
    )

    # candidate seed validity (non-ended branch of is_seed_valid)
    smc = jax.lax.population_count(nmoves_s).astype(i32)
    seed_c = (
        svalid
        & (~dup)
        & (ntot_s >= SL)
        & (seedprob_s >= p.min_seed_prob)
        & ((ne_s - ns_s + 1) == 1)
        & ((nmoves_s & 1) == 1)
        & ((SL - smc) <= p.max_stay_frac * SL)
    )

    # ---- seed rows: ended groups (pool order) then candidates (sorted) ---
    # compact the few row-bearing entries, expand to rows, feed the
    # [B, CL] tracker via a [B, R] table (tracker code shared with engine)
    MRC0 = p.max_rep_copy
    RE = min(p.RE, S + SC)
    RT = min(p.RT, RE * MRC0)
    R = p.R
    # two rid-contiguous streams (ended entries in pool order, candidate
    # seeds in sorted order; ended-before-candidates per read) merge by
    # position arithmetic — no flat sort
    ent_rows_all = jnp.concatenate([e_rows, seed_c.astype(i32)])
    ent_st_all = jnp.concatenate([st["q_start"], ns_s])
    ent_mc_all = jnp.concatenate([pmc, smc])
    ent_ended = jnp.concatenate(
        [jnp.ones((S,), bool), jnp.zeros((SC,), bool)]
    )
    endv = e_rows > 0
    endcum = jnp.cumsum(endv, dtype=i32) - endv
    endcum_pad = jnp.concatenate([endcum, (endcum[-1] + endv[-1])[None]])
    end_b = _flat_take(endcum_pad, jnp.minimum(off, np.int32(S)), False)
    ended_r = end_b[1:] - end_b[:-1]
    sdv = seed_c
    sdcum = jnp.cumsum(sdv, dtype=i32) - sdv
    sdcum_pad = jnp.concatenate([sdcum, (sdcum[-1] + sdv[-1])[None]])
    sd_b = _flat_take(sdcum_pad, svb_c, False)
    seeds_r = sd_b[1:] - sd_b[:-1]
    want_ent = ended_r + seeds_r
    off_ent = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(want_ent, dtype=i32)]
    )
    n_ent = off_ent[-1]
    rows_cut_global = n_ent > RE
    endc_src, _ = _compact1d(endv, RE)
    sdc_src, _ = _compact1d(sdv, RE)

    e_j = jax.lax.iota(i32, RE)
    e_b = jnp.clip(_bucket_of(off_ent[:-1], RE), np.int32(0), np.int32(B - 1))
    e_ok = e_j < jnp.minimum(n_ent, np.int32(RE))
    eb_off, eb_end, eb_endst, eb_sdst = _flat_pack(
        [off_ent[:-1], ended_r, end_b[:-1], sd_b[:-1]], e_b, p.mxu
    )
    e_r = e_j - eb_off
    e_is_end = e_r < eb_end
    src_end = _flat_take(
        endc_src, jnp.clip(eb_endst + e_r, np.int32(0), np.int32(RE - 1)),
        p.mxu,
    )
    src_sd = _flat_take(
        sdc_src,
        jnp.clip(eb_sdst + (e_r - eb_end), np.int32(0), np.int32(RE - 1)),
        p.mxu,
    )
    eperm = jnp.where(e_is_end, src_end, np.int32(S) + src_sd)
    eperm = jnp.clip(eperm, np.int32(0), np.int32(S + SC - 1))
    g_rows, g_st, g_mc, g_end = _flat_pack(
        [ent_rows_all, ent_st_all, ent_mc_all, ent_ended], eperm, p.mxu
    )
    g_rid = e_b
    g_rows = jnp.where(e_ok, g_rows, 0)

    # expand entries -> rows ([RE, MRC] grid, compact to RT)
    MRC = p.max_rep_copy
    row_val = (
        jax.lax.broadcasted_iota(i32, (RE, MRC), 1) < g_rows[:, None]
    ).reshape(RE * MRC)
    rsrc, r_ok = _compact1d(row_val, RT)
    r_ent = jax.lax.div(rsrc, np.int32(MRC))
    r_off = jax.lax.rem(rsrc, np.int32(MRC))
    rr_rid, rr_st, rr_mc, rr_end = _flat_pack(
        [g_rid, g_st, g_mc, g_end], r_ent, p.mxu
    )
    rr_rid = jnp.where(r_ok, rr_rid, np.int32(B))
    sa_row = jnp.clip(rr_st + r_off, np.int32(0), np.int32(n))
    if p.sampled_sa:
        ref_en_flat = n - _sa_lookup(idx, sa_row, p.sa_intv)
    else:
        ref_en_flat = n - _shard_take(idx, "sa", sa_row)
    rr_evti = _flat_take(st["evt_i"], jnp.minimum(rr_rid, B - 1), False)
    rr_evt = jnp.where(rr_end, rr_evti - 1, rr_evti)

    # rows -> [B, R] (rows are rid-sorted after the entry sort).  Rows
    # compact in entry order, so read b's window in the row stream is
    # the per-entry row-count cumsum read at its entry boundaries —
    # replaces a [RT, B] broadcast histogram AND attributes the RT cap:
    # a batch-aggregate spill past RT used to go unflagged when every
    # per-read count stayed under R.
    growc = jnp.cumsum(g_rows, dtype=i32)
    growc_pad = jnp.concatenate([jnp.zeros((1,), i32), growc])
    rw_b = _flat_take(
        growc_pad, jnp.minimum(off_ent, np.int32(RE)), False
    )  # [B+1] wanted-row boundaries
    want_rows_r = rw_b[1:] - rw_b[:-1]
    st_w = jnp.minimum(rw_b[:-1], np.int32(RT))
    rows_r = jnp.minimum(rw_b[1:], np.int32(RT)) - st_w  # actual rows
    rows_cut_r = (want_rows_r > R) | (rows_r != want_rows_r)
    rows_eff = jnp.where(
        alive, jnp.minimum(rows_r, np.int32(R)), np.int32(0)
    )
    use_trk_kernel = (
        p.tracker_kernel and B % 8 == 0
        and "tracker" not in _KNOCKOUT
        and "tracker_full" not in _KNOCKOUT
    )
    if not use_trk_kernel:
        # expand compact rows to [B, R] for the while_loop fold (the
        # kernel path reads the compact [RT] streams directly)
        row_ids = jnp.arange(R, dtype=i32)
        gidx = st_w[:, None] + row_ids[None, :]  # [B, R]
        row_ok2 = (row_ids[None, :] < rows_eff[:, None])
        gi = jnp.minimum(gidx, np.int32(RT - 1)).reshape(B * R)
        b_ref_en, b_mc, b_evt = _flat_pack(
            [ref_en_flat, rr_mc, rr_evt], gi, p.mxu, kn="grow"
        )
        b_ref_en = b_ref_en.reshape(B, R)
        b_mc = b_mc.reshape(B, R)
        b_evt = b_evt.reshape(B, R)

    tstate = {
        k: st[k]
        for k in (
            "cl_valid", "cl_count", "cl_ref_st", "cl_r1", "cl_r2e",
            "cl_evt_st", "cl_evt_en", "cl_total", "len_sum", "n_cl",
            "mm_len", "mm_ref_st", "mm_r1", "mm_r2e", "mm_evt_st", "mm_evt_en",
            "ovf", "ovf_why",
        )
    }
    max_rows = jnp.minimum(jnp.max(jnp.where(alive, rows_r, 0)), np.int32(R))
    if "tracker_full" in _KNOCKOUT:  # worst-case trip-count probe
        max_rows = jnp.int32(R)

    class _TP:
        min_aln_len = p.min_aln_len

    def row_body(carry):
        r, ts = carry
        ts2 = _tracker_add(
            _TP, ts, b_ref_en[:, r], b_mc[:, r], b_evt[:, r], row_ok2[:, r]
        )
        return r + 1, ts2

    if "tracker" not in _KNOCKOUT:
        if use_trk_kernel:
            # VMEM-resident Pallas kernel with per-8-read-block dynamic
            # trip counts (~55x the while_loop), reading the compact
            # [RT] row streams directly via per-read offsets — no [B, R]
            # row expansion gather (ops/tracker_kernel.py)
            from ..ops.tracker_kernel import tracker_run_compact

            tstate = tracker_run_compact(
                p.min_aln_len, tstate, ref_en_flat, rr_mc, rr_evt,
                st_w, rows_eff,
            )
        else:
            _, tstate = jax.lax.while_loop(
                lambda c: c[0] < max_rows, row_body, (jnp.int32(0), tstate)
            )

    # ---- sources (mapper.cpp:544-624) -------------------------------------
    source_prob = idx["threshes"][0]
    kpass = prob_s >= source_prob
    prev_k = jnp.concatenate([jnp.full((1,), -1, i32), nk_s[:-1]])
    prev_r = jnp.concatenate([jnp.full((1,), -1, i32), rks[:-1]])
    first_seg = svalid & ((nk_s != prev_k) | (rks != prev_r))
    seg_id = jnp.cumsum(first_seg, dtype=i32)

    run_end = _seg_running_max(seg_id, ne_s)

    km_st, km_en = _flat_pack([idx["kmer_st"], idx["kmer_en"]], nk_s, p.mxu)
    head_st = km_st
    head_en = ns_s - 1
    head_v = first_seg & kpass & (head_st <= head_en)

    nxt_same = nxt1(svalid, False) & same_next & (nxt1(nk_s, -1) == nk_s)
    gap_st = run_end + 1
    gap_en = jnp.where(nxt_same, nxt1(ns_s, 0) - 1, km_en)
    gap_v = svalid & (~dup) & kpass & (gap_st <= gap_en)

    # k-mer presence per read: an MXU one-hot pair count beats the
    # sort-based membership bitmap by ~an order of magnitude here
    from ..ops.flat_gather import pair_counts

    if "pairc" in _KNOCKOUT:
        present = jnp.zeros((B, KMER_COUNT), bool)
    else:
        # force=None: the pair-count kernel auto-routes (Pallas on TPU,
        # XLA one-hot elsewhere) INDEPENDENTLY of p.mxu — p.mxu now only
        # governs the flat-gather routing, and the XLA one-hot fallback
        # at [SC, 1024] f32 would be catastrophic on TPU
        present = (
            pair_counts(
                jnp.where(svalid, rid_s, np.int32(B)), nk_s, B, KMER_COUNT,
                force=None,
            )
            > 0
        )
    full_v = (
        (~present)
        & (probs >= source_prob)
        & (idx["kmer_st"] <= idx["kmer_en"])[None, :]
        & alive[:, None]
    )

    # ---- assemble the new pool --------------------------------------------
    # creation-order key per read (mapper.cpp keep-list):
    #   children: within-read non-dup sorted position
    #   sources:  n_cands_r + within-read source position (head/gap
    #             interleaved by candidate, then full by k-mer)
    child_keep = svalid & (~dup)
    ckcum = jnp.cumsum(child_keep, dtype=i32) - child_keep
    # n_cands per read INCLUDES dups (the reference's budget_left counts
    # all sorted candidates, mapper.cpp:544-624) = per-read cvalid count
    nc_r = jnp.minimum(vbase_b[1:] - vbase_b[:-1], np.int32(PC))

    hg_v = jnp.stack([head_v, gap_v], axis=1).reshape(2 * SC)
    hgcum = jnp.cumsum(hg_v, dtype=i32) - hg_v
    hgcum_pad = jnp.concatenate([hgcum, (hgcum[-1] + hg_v[-1])[None]])
    hg_end_b = _flat_take(hgcum_pad, svb_c * 2, False)  # [B+1]
    n_hg_r = hg_end_b[1:] - hg_end_b[:-1]

    # full sources: per-read 2D compaction to FS slots (kmer order kept)
    FS = p.FS
    iota_k = jax.lax.broadcasted_iota(i32, (B, KMER_COUNT), 1)
    fkey = jnp.where(full_v, iota_k, np.int32(KMER_COUNT))
    fkey_s = jax.lax.sort(fkey, dimension=1)[:, :FS]
    f_kmer = jnp.minimum(fkey_s, np.int32(KMER_COUNT - 1))
    n_full_r = jnp.sum(full_v.astype(i32), axis=1, dtype=i32)
    cut_full = n_full_r > FS

    # carried slots: owned reads that are NOT advancing this step (block
    # padding: on[b, t] false but more events coming) keep their paths
    # unchanged; done reads' paths are dropped (decision already made)
    carried = owned & (~run_slot) & (st["q_total"] > 0)

    # merge the four classes WITHOUT a global sort: every stream is
    # already rid-contiguous and within-read ordered, and the per-read
    # creation-order ranges are disjoint (children < head/gap < full;
    # carried reads have no new entries), so each output slot's source
    # is pure position arithmetic on per-read stream counts.
    # read boundaries in SORTED-candidate space: the sort is keyed by
    # (rid if cvalid else B, ...), so read b's sorted segment starts at
    # the number of budget-kept valid candidates before it — NOT at the
    # flag-space boundary cb (the old global sort forgave any constant
    # within-read shift; absolute position arithmetic does not)
    ckcum_pad = jnp.concatenate([ckcum, (ckcum[-1] + child_keep[-1])[None]])
    nd_b = _flat_take(ckcum_pad, svb_c, False)  # [B+1] nondup boundaries
    nondup_r = nd_b[1:] - nd_b[:-1]
    # the reference's budget_left counts CREATED sources (mapper.cpp:
    # 544-624), so the per-read keeps chain: hg first, then full
    hgk_r = jnp.minimum(n_hg_r, jnp.maximum(PC - nc_r, 0))
    fk_r = jnp.minimum(
        jnp.minimum(n_full_r, np.int32(FS)),
        jnp.maximum(PC - nc_r - hgk_r, 0),
    )
    # carried slots live inside their owner's contiguous segment, so the
    # per-read count is a cumsum read at the segment boundaries (the
    # [S, B] broadcast histogram this replaces was ~25M VPU ops)
    ccar = jnp.cumsum(carried, dtype=i32)
    ccar_pad = jnp.concatenate([jnp.zeros((1,), i32), ccar])
    car_b = _flat_take(ccar_pad, off, False)  # [B+1]
    carried_r = car_b[1:] - car_b[:-1]
    want_r = nondup_r + hgk_r + fk_r + carried_r
    off_new = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(want_r, dtype=i32)]
    )
    total_keep = off_new[-1]
    kept_r = jnp.minimum(
        want_r, jnp.clip(np.int32(S) - off_new[:-1], np.int32(0), want_r)
    )
    cut_pool_r = kept_r != want_r

    # ONE compaction map over the concatenated (child_keep ++ hg) masks:
    # its source space IS the unified record table's A+H region (A
    # sources at [0, SC), H at [SC, 3SC)), and a class-H query is just
    # offset by the global child-keep total — halves the per-slot
    # at()-query gathers vs two separate maps
    ah_map = _CompactMap(jnp.concatenate([child_keep, hg_v]))

    j_out = jax.lax.iota(i32, S)
    bj = jnp.clip(_bucket_of(off_new[:-1], S), np.int32(0), np.int32(B - 1))
    keep = j_out < jnp.minimum(total_keep, np.int32(S))
    # per-slot read scalars broadcast onto the off_new segments
    g_off, g_nd, g_hgk, g_fk, g_ckst, g_hgst, g_old = _seg_broadcast(
        [off_new[:-1], nondup_r, hgk_r, fk_r, nd_b[:-1], hg_end_b[:-1],
         off[:-1]],
        off_new, S,
    )
    r_in = j_out - g_off
    cls_A = keep & (r_in < g_nd)
    cls_H = keep & (~cls_A) & (r_in < g_nd + g_hgk)
    cls_F = keep & (~cls_A) & (~cls_H) & (r_in < g_nd + g_hgk + g_fk)
    new_rid = jnp.where(keep, bj, np.int32(B))

    # A/H source lookup: one fused query — class-H ranks offset by the
    # global child-keep total land in the map's hg region, whose source
    # indices are ALREADY the unified table's H rows [SC, 3SC)
    n_ck = ckcum_pad[-1]
    q_ah = jnp.where(
        cls_H, n_ck + g_hgst + (r_in - g_nd), g_ckst + r_in
    )
    idx_AH = ah_map.at(q_ah, p.mxu, kn="gmap")
    # H sources arrive interleaved (SC + 2c + b in the map's hg region =
    # creation order); the unified table stores head/gap as CONTIGUOUS
    # [SC] blocks instead (the stack+reshape interleave materialization
    # cost ~0.4 ms/event), so remap SC + 2c + b -> SC + b*SC + c
    h_off = idx_AH - np.int32(SC)
    idx_AH = jnp.where(
        cls_H,
        np.int32(SC) + (h_off & np.int32(1)) * np.int32(SC)
        + (h_off >> np.int32(1)),
        idx_AH,
    )
    idx_F = jnp.clip(
        bj * np.int32(FS) + (r_in - g_nd - g_hgk),
        np.int32(0), np.int32(B * FS - 1),
    )
    idx_D = jnp.clip(
        g_old + (r_in - g_nd - g_hgk - g_fk), np.int32(0), np.int32(S - 1)
    )

    # ---- unified record table: ONE row gather serves all four classes.
    # Every class's new-path fields are materialized in its own source
    # space with a common schema, concatenated, and gathered once at the
    # S assembly slots (XLA row gathers cost ~10.5 ns/index regardless
    # of width, so one 10-field gather beats four class packs).
    # Schema: start, end, kmer, total, consec, moves, sa,
    #         ringsrc (pool row to copy the prob ring from; -1 = zeros),
    #         ringslot (ring slot to overwrite; -1 = none), ringval.
    ones_sc = jnp.ones((SC,), i32)
    # head block then gap block (contiguous, matching the idx_AH remap)
    il2 = lambda a_, b_: jnp.concatenate([a_, b_])
    # F-part fields in [B*FS] space (same index count the per-slot
    # gathers cost before: FS*B == S)
    fkm_full = f_kmer.reshape(B * FS)
    f_st_full, f_en_full = _flat_pack(
        [idx["kmer_st"], idx["kmer_en"]], fkm_full, p.mxu, kn="gfull"
    )
    f_rid_full = jax.lax.div(jax.lax.iota(i32, B * FS), np.int32(FS))
    f_prob_full = lane(
        _flat_take(
            p4, f_rid_full * np.int32(KQ) + (fkm_full >> 2), p.mxu,
            kn="gfull",
        ),
        fkm_full & 3,
    )
    NU = 3 * SC + B * FS + S

    def ucol(a_part, h_part, f_part, d_part):
        return jnp.concatenate([a_part, h_part, f_part, d_part])

    ones_f = jnp.ones((B * FS,), i32)
    u_start = ucol(ns_s, il2(head_st, gap_st), f_st_full, st["q_start"])
    u_end = ucol(ne_s, il2(head_en, gap_en), f_en_full, st["q_end"])
    u_kmer = ucol(nk_s, il2(nk_s, nk_s), fkm_full, st["q_kmer"])
    u_total = ucol(ntot_s, ones_sc.repeat(2), ones_f, st["q_total"])
    u_consec = ucol(ncons_s, ones_sc.repeat(2) * 0, ones_f * 0, st["q_consec"])
    u_moves = ucol(nmoves_s, ones_sc.repeat(2), ones_f, st["q_moves"])
    u_sa = ucol(
        (csa_s | seed_c).astype(i32), ones_sc.repeat(2) * 0, ones_f * 0,
        st["q_sa"].astype(i32),
    )
    u_ringsrc = ucol(
        cpar_s, jnp.full((2 * SC,), -1, i32), jnp.full((B * FS,), -1, i32),
        jax.lax.iota(i32, S),
    )
    u_ringslot = ucol(
        ntot_s % RINGi, ones_sc.repeat(2), ones_f,
        jnp.full((S,), -1, i32),
    )
    u_ringval = ucol(
        newcum_s, il2(prob_s, prob_s), f_prob_full, jnp.zeros((S,), f32)
    )

    src_u = jnp.where(
        cls_A | cls_H, idx_AH,
        jnp.where(
            cls_F, np.int32(3 * SC) + idx_F,
            np.int32(3 * SC + B * FS) + idx_D,
        ),
    )
    (g_start, g_end, g_kmer, g_total, g_consec, g_moves, g_sa, g_rsrc,
     g_rslot, g_rval) = _flat_pack(
        [u_start, u_end, u_kmer, u_total, u_consec, u_moves, u_sa,
         u_ringsrc, u_ringslot, u_ringval],
        jnp.minimum(src_u, np.int32(NU - 1)), False, kn="gasm",
    )

    nq_start = jnp.where(keep, g_start, 0)
    nq_end = jnp.where(keep, g_end, -1)
    nq_kmer = jnp.where(keep, g_kmer, 0)
    nq_total = jnp.where(keep, g_total, 0)
    nq_consec = jnp.where(keep, g_consec, 0)
    nq_moves = jnp.where(keep, g_moves, 0)
    nq_sa = keep & (g_sa > 0)

    # ring: children copy the parent ring and write their cum at the new
    # slot; sources start a zero ring with slot 1 = their prob; carried
    # slots copy their own ring verbatim (ringslot -1 writes nothing)
    # VMEM budget: the ring kernel holds the [S, 32] table + the packed
    # output + per-slot aux in VMEM (~1.25 KB/slot with lane padding);
    # past ~128k slots it cannot fit alongside the pipeline buffers
    # (B=512's S=196608 measured 151 MB of 128).  Bigger pools take the
    # XLA formulation.
    # S % 4: ring_assemble packs 4 slots per output row and asserts the
    # divisibility at trace time — ill-shaped pools (user-configurable
    # pool_wide/pool_max slot counts) must fall back to the XLA path
    # instead of crashing (ADVICE r3)
    if (p.stepkern and S <= 131072 and S % 4 == 0
            and "gathers" not in _KNOCKOUT):
        # VMEM kernel: gather + slot-write + keep masking in one pass
        # (bit-exact to the XLA formulation below, tests/test_stepkern.py)
        from ..ops.stepkern import ring_assemble

        nq_cum = ring_assemble(
            st["q_cum"], g_rsrc, g_rslot, g_rval, keep,
            interpret=p.stepkern_interpret,
        )
    else:
        ring_rows = _flat_take(
            st["q_cum"],
            jnp.clip(g_rsrc, np.int32(0), np.int32(S - 1)), False,
            kn="gring",
        )  # [S, RING] f32
        ring_iota = jax.lax.broadcasted_iota(i32, (S, RING), 1)
        base_ring = jnp.where((g_rsrc >= 0)[:, None], ring_rows, f32(0))
        nq_cum = jnp.where(
            keep[:, None],
            jnp.where(
                ring_iota == g_rslot[:, None], g_rval[:, None], base_ring
            ),
            f32(0),
        ).astype(f32)

    out = dict(st)
    new_pool = {
        "q_rid": new_rid,
        "q_start": nq_start,
        "q_end": nq_end,
        "q_kmer": nq_kmer,
        "q_total": nq_total,
        "q_consec": nq_consec,
        "q_moves": nq_moves,
        "q_sa": nq_sa,
        "q_cum": nq_cum,
    }
    for k, v in new_pool.items():
        out[k] = v
    out["n_paths"] = kept_r
    for k, v in tstate.items():
        m = alive
        while m.ndim < v.ndim:
            m = m[..., None]
        out[k] = jnp.where(m, v, st[k])

    # overflow flags: PHYSICAL pool cuts only (per-read budget is the
    # reference's); bits: 2=candidate pool, 4=full-source cap, 8=path
    # pool, 16=row caps, 1=CL evict (tracker)
    rows_cut = rows_cut_r | rows_cut_global
    ovf_ev = cut_cand | cut_full | cut_pool_r | rows_cut
    out["ovf"] = out["ovf"] | (ovf_ev & alive)
    why = (
        jnp.where(cut_cand, np.int32(2), np.int32(0))
        | jnp.where(cut_full, np.int32(4), np.int32(0))
        | jnp.where(cut_pool_r, np.int32(8), np.int32(0))
        | jnp.where(rows_cut, np.int32(16), np.int32(0))
    )
    out["ovf_why"] = out["ovf_why"] | jnp.where(alive, why, np.int32(0))
    upd = lambda cur, v: jnp.maximum(cur, jnp.where(alive, v, np.int32(0)))
    out["dm_flags"] = upd(st["dm_flags"], n_flags_r)
    out["dm_valid"] = upd(st["dm_valid"], n_valid_r)
    out["dm_paths"] = upd(st["dm_paths"], want_r)
    out["dm_rows"] = upd(st["dm_rows"], want_rows_r)
    out["dm_cl"] = jnp.maximum(st["dm_cl"], jnp.where(alive, out["n_cl"], np.int32(0)))
    if "shard_axis" in idx:
        # under shard_map the [5] telemetry vector is replicated while
        # per-shard maxima vary — pass through inert (pool sizing is
        # measured on the single-process bench)
        out["dm_pool"] = st["dm_pool"]
    else:
        out["dm_pool"] = jnp.maximum(
            st["dm_pool"],
            jnp.stack(
                [total_flags, ccum2_pad[-1] + cvalid[-1], total_keep,
                 n_ent, rw_b[-1]]
            ),
        )

    dec = _tracker_decide(p, out) & alive
    out["done"] = st["done"] | dec
    out["success"] = st["success"] | dec
    out["dec_evt"] = jnp.where(dec, st["evt_i"], st["dec_evt"])
    out["evt_i"] = st["evt_i"] + alive.astype(i32)
    return out


def migrate_pool_state(src_p: PoolParams, dst_p: PoolParams, state, sel):
    """Move selected reads' state into a (smaller) pooled engine's shape.

    ``sel`` [B_dst] holds source read rows (-1 = empty destination slot).
    Per-read arrays row-gather; each read's contiguous pool segment is
    relocated to its new exclusive-cumsum offset (the same
    position-arithmetic the assembly uses).  This is what lets the
    straggler drain CONTINUE reads on a narrow batch instead of
    restarting them — a restart re-burns the read's whole event history
    at drain step cost, which for the long repeat-heavy stragglers was
    most of the drain's wall."""
    import jax

    jnp = _jnp()
    i32 = jnp.int32
    Bs, Ss = src_p.B, src_p.S
    Bd, Sd = dst_p.B, dst_p.S
    valid = sel >= 0
    selc = jnp.clip(sel, np.int32(0), np.int32(Bs - 1))
    fresh = make_pool_state(dst_p)
    out = {}
    for k, v in state.items():
        if k.startswith("q_"):
            continue
        if k == "dm_pool":
            # destination pool is a different size: it records its own
            # high-water (the source's is absorbed host-side pre-migrate)
            out[k] = fresh[k]
            continue
        g = jnp.take(v, selc, axis=0)
        w = valid
        while w.ndim < g.ndim:
            w = w[..., None]
        out[k] = jnp.where(w, g, fresh[k])
    n_new = jnp.where(valid, jnp.take(state["n_paths"], selc), 0)
    out["n_paths"] = n_new
    off_src = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(state["n_paths"], dtype=i32)]
    )
    new_off = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(n_new, dtype=i32)]
    )
    j = jax.lax.iota(i32, Sd)
    k_read = jnp.clip(_bucket_of(new_off[:-1], Sd), np.int32(0), np.int32(Bd - 1))
    within = j - _flat_take(new_off, k_read, False)
    src_b = _flat_take(jnp.take(off_src, selc), k_read, False)
    src_idx = jnp.clip(src_b + within, np.int32(0), np.int32(Ss - 1))
    ok = j < new_off[-1]
    flds = ["q_start", "q_end", "q_kmer", "q_total", "q_consec",
            "q_moves", "q_sa"]
    got = _flat_pack([state[f] for f in flds], src_idx, False)
    for f, g in zip(flds, got):
        if f == "q_sa":
            out[f] = ok & g
        else:
            out[f] = jnp.where(ok, g, fresh[f])
    out["q_rid"] = jnp.where(ok, k_read, np.int32(Bd))
    cum = jnp.take(state["q_cum"], src_idx, axis=0)
    out["q_cum"] = jnp.where(ok[:, None], cum, jnp.float32(0))
    return out


def pool_advance_block(idx, p: PoolParams, state, means, on, sb=None):
    """Advance all read slots through T events: means/on are [B, T].

    With ``p.handoff``, ``sb`` = (sb_means [B, W], sb_on [B, W],
    sb_armed [B], promote [B]): the standby streams (0-based windows of
    the slots' next reads), which slots have one armed, and which
    switched slots the host has promoted to the primary lane (clears
    the sw latch before the scan)."""
    import jax

    jnp = _jnp()
    if p.handoff:
        if sb is None:
            B, T = means.shape
            sb = (
                jnp.zeros((B, 2 * T), jnp.float32),
                jnp.zeros((B, 2 * T), bool),
                jnp.zeros((B,), bool),
                jnp.zeros((B,), bool),
            )
        sb_m, sb_o, sb_armed, promote = sb
        state = dict(state)
        state["sw"] = state["sw"] & (~promote)

        def step(st, inp):
            ev, ev_on = inp
            return _pool_event_step(
                idx, p, st, ev, ev_on, sb=(sb_m, sb_o, sb_armed)
            ), None
    else:
        def step(st, inp):
            ev, ev_on = inp
            return _pool_event_step(idx, p, st, ev, ev_on), None

    state, _ = jax.lax.scan(step, state, (means.T, on.T))
    return state


class PooledEngine:
    """Host wrapper with MapEngine's interface (drop-in for BatchMapper)."""

    def __init__(self, fmi, model, threshes, conf: Conf | None = None, **over):
        import jax

        self.conf = conf or Conf()
        on_tpu = jax.default_backend() == "tpu"
        over.setdefault("mxu", on_tpu)
        # bit-identical to the flat lax.sort (tests/test_pooled.py) and
        # measured 0.7 ms/event faster on v5e
        over.setdefault("sort_mode", "bitonic" if on_tpu else "flat")
        over.setdefault("tracker_kernel", on_tpu)
        over.setdefault("stepkern", on_tpu)
        over.setdefault("sortkern", on_tpu)
        # genome-scaled pool caps (tools/demand_scale.py, 100 Mb Markov
        # genome, 256 reads): per-read seed-row demand roughly doubles
        # (max 1898 vs 948 at 4.7 Mb; eject_why bit 16 hit 72/256 reads
        # at R=1024), entry counts pass 1024 (hw 1107), and per-read
        # path/flag demand grows ~40% — while CLUSTER demand does NOT
        # blow up (oracle true max 1939 < CL=2048).  Scale the row/slot
        # caps once the index is big; the 4.7 Mb bench keeps the lean
        # shapes (R=2048 costs ~+0.4 ms/event there for nothing).
        if getattr(fmi, "n", 0) >= 150_000_000:
            over.setdefault("R", 2048)
            # measured at 100 Mb (DEMAND_100MB_r05_cl4096.json): the
            # repeat-tail's cluster demand DOES cross CL=2048 (true max
            # hits the 4096 cap on 2/256 reads); CL=4096 cuts ejects
            # 20/256 -> 7/256 (2.7%) and runs 0.36 vs 0.32 reads/s —
            # the bigger tracker table costs less than the rung0
            # re-passes it saves.  4.7 Mb shapes keep CL=2048.
            over.setdefault("CL", 4096)
            b_ = over.get("B", self.conf.engine.batch_reads)
            over.setdefault("RE", max(2048, 4 * b_))
            over.setdefault("RT", max(12288, 24 * b_))
            if "S" not in over:
                over["S"] = max(4096, b_ * max(
                    512, self.conf.engine.pool_slots_per_read
                ))
        self.params = PoolParams.from_conf(self.conf, **over)
        self.fmi = fmi
        self.model = model
        self.idx = device_index(
            fmi, threshes, model,
            sampled_sa=self.params.sampled_sa, sa_intv=self.params.sa_intv,
        )
        p = self.params

        # index tables as jit ARGUMENTS (see MapEngine.__init__): the
        # closure-constant form broke persistent-cache key stability
        # across processes and serialized 160+ MB cache entries
        self._tables = {
            k: v for k, v in self.idx.items() if not isinstance(v, int)
        }
        meta = {k: v for k, v in self.idx.items() if isinstance(v, int)}

        if p.handoff:
            def _adv(state, means, on, sb, tables):
                return pool_advance_block(
                    dict(tables, **meta), p, state, means, on, sb=sb
                )
        else:
            def _adv(state, means, on, tables):
                return pool_advance_block(
                    dict(tables, **meta), p, state, means, on
                )

        self._advance = jax.jit(_adv, donate_argnums=(0,))
        if p.handoff:
            # latched fields + the switch flag ride the packed readout
            self.READOUT_KEYS = _ME.READOUT_KEYS + ("sw",) + tuple(
                "lt_" + k for k in LATCH_KEYS
            )
        # reset must be jitted: eagerly it dispatches ~40 pool-sized ops
        # per refill over the (remote) device link, and refills happen
        # nearly every block while reads churn
        self._reset = jax.jit(reset_pool_rows, donate_argnums=(0,))

    def fresh_state(self):
        return make_pool_state(self.params)

    def migrate(self, state, sel, dst: "PooledEngine"):
        """Relocate reads ``sel`` (numpy [B_dst], -1 = empty) into
        ``dst``'s state shape; see :func:`migrate_pool_state`."""
        import functools

        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_migrations"):
            self._migrations = {}
        key = (dst.params.B, dst.params.S)
        fn = self._migrations.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(migrate_pool_state, self.params, dst.params)
            )
            self._migrations[key] = fn
        return fn(state, jnp.asarray(np.asarray(sel, np.int32)))

    def reset_slots(self, state, mask):
        import jax.numpy as jnp

        return self._reset(state, jnp.asarray(mask))

    def advance(self, state, means, on, sb=None):
        import jax.numpy as jnp

        means = jnp.asarray(means, dtype=jnp.float32)
        on = jnp.asarray(on, dtype=bool)
        if self.params.handoff:
            B, T = means.shape
            if sb is None:
                # cached device-resident zeros: rebuilding + re-shipping
                # four host arrays per sb-less advance cost a transfer
                # per block for nothing (code-review r5)
                if not hasattr(self, "_zero_sb"):
                    self._zero_sb = {}
                sb = self._zero_sb.get((B, T))
                if sb is None:
                    sb = (
                        jnp.zeros((B, 2 * T), jnp.float32),
                        jnp.zeros((B, 2 * T), bool),
                        jnp.zeros((B,), bool),
                        jnp.zeros((B,), bool),
                    )
                    self._zero_sb[(B, T)] = sb
            else:
                sb = (
                    jnp.asarray(sb[0], jnp.float32),
                    jnp.asarray(sb[1], bool),
                    jnp.asarray(sb[2], bool), jnp.asarray(sb[3], bool),
                )
            return self._advance(state, means, on, sb, self._tables)
        return self._advance(state, means, on, self._tables)

    # packed [K, B] readout, split into async dispatch + blocking fetch
    # exactly like MapEngine's (one transfer per block; pipelinable)
    READOUT_KEYS = None  # set below to MapEngine.READOUT_KEYS

    readout_start = None
    readout_get = None
    readout = None


from .engine import MapEngine as _ME  # noqa: E402

PooledEngine.READOUT_KEYS = _ME.READOUT_KEYS
PooledEngine.readout_start = _ME.readout_start
PooledEngine.readout_get = _ME.readout_get
PooledEngine.readout = _ME.readout
