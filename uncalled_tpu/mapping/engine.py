"""Batched, fixed-shape device mapping engine (the TPU compute path).

This is the reference Mapper's seed-and-extend state machine
(mapper.cpp:433-663) re-architected for SPMD hardware: instead of one
sequential state machine per thread, a single jitted program advances B reads
through one event per step, with every irregular structure re-expressed under
a fixed budget + validity mask:

  * live paths        -> [B, P]  slot arrays (reference: std::vector<PathBuffer>
                         capped at max_paths, mapper.cpp:83-86)
  * candidate children-> [B, C]  compacted by exclusive-cumsum scatter in
                         *creation order*, so budget overflow drops the same
                         late candidates the reference's budget does
                         (mapper.cpp:455-520)
  * sort + dedup      -> lax.sort by (fm_start, fm_end, seed_prob) then
                         neighbor compare (reference pdqsort + dedup,
                         mapper.cpp:527-624)
  * source creation   -> segmented cummax over the sorted candidates (the
                         reference's `unchecked_ranges` walk, mapper.cpp:544-597)
  * seed SA lookups   -> fixed [B, R] row budget, expanded from seed groups
                         via vmapped searchsorted
  * SeedTracker       -> fixed [B, CL] cluster table updated by a masked
                         argmax match (seed_tracker.cpp:157-232); the
                         break-early condition of the reference scan is
                         provably disjoint from the match predicate for
                         evt_st >= 1 (r2-r1 >= e2 contradicts
                         r2-r1 <= e2-e1), so it is dropped
  * per-read lifecycle-> done mask + host-side slot refill (the reference's
                         RealtimePool channel model, realtime_pool.cpp:48)

Numerics: match probs evaluate through f64 exactly like the reference
(pore_model.hpp:163-165) — on TPU this is emulated but tiny ([B,1024] per
event).  Seed-prob window sums use a 23-slot ring of *cumulative* sums so the
f32 additions are the same operations as the reference's sums_ array
(mapper.cpp:768-807), making the whole step bit-reproducible against the
sequential oracle given the same event stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import Conf
from ..kmer import KMER_COUNT

INT32_MAX = np.int32(2**31 - 1)


def _jnp():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    return jnp


@dataclass(frozen=True)
class EngineParams:
    """Static (compile-time) parameters of the device engine."""

    B: int = 64  # read slots
    P: int = 1024  # path budget per read
    C: int = 1024  # candidate budget per event (pre-dedup children)
    CE: int = 0  # candidate extension width (>= C; 0 = auto C + C//4)
    R: int = 256  # seed SA-row budget per event
    CL: int = 1024  # seed-cluster table capacity
    # mapper params (defaults.toml [mapper] via Conf)
    seed_len: int = 22
    min_rep_len: int = 0
    max_rep_copy: int = 50
    max_consec_stay: int = 8
    max_stay_frac: float = 0.5
    min_seed_prob: float = -3.75
    # seed_tracker params
    min_aln_len: int = 25
    min_mean_conf: float = 6.0
    min_top_conf: float = 1.85
    # parity: evaluate match probs through f64 like the reference
    exact_probs: bool = True
    # route small-table gathers through the Pallas MXU one-hot kernel
    # (ops/mxu_gather.py); bit-exact, so goldens validate either path
    mxu: bool = False
    # 1/32 row-sampled SA with device LF-walk reconstruction instead of
    # the full int32 SA (4 bytes/base -> 0.125); the reference ships
    # sampled .sa files and walks invPsi the same way (bwa_index.hpp:176,
    # minibwa bwt_sa). Exact, so goldens validate either path.
    sampled_sa: bool = False
    sa_intv: int = 32

    @staticmethod
    def from_conf(conf: Conf, **over) -> "EngineParams":
        mp, st, en = conf.mapper, conf.seed_tracker, conf.engine
        kw = dict(
            B=en.batch_reads,
            P=en.max_paths,
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
        return EngineParams(**kw)


def device_index(fmi, threshes, model, sampled_sa=False, sa_intv=32):
    """Static device arrays for one index + model + threshold preset.

    With ``sampled_sa`` the full int32 SA is replaced by a 1/``sa_intv``
    row sample; lookups LF-walk on device (_sa_lookup)."""
    jnp = _jnp()
    # interleaved occ buckets (the BWA layout, adapted for row gathers):
    # row b = [ckpt_A, ckpt_C, ckpt_G, ckpt_T, word0, word1] for the 32-base
    # block b, so one [*, 6] row gather answers an occ query that would
    # otherwise need 3 separate gathers (TPU gather cost is per-index)
    import numpy as _np

    nb = (fmi.n + 31) // 32
    words = _np.zeros(2 * nb, dtype=_np.uint32)
    words[: len(fmi.bwt_words)] = fmi.bwt_words
    occ_rows = _np.zeros((nb, 6), dtype=_np.int32)
    occ_rows[:, :4] = fmi.ckpt[:nb]
    occ_rows[:, 4] = words[0::2].view(_np.int32)
    occ_rows[:, 5] = words[1::2].view(_np.int32)
    if sampled_sa:
        sa_arrs = {
            "sa_samp": jnp.asarray(fmi.sa_full[::sa_intv], dtype=jnp.int32),
        }
    else:
        sa_arrs = {"sa": jnp.asarray(fmi.sa_full, dtype=jnp.int32)}
    return {
        "occ_rows": jnp.asarray(occ_rows),
        **sa_arrs,
        "kmer_st": jnp.asarray(fmi.kmer_ranges[:, 0], dtype=jnp.int32),
        "kmer_en": jnp.asarray(fmi.kmer_ranges[:, 1], dtype=jnp.int32),
        "kmer_rng2": jnp.asarray(fmi.kmer_ranges[:, :2], dtype=jnp.int32),
        "L2": jnp.asarray(fmi.L2, dtype=jnp.int32),
        "threshes": jnp.asarray(threshes, dtype=jnp.float32),
        "means": jnp.asarray(model.means, dtype=jnp.float32),
        "vars_x2": jnp.asarray(model.vars_x2, dtype=jnp.float32),
        "lognorm": jnp.asarray(model.lognorm_denoms, dtype=jnp.float32),
        # static scalars (python ints -> compile-time constants)
        "n": int(fmi.n),
        "primary": int(fmi.primary),
    }


def make_state(p: EngineParams):
    """Fresh engine state for B empty read slots."""
    jnp = _jnp()
    i32, f32 = jnp.int32, jnp.float32
    B, P, CL = p.B, p.P, p.CL
    z = lambda *s: jnp.zeros(s, i32)
    return {
        # path table
        "p_start": z(B, P),
        "p_end": z(B, P),
        "p_kmer": z(B, P),
        "p_total": z(B, P),  # probs accumulated since birth; 0 = empty slot
        "p_consec": z(B, P),
        "p_moves": z(B, P),
        "p_sa": jnp.zeros((B, P), bool),
        "p_cum": jnp.zeros((B, P, p.seed_len + 1), f32),  # cumulative-sum ring
        # seed-cluster table; cl_valid = in the reference's std::set
        # (matchable), cl_count = its length still lives in all_lens
        # ("zombie" clusters lost to the set-reinsertion key collision,
        # seed_tracker.cpp via oracle.py:168-173, keep counting there)
        "cl_valid": jnp.zeros((B, CL), bool),
        "cl_count": jnp.zeros((B, CL), bool),
        "cl_ref_st": z(B, CL),
        "cl_r1": z(B, CL),  # ref_en range start
        "cl_r2e": z(B, CL),  # ref_en range end
        "cl_evt_st": z(B, CL),
        "cl_evt_en": z(B, CL),
        "cl_total": z(B, CL),
        # tracker scalars
        "len_sum": jnp.zeros((B,), f32),
        "n_cl": z(B),
        # max_map snapshot (best confident cluster)
        "mm_len": z(B),
        "mm_ref_st": z(B),
        "mm_r1": z(B),
        "mm_r2e": z(B),
        "mm_evt_st": z(B),
        "mm_evt_en": z(B),
        # per-read lifecycle
        "evt_i": z(B),  # events consumed so far
        "done": jnp.ones((B,), bool),  # empty slots start done
        "success": jnp.zeros((B,), bool),
        "dec_evt": z(B),  # event index at decision
        # sticky budget-overflow flag: set whenever a fixed budget (CE, C,
        # P, R, CL) cut work the reference would have done; such reads are
        # re-mapped on the wide-parity engine (batch.py remap ladder)
        "ovf": jnp.zeros((B,), bool),
        # which budget(s) tripped, as a sticky bitmask (diagnostics for
        # ladder tuning): 1=CL evict, 2=CE flags, 4=C candidates,
        # 8=P paths, 16=R seed rows
        "ovf_why": z(B),
        # sticky per-read demand maxima (what budget WOULD have sufficed,
        # up to the first cut): flags, fm-valid candidates, next-event
        # paths, seed rows.  Lower bounds once a cut happened; exact for
        # non-overflowing reads.  Used to route remaps to the right rung.
        "dm_flags": z(B),
        "dm_valid": z(B),
        "dm_paths": z(B),
        "dm_rows": z(B),
        # sticky max live clusters (CL sizing evidence; n_cl saturates at
        # CL, so this is a lower bound once a CL eviction happened)
        "dm_cl": z(B),
    }


def reset_rows(state, mask):
    """Reset read slots where mask[B] is True (keeps done=False there)."""
    jnp = _jnp()
    fresh = None
    out = {}
    for k, v in state.items():
        if fresh is None:
            fresh = make_state(
                EngineParams(
                    B=v.shape[0],
                    P=state["p_start"].shape[1],
                    CL=state["cl_valid"].shape[1],
                    seed_len=state["p_cum"].shape[2] - 1,
                )
            )
        m = mask
        while m.ndim < v.ndim:
            m = m[..., None]
        out[k] = jnp.where(m, fresh[k], v)
    out["done"] = jnp.where(mask, False, state["done"])
    return out


# ---------------------------------------------------------------------------
# device FM-index primitives
# ---------------------------------------------------------------------------

_EVEN = 0x55555555


def _shard_take(idx, key, rows):
    """Row gather from a possibly mesh-sharded table.

    When ``idx["shard_axis"]`` is set (parallel/sharded.py), the table is
    row-sharded across that mesh axis inside shard_map: each shard
    answers the queries in its row range and a psum combines them (the
    DESIGN.md extension-routing scheme; query volume is tiny next to the
    local HBM traffic).  Replicated mode is a plain take."""
    import jax

    jnp = _jnp()
    tbl = idx[key]
    ax = idx.get("shard_axis")
    if not ax:
        return jnp.take(tbl, rows, axis=0)
    per = tbl.shape[0]  # rows per shard
    lo = jax.lax.axis_index(ax).astype(jnp.int32) * np.int32(per)
    local = rows - lo
    ok = (local >= 0) & (local < per)
    g = jnp.take(tbl, jnp.clip(local, np.int32(0), np.int32(per - 1)), axis=0)
    m = ok
    while m.ndim < g.ndim:
        m = m[..., None]
    return jax.lax.psum(jnp.where(m, g, jnp.zeros((), g.dtype)), ax)


def _occ(idx, k, c):
    """# occurrences of base c in BWT rows [0, k] (BWA bwt_occ semantics:
    k<0 -> 0, k>=n -> full count, rows >= primary shift by one because the
    sentinel is not stored). Vectorized over arbitrary-shaped k/c (int32)."""
    jnp = _jnp()
    i32, u32 = jnp.int32, jnp.uint32
    n, primary = idx["n"], idx["primary"]

    import jax

    is_neg = k < 0
    is_full = k >= n
    kk = jnp.where(k >= primary, k - 1, k)
    kk = jnp.clip(kk, np.int32(0), np.int32(n - 1))

    blk = kk >> 5  # 32 bases per interleaved bucket
    row = _shard_take(idx, "occ_rows", blk)  # [*, 6] bucket row gather
    # pick the base's checkpoint by one-hot sum (4 lanes; a take_along_axis
    # here would pay the per-index gather cost again)
    oh4 = c[..., None] == jnp.arange(4, dtype=i32)
    base_cnt = jnp.sum(jnp.where(oh4, row[..., :4], 0), axis=-1, dtype=i32)

    rem = kk & 31
    pat = (c.astype(u32) * u32(_EVEN)).astype(u32)

    def count_word(word_i32, inc):
        x = jax.lax.bitcast_convert_type(word_i32, u32) ^ pat
        m = (~x) & ((~x) >> u32(1)) & u32(_EVEN)
        # include the first `inc` (MSB-first) bases of the word
        full = inc >= 16
        none = inc <= 0
        sh = (u32(16) - jnp.clip(inc, 0, 16).astype(u32)) * u32(2)
        pm = jnp.where(none, u32(0), u32(0xFFFFFFFF) << sh)
        pm = jnp.where(full, u32(0xFFFFFFFF), pm)
        return jax.lax.population_count(m & pm).astype(i32)

    cnt = count_word(row[..., 4], rem + 1) + count_word(row[..., 5], rem - 15)

    out = base_cnt + cnt
    l2diff = idx["L2"][1:5] - idx["L2"][0:4]  # per-base totals, [4]
    full_cnt = jnp.sum(jnp.where(oh4, l2diff, 0), axis=-1, dtype=i32)
    out = jnp.where(is_full, full_cnt, out)
    out = jnp.where(is_neg, 0, out)
    return out


def _extend(idx, start, end, base):
    """Backward-extend FM intervals (bwa_index.hpp:158-162).

    The two occ probes (start-1 and end) run as ONE doubled-shape _occ
    call: same gather volume, half the fusion count (per-op overhead is
    a measurable slice of the pooled step's tail)."""
    jnp = _jnp()
    q = jnp.concatenate([start - 1, end])
    o2 = _occ(idx, q, jnp.concatenate([base, base]))
    n0 = start.shape[0]
    os_, oe = o2[:n0], o2[n0:]
    oh4 = base[..., None] == jnp.arange(4, dtype=jnp.int32)
    L2b = jnp.sum(jnp.where(oh4, idx["L2"][:4], 0), axis=-1, dtype=jnp.int32)
    return L2b + os_ + 1, L2b + oe


def _sa_lookup(idx, rows, intv):
    """SA values for FM rows via LF-walk on the 1/intv row sample.

    Mirrors libbwa's bwt_sa/inv_psi (minibwa.cpp:121-135): step
    LF(r) = L2[c] + occ(c, r) (with LF(primary) = 0) until the row index
    is a multiple of intv, then SA(r) = sa_samp[r/intv] + steps.  Each
    step is one bucket-row gather + popcount over all unresolved rows —
    the same primitive as FM extension.  Max intv-1 iterations; the
    while_loop exits as soon as every row is resolved."""
    import jax

    jnp = _jnp()
    i32, u32 = jnp.int32, jnp.uint32
    primary = idx["primary"]

    def step(c):
        r, steps = c
        live = (r % intv) != 0
        # base at bwt index j = r - (r > primary); MSB-first 2-bit packing
        # inside the interleaved bucket words (same layout as _occ)
        j = jnp.maximum(r - (r > primary), np.int32(0))
        blk = j >> 5
        row = _shard_take(idx, "occ_rows", blk)
        pos = j & 31
        word = jnp.where(pos < 16, row[..., 4], row[..., 5])
        sh = ((15 - (pos & 15)) * 2).astype(u32)
        base = (
            jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(word, u32), sh
            )
            & u32(3)
        ).astype(i32)
        oh4 = base[..., None] == jnp.arange(4, dtype=i32)
        L2b = jnp.sum(jnp.where(oh4, idx["L2"][:4], 0), axis=-1, dtype=i32)
        lf = L2b + _occ(idx, r, base)
        lf = jnp.where(r == primary, 0, lf)
        r2 = jnp.where(live, lf, r)
        return r2.astype(i32), steps + live.astype(i32)

    def cond(c):
        r, _ = c
        return jnp.any((r % intv) != 0)

    r, steps = jax.lax.while_loop(
        cond, step, (rows.astype(i32), jnp.zeros_like(rows, dtype=i32))
    )
    return _shard_take(idx, "sa_samp", r // intv) + steps


def _fm_bin(fmlen):
    """64 - bit_length(fmlen): the clz-based threshold bin (mapper.cpp:161-167).
    Exact integer version (bit smear + popcount)."""
    import jax

    jnp = _jnp()
    x = jnp.maximum(fmlen, 1).astype(jnp.uint32)
    x |= x >> 1
    x |= x >> 2
    x |= x >> 4
    x |= x >> 8
    x |= x >> 16
    return 64 - jax.lax.population_count(x).astype(jnp.int32)


def _match_probs(idx, ev, exact):
    """[B,1024] log match probs with the reference's f32/f64 choreography
    (pore_model.hpp:163-165 via the oracle's match_probs_exact)."""
    jnp = _jnp()
    f32, f64 = jnp.float32, jnp.float64
    d = (ev[:, None].astype(f32) - idx["means"][None, :]).astype(f32)
    if exact:
        d64 = d.astype(f64)
        return (
            -(d64 * d64) / idx["vars_x2"].astype(f64) - idx["lognorm"].astype(f64)
        ).astype(f32)
    return -(d * d) / idx["vars_x2"] - idx["lognorm"]


# ---------------------------------------------------------------------------
# seed tracker (vectorized SeedTracker::add_seed, seed_tracker.cpp:157-232)
# ---------------------------------------------------------------------------

def _tracker_add(p: EngineParams, st, ref_en, mc, evt, row_ok):
    """Add one seed row per read (all [B] scalars) to the cluster tables."""
    import jax

    jnp = _jnp()
    i32, f32 = jnp.int32, jnp.float32
    NEG = jnp.int32(-(2**30))

    r2 = ref_en - mc + 1  # new.ref_en_start
    r2e = ref_en  # new.ref_en_end
    e2 = evt

    v = st["cl_valid"]
    r1 = st["cl_r1"]
    e1 = st["cl_evt_en"]
    tot = st["cl_total"]

    considered = v & (
        (r1 < r2[:, None]) | ((r1 == r2[:, None]) & (e1 <= e2[:, None]))
    )
    dr = r2[:, None] - r1
    de = e2[:, None] - e1
    in_range = (e1 <= e2[:, None]) & (dr <= de) & (dr >= de // 12)
    elig = considered & in_range

    # choose the match the reference scan picks: max total_len, ties -> the
    # earliest scanned = largest r1, then largest evt_en
    m1 = jnp.max(jnp.where(elig, tot, NEG), axis=1)
    t1 = elig & (tot == m1[:, None])
    m2 = jnp.max(jnp.where(t1, r1, NEG), axis=1)
    t2 = t1 & (r1 == m2[:, None])
    m3 = jnp.max(jnp.where(t2, e1, NEG), axis=1)
    t3 = t2 & (e1 == m3[:, None])
    any_match = jnp.any(elig, axis=1) & row_ok
    match_idx = jax.lax.argmax(t3, 1, i32)  # first True (i32 index: the
    # default i64 under x64 would run emulated 64-bit in the hot loop)

    CL = v.shape[1]
    onehot = (
        jax.lax.broadcasted_iota(i32, (1, CL), 1) == match_idx[:, None]
    ) & any_match[:, None]

    # SeedCluster::update (seed_tracker.cpp:56-73)
    a_r2e = st["cl_r2e"]
    overlaps = r2[:, None] < a_r2e
    grows = r2e[:, None] > a_r2e
    growth = jnp.where(
        overlaps, jnp.where(grows, r2e[:, None] - a_r2e, 0), mc[:, None]
    )
    new_r1 = jnp.where(onehot, r2[:, None], r1)
    new_r2e = jnp.where(onehot & (grows | ~overlaps), r2e[:, None], a_r2e)
    new_e1 = jnp.where(onehot, e2[:, None], e1)
    new_tot = jnp.where(onehot, tot + growth, tot)
    upd_len = jnp.sum(jnp.where(onehot, growth, 0), axis=1, dtype=i32)  # growth of match

    # set-reinsertion collision quirk (oracle.py:168-173): the updated
    # cluster's new key (r2, e2) may equal another live cluster's key; the
    # reference's std::set then silently DROPS the updated cluster, but its
    # length stays in all_lens and len_sum. Model it as a "zombie": not
    # matchable (cl_valid=False), still counted for second-max (cl_count).
    occupied = st["cl_count"]
    coll = jnp.any(
        v
        & (~onehot)
        & (r1 == r2[:, None])
        & (e1 == e2[:, None]),
        axis=1,
    )
    lost = any_match & coll

    # insertion of a fresh cluster when no match: pick a free slot, else
    # evict the smallest occupant (approximation of the unbounded set)
    do_insert = row_ok & ~any_match
    free = ~occupied
    evict_key = jnp.where(free, NEG, tot)  # prefer free, else min length
    ins_idx = jax.lax.argmin(evict_key, 1, i32)
    ins1h = (
        jax.lax.broadcasted_iota(i32, (1, CL), 1) == ins_idx[:, None]
    ) & do_insert[:, None]
    evicted_len = jnp.sum(jnp.where(ins1h & occupied, tot, 0), axis=1, dtype=i32)
    evicted_n = jnp.sum((ins1h & v).astype(i32), axis=1, dtype=i32)

    out = dict(st)
    if "ovf" in st:
        # evicting ANY occupant (live or zombie) diverges from the
        # reference's unbounded std::set -> flag for the wide remap
        evict = do_insert & ~jnp.any(free, axis=1)
        out["ovf"] = st["ovf"] | evict
        out["ovf_why"] = st["ovf_why"] | jnp.where(
            evict, np.int32(1), np.int32(0)
        )
    out["cl_valid"] = (v & ~(lost[:, None] & onehot) & ~ins1h) | ins1h
    out["cl_count"] = occupied | ins1h
    out["cl_r1"] = jnp.where(ins1h, r2[:, None], new_r1)
    out["cl_r2e"] = jnp.where(ins1h, r2e[:, None], new_r2e)
    out["cl_ref_st"] = jnp.where(ins1h, r2[:, None], st["cl_ref_st"])
    out["cl_evt_st"] = jnp.where(ins1h, e2[:, None], st["cl_evt_st"])
    out["cl_evt_en"] = jnp.where(ins1h, e2[:, None], new_e1)
    out["cl_total"] = jnp.where(ins1h, mc[:, None], new_tot)

    out["len_sum"] = (
        st["len_sum"]
        + jnp.where(any_match, upd_len, 0).astype(f32)
        + jnp.where(do_insert, mc, 0).astype(f32)
        - evicted_len.astype(f32)
    )
    out["n_cl"] = (
        st["n_cl"]
        + do_insert.astype(i32)
        - evicted_n
        - lost.astype(i32)
    )

    # max_map: replace when a cluster's length changed and exceeds it
    # (reference updates only on total_len change; growth==0 updates skip)
    cand_len = jnp.where(any_match, jnp.sum(jnp.where(onehot, new_tot, 0), axis=1, dtype=i32),
                         jnp.where(do_insert, mc, NEG))
    changed = jnp.where(any_match, upd_len > 0, do_insert)
    better = changed & (cand_len >= p.min_aln_len) & (cand_len > st["mm_len"])

    src = {
        "mm_len": cand_len,
        "mm_ref_st": jnp.where(
            any_match,
            jnp.sum(jnp.where(onehot, out["cl_ref_st"], 0), axis=1, dtype=i32), r2),
        "mm_r1": jnp.where(
            any_match, jnp.sum(jnp.where(onehot, out["cl_r1"], 0), axis=1, dtype=i32), r2),
        "mm_r2e": jnp.where(
            any_match, jnp.sum(jnp.where(onehot, out["cl_r2e"], 0), axis=1, dtype=i32), r2e),
        "mm_evt_st": jnp.where(
            any_match,
            jnp.sum(jnp.where(onehot, out["cl_evt_st"], 0), axis=1, dtype=i32), e2),
        "mm_evt_en": jnp.where(
            any_match,
            jnp.sum(jnp.where(onehot, out["cl_evt_en"], 0), axis=1, dtype=i32), e2),
    }
    for k2, val in src.items():
        out[k2] = jnp.where(better, val, st[k2])
    # pin dtypes (x64 mode weak-promotes python int literals to i64)
    for k2, val in out.items():
        if val.dtype != st[k2].dtype:
            out[k2] = val.astype(st[k2].dtype)
    return out


def _compact_idx(valid, w_out):
    """Stable-compaction *gather* indices: src[j] = index of the j-th True
    element of valid[B, W] (order preserved), ok[j] = j < count.

    Sort-based: a single-key sort of (index if valid else W) moves the valid
    indices to the front in order. On TPU a sort is ~40x cheaper than the
    equivalent batched binary search, and scatters serialize entirely.
    """
    import jax

    jnp = _jnp()
    W = valid.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
    key = jnp.where(valid, iota, W)
    skey = jax.lax.sort(key, dimension=1)[:, :w_out]
    ok = skey < W
    return jnp.minimum(skey, W - 1), ok


def _pack_gather(fields, idx2d, rings=(), mxu=False):
    """Gather many same-shape per-slot fields with ONE row gather.

    TPU gather cost is dominated by the per-index overhead, not bytes: a
    [B, W, F] row gather costs about the same as a single [B, W] scalar
    gather (measured in docs/PERF.md), so packing F fields (f32 fields
    bitcast to i32) saves F-1 gathers.  ``rings`` are [B, W, R] f32
    arrays packed as R extra columns each (the seed-prob cum rings ride
    along for free).  With ``mxu`` the row gather runs on the Pallas MXU
    one-hot kernel (bit-exact).  Returns the unpacked field list followed
    by the gathered rings."""
    import jax

    jnp = _jnp()
    i32 = jnp.int32
    cols = []
    kinds = []
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
    ring_slices = []
    for r in rings:
        r32 = jax.lax.bitcast_convert_type(r.astype(jnp.float32), i32)
        ring_slices.append((len(cols), r32.shape[2]))
        cols.extend(r32[:, :, j] for j in range(r32.shape[2]))
    packed = jnp.stack(cols, axis=2)
    if mxu:
        from ..ops.mxu_gather import row_gather_fields

        gcols = row_gather_fields(packed, idx2d, force=True)
    else:
        g3 = jnp.take_along_axis(packed, idx2d[:, :, None], axis=1)
        gcols = [g3[:, :, k] for k in range(packed.shape[2])]
    out = []
    for k, kind in enumerate(kinds):
        v = gcols[k]
        if kind == "f32":
            v = jax.lax.bitcast_convert_type(v, jnp.float32)
        elif kind == "bool":
            v = v.astype(bool)
        out.append(v)
    for at, width in ring_slices:
        out.append(
            jax.lax.bitcast_convert_type(
                jnp.stack(gcols[at : at + width], axis=2), jnp.float32
            )
        )
    return out


def _row_gather(tbl, idx2d, mxu=False):
    """Row gather ([B, N] or [B, N, F] table), MXU-routed when enabled
    (bit-exact)."""
    jnp = _jnp()
    if mxu:
        from ..ops.mxu_gather import row_gather

        return row_gather(tbl, idx2d, force=True)
    if tbl.ndim == 3:
        return jnp.take_along_axis(tbl, idx2d[:, :, None], axis=1)
    return jnp.take_along_axis(tbl, idx2d, axis=1)


def _shared_gather(tbl, idx2d, mxu=False):
    """Shared-table gather ``tbl[idx2d]``, MXU-routed when enabled."""
    jnp = _jnp()
    if mxu:
        from ..ops.mxu_gather import shared_gather

        return shared_gather(tbl, idx2d, force=True)
    return jnp.take(tbl, jnp.clip(idx2d, np.int32(0), np.int32(tbl.shape[0] - 1)), axis=0)


def _ring_read(ring, slot):
    """ring[b, k, slot[b, k]] without a gather: one-hot sum over the ring
    axis (RING=23 lanes; exactly one nonzero term, so f32-exact)."""
    import jax

    jnp = _jnp()
    RING = ring.shape[2]
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, RING), 2) == slot[:, :, None]
    )
    return jnp.sum(jnp.where(oh, ring, 0.0), axis=2)


def _member(values, valid, n):
    """Membership bitmap [B, n]: for each id in [0, n), is it among
    values[valid]? Two sorts instead of scatters/binary searches:
    candidates (id*2) and sentinels (id*2+1) sort together, so a sentinel
    preceded by its even twin marks a present id; a second key sort lines
    the sentinels up in id order carrying the hit flags."""
    import jax

    jnp = _jnp()
    i32 = jnp.int32
    B, W = values.shape
    cand = jnp.where(valid, values * 2, 2 * n)
    sent = jnp.broadcast_to(
        (jnp.arange(n, dtype=i32) * 2 + 1)[None, :], (B, n)
    )
    keys = jnp.concatenate([cand.astype(i32), sent], axis=1)
    sk = jax.lax.sort(keys, dimension=1)
    prev = jnp.concatenate([jnp.full((B, 1), -1, i32), sk[:, :-1]], axis=1)
    hit = ((sk & 1) == 1) & (prev == sk - 1)
    k2 = jnp.where((sk & 1) == 1, sk >> 1, n)
    _, hits = jax.lax.sort((k2, hit.astype(i32)), dimension=1, num_keys=1)
    return hits[:, :n] > 0


# ---------------------------------------------------------------------------
# per-event step (the batched map_next, mapper.cpp:433-663)
# ---------------------------------------------------------------------------

def _event_step(idx, p: EngineParams, st, ev, ev_on):
    import jax

    jnp = _jnp()
    i32, f32 = jnp.int32, jnp.float32
    B, P, C, R, SL = p.B, p.P, p.C, p.R, p.seed_len
    # CE: physical candidate width. The budget C counts only FM-valid
    # candidates (the reference checks range validity before appending,
    # mapper.cpp:486-510), so we compact up to CE prob-passing flags,
    # extend them, then cut at C valid ones.
    CE = p.CE if p.CE else C + max(C // 4, 256)
    CE = min(CE, 5 * P)  # cannot exceed the flag count
    KMASK = KMER_COUNT - 1
    PATH_MASK = (1 << SL) - 1
    TAIL_MOVE = 1 << (SL - 1)
    RING = SL + 1
    n = idx["n"]

    alive = (~st["done"]) & ev_on
    probs = _match_probs(idx, ev, p.exact_probs)  # [B, 1024]

    # ---- candidate flags in creation order (stay, then moves A..T) ----
    pv = st["p_total"] > 0
    fmlen = st["p_end"] - st["p_start"] + 1
    # blocked flags gather: a path's 4 move kmers ((k<<2)&KMASK)|{0..3}
    # are CONSECUTIVE prob slots, so viewing probs as [B, 256, 4] rows
    # fetches all 4 with ONE index (row k & 255) — and the stay prob is
    # row k>>2 lane k&3, the fm-bin threshold row bin>>2 lane bin&3 of a
    # 4-wide threshold block appended after the 256 prob rows.  One F=4
    # gather of K=3P rows replaces the old K=6P scalar gather: the
    # one-hot build (~H compares/idx, docs/PERF.md) amortizes 4 ways.
    NT = idx["threshes"].shape[0]
    tbl4 = jnp.concatenate(
        [
            probs.reshape(B, KMER_COUNT // 4, 4),
            jnp.broadcast_to(
                idx["threshes"].reshape(NT // 4, 4)[None], (B, NT // 4, 4)
            ),
        ],
        axis=1,
    )
    fm_bin = _fm_bin(fmlen)
    allk3 = jnp.concatenate(
        [
            st["p_kmer"] >> 2,
            st["p_kmer"] & (KMER_COUNT // 4 - 1),
            (KMER_COUNT // 4) + (fm_bin >> 2),
        ],
        axis=1,
    )
    g3 = _row_gather(tbl4, allk3, p.mxu)  # [B, 3P, 4]
    lane = lambda g4, j: jnp.sum(
        jnp.where(
            jax.lax.broadcasted_iota(i32, g4.shape, 2) == j[:, :, None],
            g4, f32(0),
        ),
        axis=2,
    )  # exact: exactly one lane selected (NaN payloads pass through)
    stay_p = lane(g3[:, :P], st["p_kmer"] & 3)
    mv_p = g3[:, P : 2 * P]
    thresh = lane(g3[:, 2 * P :], fm_bin & 3)
    stay_f = pv & (st["p_consec"] < p.max_consec_stay) & (stay_p >= thresh)
    # polarity parity: the reference skips a move when prob < thresh
    # (mapper.cpp:489), so a NaN threshold (possible in fitted .uncl files,
    # parsed by C++ stof) ACCEPTS all moves while the stay's `>=` gate
    # (mapper.cpp:471) rejects. ~(a < b) != (a >= b) under NaN.
    mv_f = pv[:, :, None] & ~(mv_p < thresh[:, :, None])
    flags = jnp.concatenate([stay_f[:, :, None], mv_f], axis=2)  # [B,P,5]

    # ---- compact to C candidate slots in creation order ----
    flat = flags.reshape(B, P * 5)
    pos = jnp.cumsum(flat, axis=1, dtype=i32) - flat
    cidx, cval = _compact_idx(flat, CE)  # cidx = flat code of j-th flag
    cpar = jnp.where(cval, cidx // 5, P)  # invalid -> P keeps cpar sorted
    move = jnp.where(cval, cidx % 5, 0)  # 0 = stay, 1..4 = move base+1
    cpar_g = jnp.minimum(cpar, P - 1)

    # ---- gather parent state, FM-extend the moves ----
    # the two ring slots every child needs (cum at tot, window start at
    # (tot+1-SL)) are PARENT-level quantities: read them per path with
    # cheap one-hot sums, then let the two scalars ride the packed gather
    # instead of hauling the whole 23-slot ring per candidate
    cumnow_p = _ring_read(st["p_cum"], st["p_total"] % RING)
    wslot_p = jnp.where(
        st["p_total"] + 1 >= SL, (st["p_total"] + 1 - SL) % RING, 0
    )
    wstart_p = _ring_read(st["p_cum"], wslot_p)
    cs, ce, ck, ctot, ccons, cmvs, csa, ccum, cwst = _pack_gather(
        [st["p_start"], st["p_end"], st["p_kmer"], st["p_total"],
         st["p_consec"], st["p_moves"], st["p_sa"], cumnow_p, wstart_p],
        cpar_g,
        mxu=p.mxu,
    )

    is_mv = move >= 1
    base = jnp.clip(move - 1, np.int32(0), np.int32(3))
    nk = jnp.where(is_mv, ((ck << 2) & KMASK) | base, ck)
    ns_m, ne_m = _extend(idx, cs, ce, base)
    ns = jnp.where(is_mv, ns_m, cs)
    ne = jnp.where(is_mv, ne_m, ce)
    cv_fm = cval & ((~is_mv) | (ns <= ne))
    # exact budget: the reference appends only FM-valid candidates and
    # breaks at max_paths appended (mapper.cpp:455-520)
    vpos = jnp.cumsum(cv_fm, axis=1, dtype=i32) - cv_fm
    cvalid = cv_fm & (vpos < C)
    total_valid_fm = jnp.sum(cv_fm, axis=1, dtype=i32)

    prob = _row_gather(probs, nk, p.mxu)
    new_tot = ctot + 1
    newcum = ccum + prob  # f32, same op order as sums_[l] = sums_[l-1]+prob
    seedprob = jnp.where(
        new_tot >= SL,
        (newcum - cwst) / f32(SL),
        newcum / new_tot.astype(f32),
    )
    nmoves = ((cmvs << 1) | is_mv.astype(i32)) & PATH_MASK
    nmoves = jnp.where(ctot >= SL, nmoves | TAIL_MOVE, nmoves)
    nconsec = jnp.where(is_mv, 0, ccons + 1)

    # ---- ended parents (no children, not yet reported; mapper.cpp:513-519)
    # a child only counts if its FM extension is valid (mapper.cpp:486-510:
    # invalid ranges are discarded before child_found is set).  Since
    # compaction preserves creation order, parent p's candidates occupy
    # the compacted slot range [pos[5p], pos[5(p+1)]) — so the number of
    # budget-kept valid children is a difference of the cv_fm exclusive
    # cumsum (clamped at C) at the block boundaries: no sort-based
    # membership needed, just two more columns on the vb gather.
    # budget-cut parity: when the candidate budget fills, the reference
    # breaks out of the parent loop entirely (mapper.cpp:455-520), so
    # parents not yet reached never run their ended-seed check. A parent is
    # reached iff fewer than C *valid* candidates were appended before its
    # first slot (valid count at its compacted flag position).
    k_i = pos[:, ::5]  # compacted position of each parent's stay slot
    n_flags = pos[:, -1] + flat[:, -1].astype(i32)  # total flags this event
    k_next = jnp.concatenate([k_i[:, 1:], n_flags[:, None]], axis=1)
    vpos_pad = jnp.concatenate([vpos, total_valid_fm[:, None]], axis=1)
    vb2 = _row_gather(
        vpos_pad,
        jnp.minimum(jnp.concatenate([k_i, k_next], axis=1), CE),
        p.mxu,
    )
    vb, vb_next = vb2[:, :P], vb2[:, P:]
    child_any = jnp.minimum(vb_next, C) > jnp.minimum(vb, C)
    reached = (k_i < CE) & (vb < C)
    pmc = jax.lax.population_count(st["p_moves"]).astype(i32)
    pseedprob = _path_seedprob(p, st)
    ended = pv & (~child_any) & (~st["p_sa"]) & reached & alive[:, None]
    e_rep = (fmlen <= p.max_rep_copy) & (pmc >= p.min_rep_len)
    e_unique = (
        (fmlen == 1)
        & ((st["p_moves"] & 1) == 1)
        & ((SL - pmc) <= p.max_stay_frac * SL)
    )
    e_valid = (
        ended
        & (jnp.minimum(st["p_total"], SL) == SL)
        & (pseedprob >= p.min_seed_prob)
        & (e_unique | e_rep)
    )
    e_rows = jnp.where(e_valid, jnp.minimum(fmlen, p.max_rep_copy), 0)

    # ---- sort candidates by (fm_start, fm_end, seed_prob) + dedup ----
    k1 = jnp.where(cvalid, ns, INT32_MAX)
    k2 = jnp.where(cvalid, ne, INT32_MAX)
    iota_c = jax.lax.broadcasted_iota(i32, (B, CE), 1)
    # 4th key = creation index: full (start, end, prob) ties keep
    # creation order — the parity rig's pinned STABLE tie order (see
    # oracle.py map_read's sort comment and golden_rig/pdqsort.h); the
    # dedup then keeps the latest-created member of each tied run,
    # matching std::stable_sort byte-for-byte
    k1s, k2s, k3s, perm = jax.lax.sort(
        (k1, k2, seedprob, iota_c), dimension=1, num_keys=4
    )
    svalid = k1s != INT32_MAX
    ns_s, ne_s = k1s, k2s
    seedprob_s = k3s
    # only the fields the seed/source stages read in sorted order ride the
    # perm gather; child-only fields (consec, sa, newcum, parent id, ring)
    # are gathered once at assembly through the composed index perm[child]
    nk_s, prob_s, ntot_s, nmoves_s = _pack_gather(
        [nk, prob, new_tot, nmoves], perm, mxu=p.mxu
    )

    nxt = lambda a, fill: jnp.concatenate(
        [a[:, 1:], jnp.full((B, 1), fill, a.dtype)], axis=1
    )
    dup = (
        svalid
        & nxt(svalid, False)
        & (ns_s == nxt(ns_s, -1))
        & (ne_s == nxt(ne_s, -1))
    )

    # ---- candidate seed validity (non-ended branch of is_seed_valid) ----
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

    # ---- seed rows: ended groups (parent order) then candidates (sorted) ----
    g_st = jnp.concatenate([st["p_start"], ns_s], axis=1)  # [B, P+CE]
    g_rows = jnp.concatenate([e_rows, seed_c.astype(i32)], axis=1)
    g_mc = jnp.concatenate([pmc, smc], axis=1)
    g_evt = jnp.concatenate(
        [
            jnp.broadcast_to((st["evt_i"] - 1)[:, None], (B, P)),
            jnp.broadcast_to(st["evt_i"][:, None], (B, CE)),
        ],
        axis=1,
    )
    g_cum = jnp.cumsum(g_rows, axis=1, dtype=i32)
    total_rows = g_cum[:, -1]
    row_ids = jnp.arange(R, dtype=i32)
    # searchsorted(g_cum, r, side="right") == #elements <= r: a compare-
    # count beats the binary search's 12 serial gather rounds on TPU
    grp = jnp.sum(
        (g_cum[:, :, None] <= row_ids[None, None, :]).astype(i32), axis=1,
        dtype=i32,
    )  # [B, R]
    grp = jnp.minimum(grp, P + CE - 1)
    row_ok = (row_ids[None, :] < total_rows[:, None]) & alive[:, None]
    g_cum_prev, g_st_g, row_mc, row_evt = _pack_gather(
        [jnp.concatenate([jnp.zeros((B, 1), i32), g_cum[:, :-1]], axis=1),
         g_st, g_mc, g_evt],
        grp,
        mxu=p.mxu,
    )
    sa_row = g_st_g + (row_ids[None, :] - g_cum_prev)
    sa_row = jnp.clip(sa_row, np.int32(0), np.int32(n))
    if p.sampled_sa:
        ref_en = n - _sa_lookup(idx, sa_row, p.sa_intv)
    else:
        ref_en = n - _shard_take(idx, "sa", sa_row)

    def add_row(r, tstate):
        return _tracker_add(
            p, tstate, ref_en[:, r], row_mc[:, r], row_evt[:, r], row_ok[:, r]
        )

    tstate = {
        k: st[k]
        for k in (
            "cl_valid", "cl_count", "cl_ref_st", "cl_r1", "cl_r2e",
            "cl_evt_st", "cl_evt_en", "cl_total", "len_sum", "n_cl",
            "mm_len", "mm_ref_st", "mm_r1", "mm_r2e", "mm_evt_st", "mm_evt_en",
            "ovf", "ovf_why",
        )
    }
    max_rows = jnp.minimum(jnp.max(jnp.where(alive, total_rows, 0)), R)

    def row_cond(carry):
        r, _ = carry
        return r < max_rows

    def row_body(carry):
        r, ts = carry
        return r + 1, add_row(r, ts)

    _, tstate = jax.lax.while_loop(row_cond, row_body, (jnp.int32(0), tstate))

    # ---- sources (mapper.cpp:544-624) ----
    source_prob = idx["threshes"][0]
    kpass = prob_s >= source_prob
    prev_k = jnp.concatenate([jnp.full((B, 1), -1, i32), nk_s[:, :-1]], axis=1)
    first_seg = svalid & (nk_s != prev_k)
    # segmented running max of fm_end: associative scan over (segment id,
    # running max) pairs in i32 (no f64/i64 emulation on TPU)
    seg_id = jnp.cumsum(first_seg, axis=1, dtype=i32)

    def _segmax(a, b):
        sa, ma = a
        sb, mb = b
        return sb, jnp.where(sa == sb, jnp.maximum(ma, mb), mb)

    _, run_end = jax.lax.associative_scan(_segmax, (seg_id, ne_s), axis=1)

    km_rng = _shared_gather(idx["kmer_rng2"], nk_s, p.mxu)  # [B, CE, 2]
    km_st = km_rng[:, :, 0]
    km_en = km_rng[:, :, 1]
    head_st = km_st
    head_en = ns_s - 1
    head_v = first_seg & kpass & (head_st <= head_en)

    nxt_same = nxt(svalid, False) & (nxt(nk_s, -1) == nk_s)
    gap_st = run_end + 1
    gap_en = jnp.where(nxt_same, nxt(ns_s, 0) - 1, km_en)
    gap_v = svalid & (~dup) & kpass & (gap_st <= gap_en)

    # presence of a k-mer among candidates: the sorted set {nk_s[svalid]}
    # equals the unsorted {nk[cvalid]}, so a broadcast-compare any-reduce
    # (XLA fuses it; no materialized [B, CE, 1024]) replaces the old
    # two-sort _member and has no dependency on the sort (better ILP)
    present = jnp.any(
        (nk[:, :, None]
         == jax.lax.broadcasted_iota(i32, (1, 1, KMER_COUNT), 2))
        & cvalid[:, :, None],
        axis=1,
    )
    full_v = (
        (~present)
        & (probs >= source_prob)
        & (idx["kmer_st"] <= idx["kmer_en"])[None, :]
    )

    # ---- assemble the new path table in the reference's creation order:
    # children (sorted, deduped), head/gap sources interleaved, full sources
    child_keep = svalid & (~dup)
    n_cands = jnp.sum(svalid.astype(i32), axis=1, dtype=i32)
    # source budget parity: the reference's budget_left() counts ALL sorted
    # candidates (including dups) plus sources created so far against
    # max_paths (mapper.cpp:544-624), so source slots start at n_cands.
    # children occupy slots [0, n_nondup) and n_nondup <= n_cands, so the
    # two regions never collide; gaps stay empty (p_total==0) and vanish
    # from the next event's creation order just like the reference's list.
    # source field streams in creation order (head/gap interleaved by
    # candidate, then full-range by k-mer) -- pure elementwise builds
    hg_v = jnp.stack([head_v, gap_v], axis=2).reshape(B, 2 * CE)
    src_concat = jnp.concatenate([hg_v, full_v], axis=1)
    inter = lambda h, g: jnp.stack(
        [h, jnp.broadcast_to(g, h.shape)], axis=2
    ).reshape(B, 2 * CE)
    kmer_row = jnp.broadcast_to(
        jnp.arange(KMER_COUNT, dtype=i32)[None, :], (B, KMER_COUNT)
    )
    bc_i32 = lambda a: jnp.broadcast_to(a, (B, KMER_COUNT)).astype(i32)
    src_start = jnp.concatenate([inter(head_st, gap_st), bc_i32(idx["kmer_st"][None, :])], axis=1)
    src_end = jnp.concatenate([inter(head_en, gap_en), bc_i32(idx["kmer_en"][None, :])], axis=1)
    src_kmer = jnp.concatenate([inter(nk_s, nk_s), kmer_row], axis=1)
    src_prob = jnp.concatenate(
        [inter(prob_s, prob_s), probs.astype(jnp.float32)], axis=1
    )

    # merge children + sources into the new table by GATHER: slot j holds
    # child j' (j < n_nondup) or source k=j-n_cands (reference budget layout)
    child_src, child_ok = _compact_idx(child_keep, P)
    src_src, src_ok = _compact_idx(src_concat, P)
    out_j = jnp.arange(P, dtype=i32)[None, :]
    as_child = child_ok
    k_src = jnp.clip(out_j - n_cands[:, None], np.int32(0), np.int32(P - 1))
    src_of, src_hit = _pack_gather([src_src, src_ok], k_src, mxu=p.mxu)
    src_okj = src_hit & (out_j >= n_cands[:, None])
    # child fields in two hops: sorted-order fields by child_src, then
    # candidate-order (pre-sort) fields by the composed index
    # ci = perm[child_src]; the parent ring is gathered ONCE per event,
    # straight from the path table via the composed parent id
    c_start, c_end, c_kmer, c_tot, c_mvs, c_seedc, ci = _pack_gather(
        [ns_s, ne_s, nk_s, ntot_s, nmoves_s, seed_c, perm],
        child_src,
        mxu=p.mxu,
    )
    c_cons, c_sa0, c_newcum, c_par, c_prob = _pack_gather(
        [nconsec, csa, newcum, cpar_g, prob], ci, mxu=p.mxu
    )
    c_sa = c_sa0 | c_seedc
    (child_ring0,) = _pack_gather([], c_par, rings=[st["p_cum"]], mxu=p.mxu)
    ring_iota_p = jax.lax.broadcasted_iota(i32, (B, P, RING), 2)
    child_ring = jnp.where(
        ring_iota_p == (c_tot % RING)[:, :, None],
        c_newcum[:, :, None],
        child_ring0,
    )
    s_start, s_end, s_kmer, s_prob = _pack_gather(
        [src_start, src_end, src_kmer, src_prob], src_of, mxu=p.mxu
    )
    np_start = jnp.where(as_child, c_start, jnp.where(src_okj, s_start, 0))
    np_end = jnp.where(as_child, c_end, jnp.where(src_okj, s_end, -1))
    np_kmer = jnp.where(as_child, c_kmer, jnp.where(src_okj, s_kmer, 0))
    np_total = jnp.where(as_child, c_tot, src_okj.astype(i32))
    np_consec = jnp.where(as_child, c_cons, 0)
    np_moves = jnp.where(as_child, c_mvs, src_okj.astype(i32))
    np_sa = jnp.where(as_child, c_sa, False)
    # cum ring: children copied the parent ring (with the new slot written)
    # in the packed gather above; sources are zeros with slot 1 = prob
    # (total=1, slot 0 stays 0)
    src_ring = (
        jax.lax.broadcasted_iota(i32, (1, 1, RING), 2) == 1
    ) * jnp.where(src_okj, s_prob, 0.0)[:, :, None]
    np_cum = jnp.where(as_child[:, :, None], child_ring, src_ring).astype(
        jnp.float32
    )

    new_paths = {
        "p_start": np_start,
        "p_end": np_end,
        "p_kmer": np_kmer,
        "p_total": np_total,
        "p_consec": np_consec,
        "p_moves": np_moves,
        "p_sa": np_sa,
        "p_cum": np_cum,
    }

    # ---- merge, decide, advance lifecycle ----
    out = dict(st)
    for k, v in new_paths.items():
        m = alive
        while m.ndim < v.ndim:
            m = m[..., None]
        out[k] = jnp.where(m, v, st[k])
    for k, v in tstate.items():
        m = alive
        while m.ndim < v.ndim:
            m = m[..., None]
        out[k] = jnp.where(m, v, st[k])

    # budget-overflow detection (conservative): any event where a fixed
    # width cut work the reference's unbounded/10000-path loop would do.
    # No flag => this read's result provably equals the wide engine's.
    n_src = jnp.sum(src_concat.astype(i32), axis=1, dtype=i32)
    n_flags = jnp.sum(flat.astype(i32), axis=1, dtype=i32)
    ovf_ev = (
        (n_flags > CE)
        | (total_valid_fm > C)
        | ((n_cands + n_src) > P)
        | (total_rows > R)
    )
    out["ovf"] = out["ovf"] | (ovf_ev & alive)
    why = (
        jnp.where(n_flags > CE, np.int32(2), np.int32(0))
        | jnp.where(total_valid_fm > C, np.int32(4), np.int32(0))
        | jnp.where((n_cands + n_src) > P, np.int32(8), np.int32(0))
        | jnp.where(total_rows > R, np.int32(16), np.int32(0))
    )
    out["ovf_why"] = out["ovf_why"] | jnp.where(alive, why, np.int32(0))
    upd = lambda cur, v: jnp.maximum(cur, jnp.where(alive, v, np.int32(0)))
    out["dm_flags"] = upd(st["dm_flags"], n_flags)
    out["dm_valid"] = upd(st["dm_valid"], total_valid_fm)
    out["dm_paths"] = upd(st["dm_paths"], n_cands + n_src)
    out["dm_rows"] = upd(st["dm_rows"], total_rows)
    out["dm_cl"] = jnp.maximum(st["dm_cl"], jnp.where(alive, out["n_cl"], np.int32(0)))

    dec = _tracker_decide(p, out) & alive
    out["done"] = st["done"] | dec
    out["success"] = st["success"] | dec
    out["dec_evt"] = jnp.where(dec, st["evt_i"], st["dec_evt"])
    out["evt_i"] = st["evt_i"] + alive.astype(i32)
    dbg = {
        "seed_ref_en": jnp.where(row_ok, ref_en, -1),
        "seed_mc": row_mc,
        "seed_evt": row_evt,
        "seed_rows": total_rows,
        "n_paths": jnp.sum((new_paths["p_total"] > 0).astype(i32), axis=1, dtype=i32),
        "n_cand": jnp.sum(cvalid.astype(i32), axis=1, dtype=i32),
        "dec": dec,
        # path-DAG tap for the _paths.tsv dump (mapper.cpp:1016-1078):
        # parent slot id in the PREVIOUS table (P = no parent / source)
        # plus the per-event path-table snapshot (all dead code under
        # debug=False; XLA DCEs it out of the production step)
        "p_parent": jnp.where(as_child, c_par, P),
        "p_prob": jnp.where(
            as_child, c_prob, jnp.where(src_okj, s_prob, 0.0)
        ),
        "p_fm_start": new_paths["p_start"],
        "p_fm_len": new_paths["p_end"] - new_paths["p_start"] + 1,
        "p_kmer": new_paths["p_kmer"],
        "p_total": new_paths["p_total"],
        "p_moves": new_paths["p_moves"],
    }
    return out, dbg


def _path_seedprob(p: EngineParams, st):
    """Recompute each live path's seed_prob_ from the cumulative-sum ring
    (identical f32 ops to the values stored at child creation)."""
    jnp = _jnp()
    SL = p.seed_len
    RING = SL + 1
    tot = st["p_total"]
    cum_now = _ring_read(st["p_cum"], tot % RING)
    wslot = jnp.where(tot >= SL, (tot - SL) % RING, 0)
    wstart = _ring_read(st["p_cum"], wslot)
    return jnp.where(
        tot >= SL,
        (cum_now - wstart) / jnp.float32(SL),
        cum_now / jnp.maximum(tot, 1).astype(jnp.float32),
    )


def _tracker_decide(p: EngineParams, st):
    """SeedTracker::get_final (seed_tracker.cpp:129-143).

    Float divisions are left unguarded on purpose: the reference divides by
    zero in C++ (inf/nan), and inf >= thresh / nan >= thresh compare the
    same way in XLA f32.
    """
    jnp = _jnp()
    import jax

    NEG = jnp.int32(-(2**30))
    tot = jnp.where(st["cl_count"], st["cl_total"], NEG)
    CL = tot.shape[1]
    first_i = jax.lax.argmax(tot, 1, jnp.int32)
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, tot.shape, 1) == first_i[:, None],
        NEG,
        tot,
    )
    second = jnp.max(masked, axis=1)
    top = st["mm_len"].astype(jnp.float32)
    mean = st["len_sum"] / st["n_cl"].astype(jnp.float32)
    n_lens = jnp.sum(st["cl_count"], axis=1, dtype=jnp.int32)  # all_lens incl. zombies
    ok = (st["mm_len"] >= p.min_aln_len) & (n_lens >= 2)
    conf = jnp.zeros_like(ok)
    if p.min_mean_conf > 0:
        conf |= top / mean >= p.min_mean_conf
    if p.min_top_conf > 0:
        conf |= top / second.astype(jnp.float32) >= p.min_top_conf
    return ok & conf


# ---------------------------------------------------------------------------
# block advance + host wrapper
# ---------------------------------------------------------------------------

def advance_block(idx, p: EngineParams, state, means, on, debug=False):
    """Advance all read slots through T events: means/on are [B, T].

    on[b, t] marks a real event for slot b at step t (slots may have fewer
    events than T in this block; finished reads stop consuming).
    """
    import jax

    def step(st, inp):
        ev, ev_on = inp
        st2, dbg = _event_step(idx, p, st, ev, ev_on)
        return st2, (dbg if debug else None)

    ins = (means.T, on.T)  # [T, B]
    state, dbg = jax.lax.scan(step, state, ins)
    return (state, dbg) if debug else state


class MapEngine:
    """Host wrapper: owns the device index + jitted block step.

    Usage:
        eng = MapEngine(fmi, model, threshes, conf)
        state = eng.fresh_state()
        state = eng.advance(state, means, on)   # [B, T] f32 / bool
        host  = eng.readout(state)              # numpy dict
    """

    def __init__(self, fmi, model, threshes, conf: Conf | None = None, **over):
        import jax

        self.conf = conf or Conf()
        over.setdefault("mxu", jax.default_backend() == "tpu")
        self.params = EngineParams.from_conf(self.conf, **over)
        self.fmi = fmi
        self.model = model
        self.idx = device_index(
            fmi, threshes, model,
            sampled_sa=self.params.sampled_sa, sa_intv=self.params.sa_intv,
        )
        p = self.params

        # index tables ride as jit ARGUMENTS, not closure constants:
        # embedded-constant programs serialized to 160+ MB persistent-
        # cache entries whose keys did NOT hit across processes (three
        # identical runs compiled the same advance three times, ~128 s
        # each over the remote tunnel); argument tables hash by shape
        self._tables = {
            k: v for k, v in self.idx.items() if not isinstance(v, int)
        }
        meta = {k: v for k, v in self.idx.items() if isinstance(v, int)}

        def _adv(state, means, on, tables):
            return advance_block(dict(tables, **meta), p, state, means, on)

        self._advance = jax.jit(_adv, donate_argnums=(0,))
        # reset must be jitted: eagerly it dispatches ~30 table-sized ops
        # per refill over the (remote) device link, and refills happen
        # nearly every block while reads churn
        self._reset = jax.jit(reset_rows, donate_argnums=(0,))

    def fresh_state(self):
        return make_state(self.params)

    def reset_slots(self, state, mask):
        import jax.numpy as jnp

        return self._reset(state, jnp.asarray(mask))

    def advance(self, state, means, on):
        import jax.numpy as jnp

        means = jnp.asarray(means, dtype=jnp.float32)
        on = jnp.asarray(on, dtype=bool)
        return self._advance(state, means, on, self._tables)

    READOUT_KEYS = (
        "done", "success", "dec_evt", "evt_i", "ovf", "ovf_why",
        "dm_flags", "dm_valid", "dm_paths", "dm_rows", "dm_cl",
        "mm_len", "mm_ref_st", "mm_r1", "mm_r2e", "mm_evt_st", "mm_evt_en",
    )

    def readout_start(self, state):
        """Dispatch the packed [K, B] readout (async, no host block).

        Splitting dispatch from fetch lets the host loop pipeline: it
        dispatches the NEXT advance before fetching this block's
        readout, so DSP/finalize/refill overlap device compute."""
        import jax

        keys = self.READOUT_KEYS
        if not hasattr(self, "_readout_pack"):
            import jax.numpy as jnp

            def _pack(st):
                return jnp.stack(
                    [st[k].astype(jnp.int32) for k in keys]
                )

            self._readout_pack = jax.jit(_pack)
        return self._readout_pack(state)

    def readout_get(self, packed):
        """Block on a :meth:`readout_start` handle -> host numpy dict.
        One device_get round trip per block (the link is remote)."""
        import jax

        out = dict(zip(self.READOUT_KEYS, np.asarray(jax.device_get(packed))))
        for k in ("done", "success", "ovf"):
            out[k] = out[k].astype(bool)
        return out

    def readout(self, state):
        """Pull per-read lifecycle + decision fields to host numpy."""
        return self.readout_get(self.readout_start(state))
