"""VMEM-resident seed-tracker kernel (Pallas TPU).

The engine folds ``engine._tracker_add`` over the per-event seed rows
with a ``lax.while_loop`` whose trip count is the BATCH max row count
(~50-90 on honest reads even though the per-read mean is ~1.2) and
whose per-trip working set is the full [B, CL] cluster table in HBM —
measured 2.1 ms/event at B=256, CL=2048, ~10% of the whole step
(docs/PERF.md).  This kernel keeps each 8-read block's cluster tables
in VMEM and loops a DYNAMIC per-block trip count (the block's own max
rows, scalar-prefetched), so the burst read pays for its own rows
without dragging the other 248 reads through them: measured
0.037 ms/call on v5e — ~55x the while_loop.

Bit-exact contract: folding this kernel equals folding _tracker_add
row by row (tests/test_tracker_kernel.py, interpret mode).  All
arithmetic is i32 (exact) except len_sum, which replays the same f32
op order.  Reference semantics: SeedTracker::add_seed
(seed_tracker.cpp:157-232) + SeedCluster::update (:56-73).

Mosaic rules obeyed (docs/PERF.md): i32 loop carries only (i1 carries
fail to legalize), np.int32 constants in BlockSpec index maps under
x64, no dynamic lane-dim slicing (row scalars come out of the [RB, R]
streams via one-hot masked sums), lax.div for the de//12 bound (trunc
vs floor only differs at de<0, where the e1<=e2 conjunct is already
False).
"""

from __future__ import annotations

import functools

import numpy as np

RB = 8  # reads per grid block

_NEG = np.int32(-(2**30))

# scalar lanes in the packed [B, 16] i32 scalar array
_SCALARS = (
    "len_sum",  # f32 bits
    "n_cl", "mm_len", "mm_ref_st", "mm_r1", "mm_r2e", "mm_evt_st",
    "mm_evt_en", "ovf", "ovf_why",
)
_NSC = 16  # padded lane count


def _fold_row(carry, ref_en, mc, e2, ok, iota_cl, CL, min_aln_len):
    """One seed-row update of the tracker carry (shared by both kernels);
    semantics == engine._tracker_add for one row (bit-exact)."""
    import jax
    import jax.numpy as jnp

    i32, f32 = jnp.int32, jnp.float32
    TWELVE = np.int32(12)
    Z = np.int32(0)
    ONE = np.int32(1)
    (v, c, rst, r1, r2e_t, est, e1, tot,
     len_bits, n_cl, mm_len, mm_rst, mm_r1, mm_r2e, mm_est, mm_e1,
     ovf, ovfw) = carry

    r2 = ref_en - mc + ONE   # new.ref_en_start
    r2e = ref_en             # new.ref_en_end

    vb = v > Z
    cb = c > Z
    considered = vb & ((r1 < r2) | ((r1 == r2) & (e1 <= e2)))
    dr = r2 - r1
    de = e2 - e1
    in_range = (e1 <= e2) & (dr <= de) & (dr >= jax.lax.div(de, TWELVE))
    elig = considered & in_range

    # the reference scan's pick: max total, ties -> largest r1,
    # then largest evt_en, then FIRST index
    m1 = jnp.max(jnp.where(elig, tot, _NEG), axis=1, keepdims=True)
    t1 = elig & (tot == m1)
    m2 = jnp.max(jnp.where(t1, r1, _NEG), axis=1, keepdims=True)
    t2 = t1 & (r1 == m2)
    m3 = jnp.max(jnp.where(t2, e1, _NEG), axis=1, keepdims=True)
    t3 = t2 & (e1 == m3)
    any_match = (
        jnp.max(jnp.where(elig, ONE, Z), axis=1, keepdims=True) > Z
    ) & ok
    match_idx = jnp.min(
        jnp.where(t3, iota_cl, np.int32(CL)), axis=1, keepdims=True
    )
    onehot = (iota_cl == match_idx) & any_match

    # SeedCluster::update
    overlaps = r2 < r2e_t
    grows = r2e > r2e_t
    growth = jnp.where(
        overlaps, jnp.where(grows, r2e - r2e_t, Z), mc
    )
    new_r1 = jnp.where(onehot, r2, r1)
    new_r2e = jnp.where(onehot & (grows | ~overlaps), r2e, r2e_t)
    new_e1 = jnp.where(onehot, e2, e1)
    new_tot = jnp.where(onehot, tot + growth, tot)
    upd_len = jnp.sum(
        jnp.where(onehot, growth, Z), axis=1, keepdims=True, dtype=i32
    )

    # set-reinsertion zombie (oracle.py:168-173)
    coll = jnp.max(
        jnp.where(
            vb & (~onehot) & (r1 == r2) & (e1 == e2), ONE, Z
        ),
        axis=1, keepdims=True,
    ) > Z
    lost = any_match & coll

    # insertion: free slot else evict the smallest occupant
    do_insert = ok & ~any_match
    free = ~cb
    evict_key = jnp.where(free, _NEG, tot)
    mke = jnp.min(evict_key, axis=1, keepdims=True)
    ins_idx = jnp.min(
        jnp.where(evict_key == mke, iota_cl, np.int32(CL)),
        axis=1, keepdims=True,
    )
    ins1h = (iota_cl == ins_idx) & do_insert
    evicted_len = jnp.sum(
        jnp.where(ins1h & cb, tot, Z), axis=1, keepdims=True,
        dtype=i32,
    )
    evicted_n = jnp.sum(
        jnp.where(ins1h & vb, ONE, Z), axis=1, keepdims=True,
        dtype=i32,
    )
    evict = do_insert & ~(
        jnp.max(jnp.where(free, ONE, Z), axis=1, keepdims=True) > Z
    )
    ovf2 = jnp.where(evict, ONE, ovf)
    ovfw2 = ovfw | jnp.where(evict, ONE, Z)

    v2 = jnp.where(
        ins1h | ((vb & ~(lost & onehot)) & ~ins1h), ONE, Z
    )
    c2 = jnp.where(cb | ins1h, ONE, Z)
    r1_2 = jnp.where(ins1h, r2, new_r1)
    r2e_2 = jnp.where(ins1h, r2e, new_r2e)
    rst_2 = jnp.where(ins1h, r2, rst)
    est_2 = jnp.where(ins1h, e2, est)
    e1_2 = jnp.where(ins1h, e2, new_e1)
    tot_2 = jnp.where(ins1h, mc, new_tot)

    len_sum = jax.lax.bitcast_convert_type(len_bits, f32)
    len_sum2 = (
        len_sum
        + jnp.where(any_match, upd_len, Z).astype(f32)
        + jnp.where(do_insert, mc, Z).astype(f32)
        - evicted_len.astype(f32)
    )
    n_cl2 = (
        n_cl
        + jnp.where(do_insert, ONE, Z)
        - evicted_n
        - jnp.where(lost, ONE, Z)
    )

    sum1h = lambda a: jnp.sum(
        jnp.where(onehot, a, Z), axis=1, keepdims=True, dtype=i32
    )
    cand_len = jnp.where(
        any_match, sum1h(new_tot),
        jnp.where(do_insert, mc, _NEG),
    )
    # no select_n over i1 operands (Mosaic: "Unsupported target
    # bitwidth for truncation" inside the full step program)
    changed = (any_match & (upd_len > Z)) | (~any_match & do_insert)
    better = (
        changed & (cand_len >= np.int32(min_aln_len))
        & (cand_len > mm_len)
    )
    sel = lambda cur, upd_cl, row: jnp.where(
        better, jnp.where(any_match, sum1h(upd_cl), row), cur
    )
    mm_len2 = jnp.where(better, cand_len, mm_len)
    mm_rst2 = sel(mm_rst, rst_2, r2)
    mm_r1_2 = sel(mm_r1, r1_2, r2)
    mm_r2e2 = sel(mm_r2e, r2e_2, r2e)
    mm_est2 = sel(mm_est, est_2, e2)
    mm_e1_2 = sel(mm_e1, e1_2, e2)

    return (v2, c2, rst_2, r1_2, r2e_2, est_2, e1_2, tot_2,
            jax.lax.bitcast_convert_type(len_sum2, i32), n_cl2,
            mm_len2, mm_rst2, mm_r1_2, mm_r2e2, mm_est2, mm_e1_2,
            ovf2, ovfw2)


def _kernel(nrows_ref, ren_ref, mc_ref, evt_ref, ok_ref, sc_ref,
            v_ref, c_ref, rst_ref, r1_ref, r2e_ref, est_ref, e1_ref,
            tot_ref,
            sco_ref, vo_ref, co_ref, rsto_ref, r1o_ref, r2eo_ref,
            esto_ref, e1o_ref, toto_ref, *, CL, R, min_aln_len):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    nb = pl.program_id(0)
    n = nrows_ref[nb]
    iota_cl = jax.lax.broadcasted_iota(i32, (RB, CL), 1)
    iota_r = jax.lax.broadcasted_iota(i32, (RB, R), 1)
    Z = np.int32(0)

    def body(r, carry):
        rowm = iota_r == r
        pick = lambda ref: jnp.sum(
            jnp.where(rowm, ref[...], Z), axis=1, keepdims=True,
            dtype=i32,
        )
        return _fold_row(
            carry, pick(ren_ref), pick(mc_ref), pick(evt_ref),
            pick(ok_ref) > Z, iota_cl, CL, min_aln_len,
        )

    _run_fold(body, n, sc_ref,
              (v_ref, c_ref, rst_ref, r1_ref, r2e_ref, est_ref, e1_ref,
               tot_ref),
              sco_ref,
              (vo_ref, co_ref, rsto_ref, r1o_ref, r2eo_ref, esto_ref,
               e1o_ref, toto_ref))


def _kernel_c(nrows_ref, ren_ref, mc_ref, evt_ref, sc_ref,
              v_ref, c_ref, rst_ref, r1_ref, r2e_ref, est_ref, e1_ref,
              tot_ref,
              sco_ref, vo_ref, co_ref, rsto_ref, r1o_ref, r2eo_ref,
              esto_ref, e1o_ref, toto_ref, *, CL, RT, min_aln_len):
    """Compact-stream variant: row scalars come straight from the [1, RT]
    compacted per-event row arrays via per-read dynamic offsets (scalar
    lanes 10/11 of sc: row start st_w and effective row count), so the
    caller never materializes the [B, R] row expansion (the 262k-index
    row-feed gather measured ~0.9 ms/event at R=1024)."""
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    nb = pl.program_id(0)
    n = nrows_ref[nb]
    iota_cl = jax.lax.broadcasted_iota(i32, (RB, CL), 1)
    iota_rt = jax.lax.broadcasted_iota(i32, (RB, RT), 1)
    iota_sc = jax.lax.broadcasted_iota(i32, (RB, _NSC), 1)
    Z = np.int32(0)
    sc = sc_ref[...]
    lane = lambda j: jnp.sum(
        jnp.where(iota_sc == np.int32(j), sc, Z), axis=1, keepdims=True,
        dtype=i32,
    )
    stw = lane(10)       # [RB, 1] per-read row start in the compact space
    rows_eff = lane(11)  # [RB, 1] effective row count (alive-masked)

    def body(r, carry):
        idxs = stw + r
        m = iota_rt == idxs
        pick = lambda ref: jnp.sum(
            jnp.where(m, jnp.broadcast_to(ref[...], (RB, RT)), Z),
            axis=1, keepdims=True, dtype=i32,
        )
        ok = r < rows_eff
        return _fold_row(
            carry, pick(ren_ref), pick(mc_ref), pick(evt_ref), ok,
            iota_cl, CL, min_aln_len,
        )

    _run_fold(body, n, sc_ref,
              (v_ref, c_ref, rst_ref, r1_ref, r2e_ref, est_ref, e1_ref,
               tot_ref),
              sco_ref,
              (vo_ref, co_ref, rsto_ref, r1o_ref, r2eo_ref, esto_ref,
               e1o_ref, toto_ref))


def _run_fold(body, n, sc_ref, in_refs, sco_ref, out_refs):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    Z = np.int32(0)
    iota_sc = jax.lax.broadcasted_iota(i32, (RB, _NSC), 1)
    sc = sc_ref[...]
    lane = lambda j: jnp.sum(
        jnp.where(iota_sc == np.int32(j), sc, Z), axis=1, keepdims=True,
        dtype=i32,
    )
    init = tuple(r[...] for r in in_refs) + tuple(
        lane(j) for j in range(10)
    )
    out = jax.lax.fori_loop(np.int32(0), n, body, init)
    for ref, val in zip(out_refs, out[:8]):
        ref[...] = val
    scl = out[8:]
    packed = scl[0] * (iota_sc == Z).astype(i32)
    for j in range(1, 10):
        packed = packed + scl[j] * (iota_sc == np.int32(j)).astype(i32)
    sco_ref[...] = packed


# module-level handle set by _build/_build_c before the kernels trace,
# so CPU-only imports of this module never touch pallas
pl = None


@functools.cache
def _build(B, CL, R, min_aln_len, interpret):
    global pl
    import jax
    from jax.experimental import pallas as _p
    from jax.experimental.pallas import tpu as pltpu

    pl = _p
    NB = B // RB
    i0 = np.int32(0)
    row_spec = pl.BlockSpec((RB, R), lambda b, *_: (b, i0))
    cl_spec = pl.BlockSpec((RB, CL), lambda b, *_: (b, i0))
    sc_spec = pl.BlockSpec((RB, _NSC), lambda b, *_: (b, i0))
    fn = pl.pallas_call(
        functools.partial(_kernel, CL=CL, R=R, min_aln_len=min_aln_len),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[row_spec] * 4 + [sc_spec] + [cl_spec] * 8,
            out_specs=[sc_spec] + [cl_spec] * 8,
        ),
        out_shape=[jax.ShapeDtypeStruct((B, _NSC), np.int32)]
        + [jax.ShapeDtypeStruct((B, CL), np.int32)] * 8,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return fn


@functools.cache
def _build_c(B, CL, RT, min_aln_len, interpret):
    global pl
    import jax
    from jax.experimental import pallas as _p
    from jax.experimental.pallas import tpu as pltpu

    pl = _p
    NB = B // RB
    i0 = np.int32(0)
    rt_spec = pl.BlockSpec((1, RT), lambda b, *_: (i0, i0))
    cl_spec = pl.BlockSpec((RB, CL), lambda b, *_: (b, i0))
    sc_spec = pl.BlockSpec((RB, _NSC), lambda b, *_: (b, i0))
    fn = pl.pallas_call(
        functools.partial(_kernel_c, CL=CL, RT=RT,
                          min_aln_len=min_aln_len),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[rt_spec] * 3 + [sc_spec] + [cl_spec] * 8,
            out_specs=[sc_spec] + [cl_spec] * 8,
        ),
        out_shape=[jax.ShapeDtypeStruct((B, _NSC), np.int32)]
        + [jax.ShapeDtypeStruct((B, CL), np.int32)] * 8,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return fn


_CL_KEYS = (
    "cl_valid", "cl_count", "cl_ref_st", "cl_r1", "cl_r2e",
    "cl_evt_st", "cl_evt_en", "cl_total",
)


def _pack_sc(st, extra=()):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B = st["n_cl"].shape[0]
    cols = [
        jax.lax.bitcast_convert_type(st["len_sum"].astype(jnp.float32), i32),
        st["n_cl"], st["mm_len"], st["mm_ref_st"], st["mm_r1"],
        st["mm_r2e"], st["mm_evt_st"], st["mm_evt_en"],
        st["ovf"].astype(i32), st["ovf_why"],
    ] + [e.astype(i32) for e in extra]
    sc = jnp.stack(cols, axis=1).astype(i32)
    return jnp.concatenate(
        [sc, jnp.zeros((B, _NSC - sc.shape[1]), i32)], axis=1
    )


def _unpack(outs, st):
    import jax
    import jax.numpy as jnp

    sco = outs[0]
    out = dict(st)
    for k, a in zip(_CL_KEYS, outs[1:]):
        out[k] = a.astype(bool) if st[k].dtype == jnp.bool_ else a
    out["len_sum"] = jax.lax.bitcast_convert_type(sco[:, 0], jnp.float32)
    out["n_cl"] = sco[:, 1]
    out["mm_len"] = sco[:, 2]
    out["mm_ref_st"] = sco[:, 3]
    out["mm_r1"] = sco[:, 4]
    out["mm_r2e"] = sco[:, 5]
    out["mm_evt_st"] = sco[:, 6]
    out["mm_evt_en"] = sco[:, 7]
    out["ovf"] = sco[:, 8] > 0
    out["ovf_why"] = sco[:, 9]
    return out


def tracker_run_compact(min_aln_len, st, rr_ref_en, rr_mc, rr_evt,
                        st_w, rows_eff, interpret=False):
    """Like :func:`tracker_run` but the kernel reads rows straight from
    the compacted [RT] per-event row streams: read b's rows are
    ``rr_*[st_w[b] + 0 .. rows_eff[b]-1]`` — the caller never builds the
    [B, R] expansion.  Bit-identical to the expanded fold."""
    import jax.numpy as jnp

    i32 = jnp.int32
    B, CL = st["cl_valid"].shape
    RT = rr_ref_en.shape[0]
    nrows = jnp.max(rows_eff.reshape(B // RB, RB), axis=1).astype(i32)
    sc = _pack_sc(st, extra=(st_w, rows_eff))
    fn = _build_c(B, CL, RT, int(min_aln_len), interpret)
    outs = fn(
        nrows, rr_ref_en.astype(i32)[None], rr_mc.astype(i32)[None],
        rr_evt.astype(i32)[None], sc,
        st["cl_valid"].astype(i32), st["cl_count"].astype(i32),
        st["cl_ref_st"], st["cl_r1"], st["cl_r2e"], st["cl_evt_st"],
        st["cl_evt_en"], st["cl_total"],
    )
    return _unpack(outs, st)


def tracker_run(min_aln_len, st, ref_en, mc, evt, row_ok, rows_r,
                interpret=False):
    """Fold every seed row of this event into the tracker state.

    Bit-identical to ``lax.while_loop`` of ``engine._tracker_add`` over
    ``max(rows_r)`` trips with per-row ``row_ok`` gating.  ``st`` is the
    tracker-state dict; returns the updated dict (bools restored).
    """
    import jax.numpy as jnp

    i32 = jnp.int32
    B, CL = st["cl_valid"].shape
    R = ref_en.shape[1]
    nrows = jnp.max(
        jnp.minimum(rows_r, np.int32(R)).reshape(B // RB, RB), axis=1
    ).astype(i32)
    sc = _pack_sc(st)
    fn = _build(B, CL, R, int(min_aln_len), interpret)
    outs = fn(
        nrows, ref_en.astype(i32), mc.astype(i32), evt.astype(i32),
        row_ok.astype(i32), sc,
        st["cl_valid"].astype(i32), st["cl_count"].astype(i32),
        st["cl_ref_st"], st["cl_r1"], st["cl_r2e"], st["cl_evt_st"],
        st["cl_evt_en"], st["cl_total"],
    )
    return _unpack(outs, st)
