"""Two-level MXU one-hot gather from a flat shared table (Pallas TPU).

``mxu_gather`` (the per-row one-hot kernel) tops out around N=8k rows:
its one-hot build does ~N/8 VPU compares per index, which crosses XLA's
~10.5 ns/idx gather cost there.  This kernel factors the table
``[N(,F)] -> [H1, H2, F]`` and splits the lookup into

  * level 1 (MXU): ``M = onehot(idx // H2) @ plane`` — a [KC, H1] x
    [H1, H2*F] int8 matmul that pulls each index's H2-row *block*; the
    compares drop to H1 ~ sqrt(N) per index,
  * level 2 (MXU): a constant [F, H2*F] bf16 collapse matmul against the
    ``(idx % H2)``-masked block emits the final [F, KC] values (exact:
    per-plane bytes fit bf16's integer range),

so the per-index cost is ~2*sqrt(N) VPU ops plus N*F/400T seconds of
MXU — under 3 ns/idx for tables up to ~1M rows, ~4-10x faster than the
XLA gather path this size.  int32 payloads ride as four exact signed
byte planes (grid axis 1), f32/u32/bool bitcast, so the gather is
bit-exact.

This is the lookup primitive for POOL-shaped state (flat arrays indexed
across the whole read batch) and big shared tables (occ bucket rows,
flattened per-read prob tables idx = rid * 1024 + kmer).

x64-mode rules as in mxu_gather: lax.div (never ``//``), np.int32
constants in index maps, dtype-pinned sums, rank <= 3, <= 2 dots per
grid step.
"""

from __future__ import annotations

import functools
import os

import numpy as np

_INTERPRET = bool(int(os.environ.get("UNCALLED_MXU_INTERPRET", "0")))

_PLANE_BIAS = np.int32(-0x7F7F7F80)

_VMEM_BUDGET = 11_500_000  # scoped-vmem headroom for the working set


def _pick(n: int, f: int):
    """(KC, H1, H2) for an [n, f]-chunk, or None if it cannot fit.

    KC must be a multiple of 1024 (XLA tiles 1D i32 operands T(1024));
    prefer KC=2048 (halves the ~0.6us/grid-step overhead) with a smaller
    H2*F lane block, falling back to KC=1024 when the [KC, H1] one-hot
    build would blow scoped VMEM."""
    for kc, target in ((2048, 384), (1024, 512)):
        h2 = max(8, _round_up(max(target // f, 8), 8))
        h1 = max(8, _round_up(_cdiv(n, h2), 8))
        vmem = kc * (5 * h1 + 11 * h2 * f) + 4 * h1 * h2 * f
        if vmem <= _VMEM_BUDGET:
            return kc, h1, h2
    return None


def fits(n: int, f: int = 1) -> bool:
    """Can the kernel serve an [n, f]-shaped table? (wide packs split to
    F<=4 chunks, so only the per-chunk width matters)"""
    return _pick(n, min(max(f, 1), F_MAX)) is not None


# Break-even vs the XLA gather, from device traces of the pooled step
# (v5e, round 2): per <=4-field chunk the kernel costs ~2.0 ns x N*F
# (one-hot plane builds + MACs) plus ~3.5 ns x K (select/collapse
# passes).  The XLA row gather runs ~1.5-4.5 ns x K when the table is
# VMEM-resident and ~10 ns x K from HBM; residency is XLA's call, but
# in-step intermediates up to ~21 MB were observed in VMEM (S(1)),
# so the router prices XLA at 3 ns below that size.  1D tables are
# served by the lane-trick row gather (see _take1d), priced the same.
_MXU_NS_PER_NF = 2.0
_MXU_NS_PER_K = 3.5
_VMEM_LIKELY_BYTES = 24_000_000


def _xla_ns_per_k(n: int, f: int) -> float:
    return 3.0 if n * max(f, 1) * 4 <= _VMEM_LIKELY_BYTES else 10.0


def profitable(n: int, f: int = 1, k: int | None = None) -> bool:
    f = max(f, 1)
    if k is None:  # no index count known: old NF heuristic
        return n * f <= 700_000 and fits(n, f)
    chunks = _cdiv(f, F_MAX)
    mxu = chunks * (_MXU_NS_PER_NF * n * min(f, F_MAX) + _MXU_NS_PER_K * k)
    return mxu < _xla_ns_per_k(n, f) * k and fits(n, f)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@functools.cache
def _use_pallas() -> bool:
    import jax

    return jax.default_backend() == "tpu"


# per-call field cap: wider packs split into F<=4 sub-gathers so the
# [KC, H2*F] working set stays within scoped VMEM at the 1024-multiple
# KC blocks the XLA 1D-i32 tiling demands (Mosaic layout T(1024))
F_MAX = 4


def _kernel(t_ref, i_ref, o_ref, a_ref, m_ref, *, H1, H2, F, KC):
    """t_ref: [H1, H2*F] i32 (resident); i_ref: [KC] i32 preclamped;
    o_ref: [F, KC] i32 accumulated over the 4 plane steps;
    a_ref: [KC, H1] i8 scratch (level-1 one-hot);
    m_ref: [KC, H2*F] i8 scratch (level-2 position mask)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    s = pl.program_id(1)  # plane axis, innermost

    @pl.when(s == 0)
    def _build():
        idx = i_ref[...]
        hi = jax.lax.div(idx, np.int32(H2))
        lo = idx - hi * np.int32(H2)
        a_ref[...] = (
            hi[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (KC, H1), 1)
        ).astype(jnp.int8)
        # column x of the flattened [H2, F] block holds (h2=x//F, f=x%F)
        h2pos = jax.lax.div(
            jax.lax.broadcasted_iota(jnp.int32, (KC, H2 * F), 1),
            np.int32(F),
        )
        m_ref[...] = (h2pos == lo[:, None]).astype(jnp.int8)
        o_ref[...] = jnp.full(o_ref.shape, _PLANE_BIAS, jnp.int32)

    plane = ((jnp.right_shift(t_ref[...], s * 8) & 0xFF) - 128).astype(jnp.int8)
    # level 1: each index's H2-row block, [KC, H2*F] i32 (values in
    # [-128, 127]: the one-hot selects exactly one table row-block)
    blk = jax.lax.dot_general(
        a_ref[...], plane, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    masked = (blk * m_ref[...].astype(jnp.int32)).astype(jnp.bfloat16)
    # level 2: constant collapse picks field f from the masked block
    # (bf16 exact for |v| <= 128; exactly one nonzero per (f, k))
    collapse = (
        jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (F, H2 * F), 1),
            np.int32(F),
        )
        == jax.lax.broadcasted_iota(jnp.int32, (F, H2 * F), 0)
    ).astype(jnp.bfloat16)
    g = jax.lax.dot_general(
        collapse, masked, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [F, KC]
    o_ref[...] += jnp.left_shift(g, s * 8)


def _gather_i32(tbl, idx):
    """tbl [N, F] int32, idx [K] int32 (any values; clamped). -> [F, K]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, F = tbl.shape
    if F > F_MAX:
        # split wide packs column-wise; each sub-call reuses the same
        # index vector (the one-hot rebuild is the per-call cost)
        outs = [
            _gather_i32(tbl[:, i : i + F_MAX], idx)
            for i in range(0, F, F_MAX)
        ]
        import jax.numpy as _jnp

        return _jnp.concatenate(outs, axis=0)
    K = idx.shape[0]
    KC, H1, H2 = _pick(N, F)
    Kp = _round_up(max(K, KC), KC)

    idx = jnp.maximum(jnp.minimum(idx.astype(jnp.int32), np.int32(N - 1)), np.int32(0))
    if Kp != K:
        idx = jnp.pad(idx, (0, Kp - K))
    if H1 * H2 != N:
        tbl = jnp.pad(tbl, ((0, H1 * H2 - N), (0, 0)))
    t2 = tbl.reshape(H1, H2 * F)

    Z = np.int32(0)
    kern = functools.partial(_kernel, H1=H1, H2=H2, F=F, KC=KC)
    out = pl.pallas_call(
        kern,
        grid=(Kp // KC, 4),
        in_specs=[
            pl.BlockSpec((H1, H2 * F), lambda j, s: (Z, Z)),
            pl.BlockSpec((KC,), lambda j, s: (j,)),
        ],
        out_specs=pl.BlockSpec((F, KC), lambda j, s: (Z, j)),
        out_shape=jax.ShapeDtypeStruct((F, Kp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((KC, H1), jnp.int8),
            pltpu.VMEM((KC, H2 * F), jnp.int8),
        ],
        interpret=_INTERPRET,
    )(t2, idx)
    return out[:, :K]


# _TAKE1D_LANES: 8 MEASURED best (11.65 ms/event vs 12.20 at L=128 on
# the full step, same harness).  The lane-pad theory (8 -> 128 padded
# rows = 16x table-build tax, so L=128 should win) is FALSIFIED — the
# wider rows cost more in the gather/select than any padding they
# avoid.  Env knob kept as a probe hook.
_TAKE1D_LANES = int(os.environ.get("UNCALLED_TAKE1D_LANES", "8"))
# _take1d's shift/mask arithmetic (L.bit_length()-1, ix & (L-1)) is only
# correct for power-of-two L — fail loudly instead of silently gathering
# wrong elements if a probe run sets a bad value.
if _TAKE1D_LANES <= 0 or (_TAKE1D_LANES & (_TAKE1D_LANES - 1)) != 0:
    raise ValueError(
        f"UNCALLED_TAKE1D_LANES={_TAKE1D_LANES} must be a power of two"
    )
_TAKE1D_MIN_K = 2048
# default OFF: both rowpack layouts MEASURED SLOWER than the plain
# padded-table gather at the bench shape (no-rowpack 12.2 ms/event vs
# row-major 14.4 / field-major 15.1 — the extraction passes cost more
# than the 128/F-padded table build they avoid).  Kept behind the env
# knob as a negative result + probe hook.
_ROWPACK = os.environ.get("UNCALLED_ROWPACK", "0") == "1"


def _take1d(tbl, ix):
    """1D XLA gather via [N/L, L] row gather + lane select.

    The TPU gather emitter serves 2D row gathers at ~1.5-4.5 ns/idx but
    1D gathers at ~7 ns/idx even from VMEM (measured, docs/PERF.md), so
    flat [N] tables are reshaped to L-lane rows and the in-row element
    picked with an exact masked i32 sum.  ``ix`` must be pre-clamped.
    Bit-exact for any 32-bit dtype (i32 bitcast both ways)."""
    import jax
    import jax.numpy as jnp

    from .mxu_gather import _from_i32, _to_i32

    L = _TAKE1D_LANES
    shift = L.bit_length() - 1
    n = tbl.shape[0]
    flat, kind = _to_i32(tbl)
    pad = (-n) % L
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
    rows = jnp.take(flat.reshape(-1, L), ix >> np.int32(shift), axis=0)
    lane = (ix & np.int32(L - 1)).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
    out32 = jnp.sum(
        jnp.where(iota == lane[..., None], rows, np.int32(0)),
        axis=-1, dtype=jnp.int32,
    )
    return _from_i32(out32, kind).reshape(ix.shape)


def flat_gather(tbl, idx, force=None):
    """``out[k(, f)] = tbl[idx[k](, f)]`` for a flat shared table.

    tbl [N] or [N, F] in any 32-bit dtype; idx any integer shape
    (flattened internally).  Bit-exact; out-of-range indices clamp.
    Uses the two-level MXU kernel on TPU while :func:`fits` holds, XLA
    take elsewhere.
    """
    import jax.numpy as jnp

    from .mxu_gather import _from_i32, _to_i32

    f_ = 1 if tbl.ndim == 1 else tbl.shape[1]
    use = (
        force if force is not None
        else _use_pallas() and profitable(tbl.shape[0], f_, idx.size)
    ) and fits(tbl.shape[0], f_)
    kshape = idx.shape
    if not use:
        ix = jnp.clip(idx, 0, tbl.shape[0] - 1)
        if (
            tbl.ndim == 1
            and idx.size >= _TAKE1D_MIN_K
            and _use_pallas()  # TPU-only layout fact
            and tbl.dtype.itemsize == 4
        ):
            return _take1d(tbl, ix)
        return jnp.take(tbl, ix, axis=0)
    squeeze = tbl.ndim == 1
    if squeeze:
        tbl = tbl[:, None]
    t32, kind = _to_i32(tbl)
    out = _from_i32(_gather_i32(t32, idx.reshape(-1)), kind)  # [F, K]
    if squeeze:
        return out[0].reshape(kshape)
    return jnp.moveaxis(out, 0, -1).reshape(*kshape, tbl.shape[1])


def _take_fields_rowpack(tbl, ix, kshape):
    """Row gather of [N, F] i32 with P=2^k logical rows per 128-lane
    physical row ([N/P, P*F]).

    A row-major [N, F] table tiles T(8,128) with the F lanes PADDED to
    128 (traced: the 15-field [98304, 15] pack occupies 50 MB and its
    build relayout-copies the whole padded array), so stack+relayout
    pays a 128/F x write tax.  Packing keeps >= 120/128 lanes full; the
    extraction is _take1d's masked lane select generalized to F fields
    (exact: pure selects/sums).  ``ix`` must be pre-clamped."""
    import jax
    import jax.numpy as jnp

    N, F = tbl.shape
    P, shift = 1, 0
    while P * 2 * F <= 128:
        P, shift = P * 2, shift + 1
    Np = _round_up(N, P)
    t2 = tbl if Np == N else jnp.pad(tbl, ((0, Np - N), (0, 0)))
    # FIELD-major within each physical row (row a = [f0 of P rows | f1
    # of P rows | ...]): each field then extracts from a CONTIGUOUS
    # P-lane window with the one shared [K, P] one-hot — one traversal
    # of the gathered rows for all F outputs.  (Row-major packing needed
    # F strided [K, P] lane slices, each a relayout pass: measured +2
    # ms/event over the unpacked path.)
    t2 = t2.reshape(Np // P, P, F).transpose(0, 2, 1).reshape(Np // P, F * P)
    ixf = ix.reshape(-1)
    rows = jnp.take(t2, ixf >> shift, axis=0)  # [K, F*P]
    m = (
        jax.lax.broadcasted_iota(jnp.int32, (ixf.shape[0], P), 1)
        == (ixf & np.int32(P - 1))[:, None]
    )
    return [
        jnp.sum(
            jnp.where(m, rows[:, f * P:(f + 1) * P], np.int32(0)),
            axis=1, dtype=jnp.int32,
        ).reshape(kshape)
        for f in range(F)
    ]


def flat_gather_fields(tbl, idx, force=None):
    """Like :func:`flat_gather` on [N, F] but returns a LIST of F
    flat [K...] slices (fields-major kernel layout, no relayout)."""
    import jax.numpy as jnp

    use = (
        force if force is not None
        else _use_pallas() and profitable(tbl.shape[0], tbl.shape[1],
                                          idx.size)
    ) and fits(tbl.shape[0], tbl.shape[1])
    kshape = idx.shape
    if not use:
        import jax

        N, F = tbl.shape
        ix = jnp.clip(idx, 0, N - 1)
        if (_ROWPACK and _use_pallas() and F <= 64
                and idx.size >= _TAKE1D_MIN_K):
            return _take_fields_rowpack(tbl, ix, kshape)
        g = jnp.take(tbl, ix, axis=0)
        # fields-major relayout ONCE, then row slices are contiguous —
        # per-column minor-dim extraction cost one slice_reduce pass
        # EACH on wide packs (trace: ~1 ms/event total at F=10-15).
        # moveaxis, not .T: idx may be multi-dim and only the field
        # axis must move.
        gt = jnp.moveaxis(g, -1, 0)
        return [gt[f] for f in range(tbl.shape[1])]
    out = _gather_i32(tbl, idx.reshape(-1))
    return [out[f].reshape(kshape) for f in range(out.shape[0])]


def _count_kernel(a_ref, b_ref, o_ref, *, NA, NB, KC):
    """o[i, j] += #{c in chunk: a[c] == i and b[c] == j} via one int8
    one-hot MXU contraction per chunk."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    c = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        o_ref[...] = jnp.zeros(o_ref.shape, jnp.int32)

    a1h = (
        a_ref[...][:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (KC, NA), 1)
    ).astype(jnp.int8)
    b1h = (
        b_ref[...][:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (KC, NB), 1)
    ).astype(jnp.int8)
    o_ref[...] += jax.lax.dot_general(
        a1h, b1h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def pair_counts(a, b, na: int, nb: int, force=None):
    """``out[i, j] = #{c: a[c] == i and b[c] == j}`` for flat int32
    key vectors (values outside [0, na) x [0, nb) are dropped).

    One int8 one-hot MXU contraction per 1024-key chunk — the TPU
    replacement for scatter-style bincounts and the sort-based
    membership bitmap (present = pair_counts(...) > 0).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    K = a.shape[0]
    if not (_use_pallas() if force is None else force):
        # XLA fallback: one-hot matmul in f32 chunks (CPU/GPU testing)
        av = jnp.where((a >= 0) & (a < na), a, na)
        bv = jnp.where((b >= 0) & (b < nb), b, nb)
        oh_a = jax.nn.one_hot(av, na + 1, dtype=jnp.float32)[:, :na]
        oh_b = jax.nn.one_hot(bv, nb + 1, dtype=jnp.float32)[:, :nb]
        return (oh_a.T @ oh_b).astype(jnp.int32)
    KC = 1024
    Kp = _round_up(max(K, KC), KC)
    NAp, NBp = _round_up(na, 8), _round_up(nb, 128)
    # out-of-domain keys -> padded rows/cols (sliced off afterwards);
    # the one-hot build never fires for them when padding == domain size
    pad_a = jnp.full((Kp - K,), np.int32(NAp), a.dtype)
    av = jnp.concatenate([a.astype(jnp.int32), pad_a])
    bv = jnp.concatenate([b.astype(jnp.int32), jnp.zeros((Kp - K,), jnp.int32)])
    av = jnp.where((av >= 0) & (av < na), av, np.int32(NAp))
    bv = jnp.where((bv >= 0) & (bv < nb), bv, np.int32(NBp))
    Z = np.int32(0)
    kern = functools.partial(_count_kernel, NA=NAp, NB=NBp, KC=KC)
    out = pl.pallas_call(
        kern,
        grid=(Kp // KC,),
        in_specs=[
            pl.BlockSpec((KC,), lambda c: (c,)),
            pl.BlockSpec((KC,), lambda c: (c,)),
        ],
        out_specs=pl.BlockSpec((NAp, NBp), lambda c: (Z, Z)),
        out_shape=jax.ShapeDtypeStruct((NAp, NBp), jnp.int32),
        interpret=_INTERPRET,
    )(av, bv)
    return out[:na, :nb]
