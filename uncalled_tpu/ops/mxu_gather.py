"""MXU one-hot gather kernels (Pallas TPU).

XLA-TPU gathers cost ~10.5ns *per index* (docs/PERF.md): they serialize
through the scalar load path, and the mapping engine is gather-bound on
them.  These kernels re-express small-table gathers as one-hot
contractions instead.

Layout (the whole trick — v2, transposed): indices live on LANES, table
rows on SUBLANES/contraction:

  * the table [B, N(,F)] reshapes to [B, W*F, H] with W=8 and H=N/W: a
    narrow "W-slot" dimension and a fat contraction H;
  * level 1 (VPU, once per block): one-hot ``oh[h, k] = (h == idx[k]//W)``
    built [RB, H, KC] int8 straight into VMEM scratch — no lane padding
    (KC is the lane dim), reused by all four byte planes;
  * level 2 (MXU, per plane): ``rows = plane_T @ oh`` — [W*F, H] x
    [H, KC] — a fat-contraction matmul whose output [W*F, KC] is ~16x
    smaller than the old [KC, W*F]-lanes layout;
  * level 3: a W-position mask (plane-invariant, in the same scratch)
    zeroes everything but the hit; for F>1 a constant [F, W*F] bf16
    collapse matmul emits the [F, RB, KC] output directly (exact:
    per-plane values fit [-128, 127]).

int32 payloads ride as four exact signed-byte planes (int8 x int8
accumulates into int32 on the MXU), so the gather is **bit-exact** for
any 32-bit payload; f32 fields are bitcast.

x64-mode rules (the engine enables jax_enable_x64 for f64 match probs;
Mosaic cannot lower any 64-bit type): no jnp ``//`` (lowers through f64),
no python-int clip bounds or where fills, np.int32 constants in BlockSpec
index maps, dtype-pinned sums.

Cost model: MACs per index ~ N*F (the whole table row-block); profitable
for tables up to a few thousand rows (path tables, per-read prob tables,
k-mer ranges) — NOT for the big occ/SA tables, which stay on XLA's
per-index gather path.

Reference context: these gathers are the per-event path-table reads of
the reference mapper's hot loop (mapper.cpp:433-663), which a CPU serves
from L1; on TPU the MXU is the only unit that can look up thousands of
rows per cycle, so the lookup is re-expressed as matmul.
"""

from __future__ import annotations

import functools
import os

import numpy as np

# interpret-mode escape so the kernels are testable off-TPU (slow;
# tests only)
_INTERPRET = bool(int(os.environ.get("UNCALLED_MXU_INTERPRET", "0")))

_PLANE_BIAS = np.int32(-0x7F7F7F80)  # 0x80808080 wrapped: sum of (+128 << 8s)
W = 8  # table positions per contraction row (the narrow sublane dim)
# Largest table the MONOLITHIC kernel accepts: the one-hot build
# materializes an [RB, H, KC] i32 iota in VMEM — at H = N/8 > ~512 even
# the minimum KC=512 block blows the 16MB scoped-vmem limit.  Above
# this, the H-chunked kernel takes over (4th grid axis walks the
# contraction in HC-row chunks with bounded VMEM); the split keeps the
# monolithic HLO — and the XLA compile cache for every narrow-engine
# shape — unchanged.
N_MXU_MAX = 4096
# Tables larger than this skip the MXU entirely: the one-hot build's
# ~H compares/idx crosses XLA's ~10.5ns/idx gather at N ~ 8-9k
# (measured on v5e: 15 ns/idx at N=12800 chunked vs 10.5 XLA).
N_MXU_HARD_MAX = 8192


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@functools.cache
def _use_pallas() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def _pick_kc(k: int, h: int, f: int) -> int:
    """Lane-dim chunk: the binding constraint is the i32 iota that the
    one-hot build materializes before its int8 cast ([RB, max(H, W*F),
    KC] i32) — keep it ~<=4MB."""
    budget = 4_000_000 // (8 * max(h, W * f) * 4)
    kc = max(512, min(8192, budget // 512 * 512))
    return min(kc, _round_up(k, 512))


def _gather_kernel(t_ref, i_ref, o_ref, oh_ref, mask_ref, *, H, F, KC):
    """One byte-plane of the transposed one-hot gather.

    t_ref: [RB, W*F, H] int32 table block (transposed layout)
    i_ref: [RB, KC] int32 indices (preclamped to [0, H*W))
    o_ref: [F, RB, KC] int32, accumulated across the 4 plane grid steps
    oh_ref: [RB, H, KC] int8 scratch — level-1 one-hot, built at s == 0
    mask_ref: [RB, W*F, KC] int8 scratch — W-position mask, built at s == 0
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    RB = i_ref.shape[0]
    s = pl.program_id(2)  # plane axis, innermost

    @pl.when(s == 0)
    def _build():
        idx = i_ref[...]
        # lax.div, not //: jnp floor-division lowers through f64 under
        # x64 mode (operands non-negative, truncation exact)
        hi = jax.lax.div(idx, np.int32(W))
        lo = idx - hi * W
        oh_ref[...] = (
            hi[:, None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (RB, H, KC), 1)
        ).astype(jnp.int8)
        # sublane position x holds (w = x // F, f = x % F)
        wslot = jax.lax.div(
            jax.lax.broadcasted_iota(jnp.int32, (RB, W * F, KC), 1),
            np.int32(F),
        )
        mask_ref[...] = (wslot == lo[:, None, :]).astype(jnp.int8)
        o_ref[...] = jnp.full(o_ref.shape, _PLANE_BIAS, jnp.int32)

    # signed-byte plane s: c_s = ((v >> 8s) & 0xFF) - 128  (v = sum
    # c_s<<8s + 0x80808080; arithmetic >> ok, & 0xFF drops smeared sign)
    plane = ((jnp.right_shift(t_ref[...], s * 8) & 0xFF) - 128).astype(jnp.int8)
    rows = jax.lax.dot_general(
        plane, oh_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [RB, W*F, KC]
    masked = rows * mask_ref[...].astype(jnp.int32)
    if F == 1:
        g = jnp.sum(masked, axis=1, dtype=jnp.int32)[None]  # [1, RB, KC]
    else:
        # collapse[f, x] = (x % F == f); bf16 exact for |v| <= 128
        collapse = (
            jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (F, W * F), 1),
                np.int32(F),
            )
            == jax.lax.broadcasted_iota(jnp.int32, (F, W * F), 0)
        ).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            collapse, masked.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [F, RB, KC]

    o_ref[...] += jnp.left_shift(g, s * 8)


def _gather_kernel_chunked(t_ref, i_ref, o_ref, oh_ref, mask_ref, *, HC, F, KC):
    """H-chunked variant for big tables (N > N_MXU_MAX).

    Grid (Bp//RB, Kp//KC, NH, 4): axis 2 walks the contraction dimension
    in HC-row chunks (bounded VMEM: the one-hot scratch and its i32 iota
    intermediate are [RB, HC, KC] regardless of N), axis 3 the byte
    planes.  Indices outside the current chunk produce an all-zero
    one-hot column, so accumulating the per-chunk dots over axis 2
    reconstructs the full-table contraction exactly.

    t_ref: [RB, W*F, HC] int32 — chunk c of the transposed table
    i_ref: [RB, KC] int32 global indices (preclamped to [0, N))
    o_ref: [F, RB, KC] int32, accumulated across chunk x plane steps
    oh_ref: [RB, HC, KC] int8 scratch, rebuilt at each new chunk
    mask_ref: [RB, W*F, KC] int8 scratch, chunk-invariant
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    RB = i_ref.shape[0]
    c = pl.program_id(2)  # chunk axis
    s = pl.program_id(3)  # plane axis, innermost

    @pl.when((c == 0) & (s == 0))
    def _init():
        idx = i_ref[...]
        hi = jax.lax.div(idx, np.int32(W))
        wslot = jax.lax.div(
            jax.lax.broadcasted_iota(jnp.int32, (RB, W * F, KC), 1),
            np.int32(F),
        )
        mask_ref[...] = (wslot == (idx - hi * W)[:, None, :]).astype(jnp.int8)
        o_ref[...] = jnp.full(o_ref.shape, _PLANE_BIAS, jnp.int32)

    @pl.when(s == 0)
    def _build_chunk():
        hi = jax.lax.div(i_ref[...], np.int32(W)) - c * np.int32(HC)
        oh_ref[...] = (
            hi[:, None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (RB, HC, KC), 1)
        ).astype(jnp.int8)

    plane = ((jnp.right_shift(t_ref[...], s * 8) & 0xFF) - 128).astype(jnp.int8)
    rows = jax.lax.dot_general(
        plane, oh_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [RB, W*F, KC]
    masked = rows * mask_ref[...].astype(jnp.int32)
    if F == 1:
        g = jnp.sum(masked, axis=1, dtype=jnp.int32)[None]  # [1, RB, KC]
    else:
        collapse = (
            jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (F, W * F), 1),
                np.int32(F),
            )
            == jax.lax.broadcasted_iota(jnp.int32, (F, W * F), 0)
        ).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            collapse, masked.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [F, RB, KC]

    # the plane bias is baked in once at init; per-chunk contributions
    # for planes of a miss chunk are all-zero, so plain += is exact
    o_ref[...] += jnp.left_shift(g, s * 8)


def _gather_i32(tbl, idx, shared: bool):
    """Core: tbl [B, N, F] (or [N, F] shared) int32, idx [B, K] int32.

    Returns [F, B, K] int32 (fields-major).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K = idx.shape
    N, F = tbl.shape[-2:]

    chunked = N > N_MXU_MAX
    if chunked:
        # bounded VMEM: the [RB, HC, KC] i32 iota must stay ~<=4MB
        KC = min(512, _round_up(K, 512))
        HC = max(256, 4_000_000 // (8 * KC * 4) // 256 * 256)
        H = _round_up(_cdiv(N, W), HC)
    else:
        H = _cdiv(N, W)
        KC = _pick_kc(K, H, F)
    RB = 8
    Bp, Kp, Np = _round_up(B, RB), _round_up(K, KC), H * W

    # min/max with i32 consts, not jnp.clip (x64: i64 scalars)
    idx = idx.astype(jnp.int32)
    idx = jnp.maximum(jnp.minimum(idx, np.int32(N - 1)), np.int32(0))
    if Kp != K or Bp != B:
        idx = jnp.pad(idx, ((0, Bp - B), (0, Kp - K)))
    if shared:
        tbl = jnp.broadcast_to(tbl[None], (Bp, N, F))
        pads = [(0, 0), (0, Np - N), (0, 0)]
    else:
        pads = [(0, Bp - B), (0, Np - N), (0, 0)]
    if any(p != (0, 0) for p in pads):
        tbl = jnp.pad(tbl, pads)
    # transposed layout [B, W*F, H]: element (n = h*W + w, f) -> (w*F+f, h)
    tbl = jnp.transpose(tbl.reshape(Bp, H, W, F), (0, 2, 3, 1)).reshape(
        Bp, W * F, H
    )

    Z = np.int32(0)  # index maps need i32 constants under x64
    if chunked:
        kern = functools.partial(_gather_kernel_chunked, HC=HC, F=F, KC=KC)
        out = pl.pallas_call(
            kern,
            grid=(Bp // RB, Kp // KC, H // HC, 4),
            in_specs=[
                pl.BlockSpec((RB, W * F, HC), lambda i, j, c, s: (i, Z, c)),
                pl.BlockSpec((RB, KC), lambda i, j, c, s: (i, j)),
            ],
            out_specs=pl.BlockSpec(
                (F, RB, KC), lambda i, j, c, s: (Z, i, j)
            ),
            out_shape=jax.ShapeDtypeStruct((F, Bp, Kp), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((RB, HC, KC), jnp.int8),
                pltpu.VMEM((RB, W * F, KC), jnp.int8),
            ],
            interpret=_INTERPRET,
        )(tbl, idx)
        return out[:, :B, :K]
    kern = functools.partial(_gather_kernel, H=H, F=F, KC=KC)
    out = pl.pallas_call(
        kern,
        grid=(Bp // RB, Kp // KC, 4),
        in_specs=[
            pl.BlockSpec((RB, W * F, H), lambda i, j, s: (i, Z, Z)),
            pl.BlockSpec((RB, KC), lambda i, j, s: (i, j)),
        ],
        out_specs=pl.BlockSpec((F, RB, KC), lambda i, j, s: (Z, i, j)),
        out_shape=jax.ShapeDtypeStruct((F, Bp, Kp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((RB, H, KC), jnp.int8),
            pltpu.VMEM((RB, W * F, KC), jnp.int8),
        ],
        interpret=_INTERPRET,
    )(tbl, idx)
    return out[:, :B, :K]


def _to_i32(a):
    import jax
    import jax.numpy as jnp

    if a.dtype == jnp.float32:
        return jax.lax.bitcast_convert_type(a, jnp.int32), "f32"
    if a.dtype == jnp.bool_:
        return a.astype(jnp.int32), "bool"
    if a.dtype == jnp.int32:
        return a, "i32"
    if a.dtype == jnp.uint32:
        return jax.lax.bitcast_convert_type(a, jnp.int32), "u32"
    raise TypeError(f"mxu_gather: unsupported dtype {a.dtype}")


def _from_i32(a, kind):
    import jax
    import jax.numpy as jnp

    if kind == "f32":
        return jax.lax.bitcast_convert_type(a, jnp.float32)
    if kind == "bool":
        return a.astype(bool)
    if kind == "u32":
        return jax.lax.bitcast_convert_type(a, jnp.uint32)
    return a


def row_gather(tbl, idx, force=None):
    """Per-row gather: ``out[b, k(, f)] = tbl[b, idx[b, k](, f)]``.

    tbl [B, N] or [B, N, F] in any 32-bit dtype; idx [B, K] integer.
    Bit-exact; out-of-range indices clamp (XLA take semantics).  Uses the
    MXU kernel on TPU, jnp.take_along_axis elsewhere.
    """
    import jax.numpy as jnp

    use = (_use_pallas() if force is None else force) and tbl.shape[1] <= N_MXU_HARD_MAX
    if not use:
        ix = jnp.clip(idx, 0, tbl.shape[1] - 1)
        if tbl.ndim == 3:
            return jnp.take_along_axis(tbl, ix[:, :, None], axis=1)
        return jnp.take_along_axis(tbl, ix, axis=1)
    squeeze = tbl.ndim == 2
    if squeeze:
        tbl = tbl[:, :, None]
    t32, kind = _to_i32(tbl)
    out = _from_i32(_gather_i32(t32, idx, shared=False), kind)
    return out[0] if squeeze else jnp.moveaxis(out, 0, 2)


def shared_gather(tbl, idx, force=None):
    """Shared-table gather: ``out[b, k(, f)] = tbl[idx[b, k](, f)]``.

    tbl [N] or [N, F]; idx [B, K].  Same contract as :func:`row_gather`.
    """
    import jax.numpy as jnp

    use = (_use_pallas() if force is None else force) and tbl.shape[0] <= N_MXU_HARD_MAX
    if not use:
        ix = jnp.clip(idx, 0, tbl.shape[0] - 1)
        return jnp.take(tbl, ix, axis=0)
    squeeze = tbl.ndim == 1
    if squeeze:
        tbl = tbl[:, None]
    t32, kind = _to_i32(tbl)
    out = _from_i32(_gather_i32(t32, idx, shared=True), kind)
    return out[0] if squeeze else jnp.moveaxis(out, 0, 2)


def row_gather_fields(tbl, idx, force=None):
    """Like :func:`row_gather` on [B, N, F] but returns a LIST of F
    [B, K] int32 slices without the [B, K, F] relayout (fields-major is
    the kernel's native output layout)."""
    import jax.numpy as jnp

    use = (_use_pallas() if force is None else force) and tbl.shape[1] <= N_MXU_HARD_MAX
    if not use:
        ix = jnp.clip(idx, 0, tbl.shape[1] - 1)
        g = jnp.take_along_axis(tbl, ix[:, :, None], axis=1)
        return [g[:, :, f] for f in range(tbl.shape[2])]
    out = _gather_i32(tbl, idx, shared=False)
    return [out[f] for f in range(out.shape[0])]
