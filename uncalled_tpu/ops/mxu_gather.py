"""MXU one-hot gather kernels (Pallas TPU).

XLA-TPU gathers cost ~10-14ns *per index* (docs/PERF.md): they serialize
through the scalar load path, and the mapping engine is gather-bound on
them.  These kernels re-express small-table gathers as one-hot
contractions instead:

  * level 1 (MXU): a one-hot ``[K, H]`` int8 matrix times the table
    reshaped ``[H, W*F]`` selects each index's row-block — flops are ~free
    on the systolic array;
  * level 2 (VPU+MXU): a one-hot mask over the W positions zeroes
    everything but the hit; a constant ``[F, W*F]`` bf16 matmul collapses
    the W axis per field (exact: masked per-plane values fit in
    [-128, 127]).

int32 payloads ride as four exact signed-byte planes (int8 x int8
accumulates into int32 on the MXU), so the gather is **bit-exact** for any
32-bit payload; f32 fields are bitcast.  Planes run on an inner grid axis
that accumulates into the revisited output block — the remote Mosaic
compiler rejects kernels holding 3+ f32 matmuls and rank-4 reshapes, so
the kernel stays rank<=3 with one int8 + one bf16 dot per grid step.

Layout: everything is computed and stored as ``[F, B, K]`` (fields major)
so the minor dims are (8-row sublanes, K lanes) with **zero pad waste**; a
``[B, K, F]`` layout would pad F up to 128 lanes and cost up to 128x the
output bandwidth.  Callers get per-field [B, K] slices, which are exactly
what the engine unpacks anyway.

Cost model: flops per index ~ N*F (the whole table row-block); profitable
for tables up to a few thousand rows (path tables, per-read prob tables,
k-mer ranges) — NOT for the big occ/SA tables, which stay on XLA's
per-index gather path.

Reference context: these gathers are the per-event path-table reads of the
reference mapper's hot loop (mapper.cpp:433-663), which a CPU serves from
L1; on TPU the MXU is the only unit that can look up thousands of rows per
cycle, so the lookup is re-expressed as matmul.
"""

from __future__ import annotations

import functools

import numpy as np

_PLANE_BIAS = np.int32(-0x7F7F7F80)  # 0x80808080 wrapped: sum of (+128 << 8s)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@functools.cache
def _use_pallas() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def _pick_layout(n: int, f: int):
    """Choose (H, W): H*W >= n, W*F a modest lane count (<=1024)."""
    w = 128
    while w > 8 and w * f > 1024:
        w //= 2
    return _cdiv(n, w), w


def _pick_kc(k: int, wf: int, rb: int) -> int:
    """Index-chunk: keep the [RB, KC, W*F] i32 rows buffer ~<=4MB/block."""
    kc = (4_000_000 // (4 * rb * wf)) // 128 * 128
    kc = max(128, min(2048, kc))
    return min(kc, _round_up(k, 128))


def _gather_kernel(t_ref, i_ref, o_ref, acc_ref, *, H, W, F, shared):
    """One byte-plane of the one-hot gather (see module docstring).

    The expensive part is NOT the MXU dot but the VPU passes over the
    [KC, W*F] row blocks (one-hot build + select).  So each plane step
    only dots and shift-accumulates rows into a VMEM scratch; the select/
    collapse runs ONCE, on the recombined int32 rows at the last plane.
    (The select is exact on recombined values: exactly one w survives.)

    t_ref: [RB, H, W*F] int32 table block ([H, W*F] when shared)
    i_ref: [RB, KC] int32 indices (preclamped to [0, H*W))
    o_ref: [F, RB, KC] int32 (written at the last plane step)
    acc_ref: [RB, KC, W*F] int32 scratch accumulating the planes
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    RB, KC = i_ref.shape
    s = pl.program_id(2)  # plane axis, innermost
    idx = i_ref[...]
    # lax.div, not //: jnp floor-division lowers through f64 under x64
    # mode, which Mosaic cannot lower (operands are non-negative, so
    # truncating division is exact here)
    hi = jax.lax.div(idx, np.int32(W))

    # signed-byte plane s: c_s = ((v >> 8s) & 0xFF) - 128  (v = sum c_s<<8s
    # + 0x80808080; arithmetic >> is fine, & 0xFF drops the smeared sign)
    plane = ((jnp.right_shift(t_ref[...], s * 8) & 0xFF) - 128).astype(jnp.int8)

    oh_hi = (
        hi[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (RB, KC, H), 2)
    ).astype(jnp.int8)
    if shared:
        rows = jax.lax.dot_general(
            oh_hi, plane, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [RB, KC, W*F]
    else:
        rows = jax.lax.dot_general(
            oh_hi, plane, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )

    if F == 1:
        # accumulate recombined int32 rows; select ONCE at the last plane
        @pl.when(s == 0)
        def _init():
            acc_ref[...] = rows

        @pl.when(s != 0)
        def _accum():
            acc_ref[...] += jnp.left_shift(rows, s * 8)

        @pl.when(s == 3)
        def _select():
            lo = idx - hi * W
            oh_lo = lo[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (RB, KC, W), 2
            )
            g = jnp.sum(
                jnp.where(oh_lo, acc_ref[...], np.int32(0)),
                axis=2, dtype=jnp.int32,
            )[None]  # dtypes pinned: x64 mode promotes the weak-int 0 and
            # the sum to i64, which Mosaic cannot lower
            o_ref[...] = g + _PLANE_BIAS
    else:
        # the bf16 collapse dot must see per-plane values (|v| <= 128,
        # bf16-exact), so it runs every plane — but the W-position mask
        # is plane-invariant: build it once into scratch
        @pl.when(s == 0)
        def _mask():
            lo = idx - hi * W
            wf_pos = jax.lax.div(
                jax.lax.broadcasted_iota(jnp.int32, (RB, KC, W * F), 2),
                np.int32(F),
            )
            acc_ref[...] = (wf_pos == lo[:, :, None]).astype(jnp.int32)
            o_ref[...] = jnp.full(o_ref.shape, _PLANE_BIAS, jnp.int32)

        masked = rows * acc_ref[...]
        # collapse[f, x] = (x % F == f); bf16 exact for |v| <= 128
        collapse = (
            jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (F, W * F), 1),
                np.int32(F),
            )
            == jax.lax.broadcasted_iota(jnp.int32, (F, W * F), 0)
        ).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            collapse, masked.astype(jnp.bfloat16), (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [F, RB, KC]
        o_ref[...] += jnp.left_shift(g, s * 8)


def _gather_i32(tbl, idx, shared: bool, rb: int = 8):
    """Core: tbl [B, N, F] (or [N, F] shared) int32, idx [B, K] int32.

    Returns [F, B, K] int32 (fields-major; see module docstring).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K = idx.shape
    N, F = tbl.shape[-2:]

    H, W = _pick_layout(N, F)
    RB = rb
    KC = _pick_kc(K, W * F, RB)
    Bp, Kp, Np = _round_up(B, RB), _round_up(K, KC), H * W

    # min/max with i32 consts, not jnp.clip: under x64 clip's python-int
    # bounds materialize i64 scalars in the jaxpr
    idx = idx.astype(jnp.int32)
    idx = jnp.maximum(jnp.minimum(idx, np.int32(N - 1)), np.int32(0))
    if Kp != K or Bp != B:
        idx = jnp.pad(idx, ((0, Bp - B), (0, Kp - K)))
    pads = [(0, Np - N), (0, 0)]
    if not shared:
        pads = [(0, Bp - B)] + pads
    if any(p != (0, 0) for p in pads):
        tbl = jnp.pad(tbl, pads)
    tbl = tbl.reshape((H, W * F) if shared else (Bp, H, W * F))

    kern = functools.partial(_gather_kernel, H=H, W=W, F=F, shared=shared)
    # index-map constants MUST be np.int32: python-int 0 becomes an i64
    # constant in the Mosaic module under x64 mode and crashes the
    # compiler
    Z = np.int32(0)
    if shared:
        t_spec = pl.BlockSpec((H, W * F), lambda i, j, s: (Z, Z))
    else:
        t_spec = pl.BlockSpec((RB, H, W * F), lambda i, j, s: (i, Z, Z))
    out = pl.pallas_call(
        kern,
        grid=(Bp // RB, Kp // KC, 4),
        in_specs=[t_spec, pl.BlockSpec((RB, KC), lambda i, j, s: (i, j))],
        out_specs=pl.BlockSpec((F, RB, KC), lambda i, j, s: (Z, i, j)),
        out_shape=jax.ShapeDtypeStruct((F, Bp, Kp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((RB, KC, W * F), jnp.int32)],
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


def row_gather(tbl, idx, force=None, rb=8):
    """Per-row gather: ``out[b, k(, f)] = tbl[b, idx[b, k](, f)]``.

    tbl [B, N] or [B, N, F] in any 32-bit dtype; idx [B, K] integer.
    Bit-exact; out-of-range indices clamp (XLA take semantics).  Uses the
    MXU kernel on TPU, jnp.take_along_axis elsewhere.
    """
    import jax.numpy as jnp

    use = _use_pallas() if force is None else force
    if not use:
        ix = jnp.clip(idx, 0, tbl.shape[1] - 1)
        if tbl.ndim == 3:
            return jnp.take_along_axis(tbl, ix[:, :, None], axis=1)
        return jnp.take_along_axis(tbl, ix, axis=1)
    squeeze = tbl.ndim == 2
    if squeeze:
        tbl = tbl[:, :, None]
    t32, kind = _to_i32(tbl)
    out = _from_i32(_gather_i32(t32, idx, shared=False, rb=rb), kind)
    return out[0] if squeeze else jnp.moveaxis(out, 0, 2)


def shared_gather(tbl, idx, force=None, rb=8):
    """Shared-table gather: ``out[b, k(, f)] = tbl[idx[b, k](, f)]``.

    tbl [N] or [N, F]; idx [B, K].  Same contract as :func:`row_gather`.
    """
    import jax.numpy as jnp

    use = _use_pallas() if force is None else force
    if not use:
        ix = jnp.clip(idx, 0, tbl.shape[0] - 1)
        return jnp.take(tbl, ix, axis=0)
    squeeze = tbl.ndim == 1
    if squeeze:
        tbl = tbl[:, None]
    t32, kind = _to_i32(tbl)
    out = _from_i32(_gather_i32(t32, idx, shared=True, rb=rb), kind)
    return out[0] if squeeze else jnp.moveaxis(out, 0, 2)


def row_gather_fields(tbl, idx, force=None, rb=8):
    """Like :func:`row_gather` on [B, N, F] but returns a LIST of F
    [B, K] int32 slices without the [B, K, F] relayout (fields-major is
    the kernel's native output layout)."""
    import jax.numpy as jnp

    use = _use_pallas() if force is None else force
    if not use:
        ix = jnp.clip(idx, 0, tbl.shape[1] - 1)
        g = jnp.take_along_axis(tbl, ix[:, :, None], axis=1)
        return [g[:, :, f] for f in range(tbl.shape[2])]
    out = _gather_i32(tbl, idx, shared=False, rb=rb)
    return [out[f] for f in range(out.shape[0])]
