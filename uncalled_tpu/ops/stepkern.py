"""Pooled-step Pallas kernels (round 3, built stagewise).

Replaces HBM-latency-bound stages of ``pooled._pool_event_step`` with
VMEM-resident kernels, one stage at a time.  Every kernel is bit-exact
to the XLA stage it replaces (tests/test_stepkern.py, interpret mode on
CPU + the golden byte-PAF gates) and sits behind
``PoolParams.stepkern`` with the XLA path as the CPU default.

Measured Mosaic physics this design obeys (docs/MEGAKERNEL.md,
"Round-3 correction"):

* scalar fori row-gathers floor at ~7 ns/idx with ~100-150 ns/trip loop
  overhead — amortize by unrolling MANY gathers per trip,
* computed (strong-i32) row indices trip an infinite-recursion Mosaic
  lowering bug under x64: the row index of every load/store must be the
  weak fori variable itself, so unrolling uses U contiguous output
  chunks (one output ref per chunk, all indexed by the same loop var),
* dynamic-address stores cost ~48 ns: all stores are loop-affine,
* any vector compute inside the serial loop breaks the software
  pipeline (~100x): scalar loops COPY, vector epilogues COMPUTE,
* VMEM pads the lane dim to 128 (512 B/row).

The ring kernel wins by (a) gathering from a VMEM-resident table (~7 ns
vs ~10 ns for XLA's gather from the HBM-resident loop-carried ring) and
(b) fusing the mask/slot-write epilogue into the same pass (no HBM
round-trip for the gathered rows).

Reference semantics: the prob-ring copy/update of mapper.cpp's child
creation (PathBuffer::make_child, mapper.cpp:204-247), exactly as the
XLA assembly stage replays it (pooled.py ring stage).
"""

from __future__ import annotations

import functools

import numpy as np

# set by _lazy() before any kernel traces, so CPU-only imports of this
# module never touch pallas (the tracker_kernel.py convention)
pl = None
pltpu = None


def _lazy():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _p
        from jax.experimental.pallas import tpu as _t

        globals()["pl"] = _p
        globals()["pltpu"] = _t


# ---------------------------------------------------------------------------
# ring assembly
# ---------------------------------------------------------------------------
#
# nq_cum[i, :] = where(keep[i],
#                      where(iota == rslot[i], rval[i],
#                            where(rsrc[i] >= 0, old_ring[rsrc[i], :], 0)),
#                      0)
#
# Layout: G=4 slots per 128-lane row (32-lane groups, RING <= 32); U
# contiguous row chunks unroll the gather loop (4*U gathers per trip).

_G = 4  # slots per output row
_GW = 32  # lanes per slot group


def _ring_kernel(ringtab_ref, idx_ref, auxv_ref, *o_refs, SGU, U, RING):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    Z = np.int32(0)

    def body(r, _):
        for u in range(U):
            for k in range(_G):
                j = idx_ref[r, u * _G + k]
                o_refs[u][pl.ds(r, 1), k * _GW:(k + 1) * _GW] = ringtab_ref[
                    pl.ds(j, 1), :
                ]
        return 0

    jax.lax.fori_loop(0, SGU, body, 0)

    # vector epilogue: per chunk, per 32-lane slot group (bounded temps)
    sub = jax.lax.broadcasted_iota(i32, (SGU, _GW), 1)
    for u in range(U):
        r0 = u * SGU
        for k in range(_G):
            def col(c):
                return jnp.broadcast_to(
                    auxv_ref[r0:r0 + SGU, c:c + 1], (SGU, _GW)
                )

            g = o_refs[u][:, k * _GW:(k + 1) * _GW]
            base = jnp.where(col(12 + k) > Z, g, Z)  # sign lanes 12..15
            nr = jnp.where(sub == col(k), col(4 + k), base)  # slot/val
            nr = jnp.where(
                (col(8 + k) > Z) & (sub < np.int32(RING)), nr, Z
            )  # keep lanes 8..11
            o_refs[u][:, k * _GW:(k + 1) * _GW] = nr


@functools.cache
def _build_ring(S, U, RING, interpret):
    _lazy()
    import jax

    SG = S // _G
    SGU = SG // U
    fn = pl.pallas_call(
        functools.partial(_ring_kernel, SGU=SGU, U=U, RING=RING),
        out_shape=[jax.ShapeDtypeStruct((SGU, _G * _GW), np.int32)] * U,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * U,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )
    return fn


def ring_assemble(old_ring, rsrc, rslot, rval, keep, interpret=False):
    """The assembly ring stage as a VMEM kernel; bit-exact to the XLA
    formulation (pooled.py: ring_rows/base_ring/nq_cum).

    old_ring [S, RING] f32 (RING <= 32), rsrc/rslot [S] i32 (rsrc < 0 =
    zero base, rslot = -1 = no write), rval [S] f32, keep [S] bool ->
    new ring [S, RING] f32.
    """
    import jax
    import jax.numpy as jnp

    i32, f32 = jnp.int32, jnp.float32
    S, RING = old_ring.shape
    SG = S // _G
    U = 16
    while U > 1 and SG % U:
        U //= 2
    SGU = SG // U
    assert RING <= _GW and S % (_G * U) == 0
    ringtab = jnp.pad(
        jax.lax.bitcast_convert_type(old_ring, i32),
        ((0, 0), (0, _GW - RING)),
    )
    # gather indices, chunk-major: [SG, G] -> [U, SGU, G] -> [SGU, U*G]
    idx = (
        jnp.clip(rsrc, np.int32(0), np.int32(S - 1))
        .astype(i32)
        .reshape(U, SGU, _G)
        .transpose(1, 0, 2)
        .reshape(SGU, U * _G)
    )
    # epilogue scalars, one row per output row (4 slots), flat chunk order
    def cols(a):
        return a.reshape(SG, _G)

    auxv = jnp.concatenate(
        [
            cols(rslot.astype(i32)),
            cols(jax.lax.bitcast_convert_type(rval.astype(f32), i32)),
            cols(keep.astype(i32)),
            cols((rsrc >= np.int32(0)).astype(i32)),
        ],
        axis=1,
    )  # [SG, 16]: slot x4, val x4, keep x4, sign x4
    fn = _build_ring(S, U, RING, interpret)
    outs = fn(ringtab, idx, auxv)
    out = jnp.concatenate(outs, axis=0).reshape(S, _GW)[:, :RING]
    return jax.lax.bitcast_convert_type(out, f32)
