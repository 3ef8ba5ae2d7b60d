"""Bitonic merge-level Pallas kernel for the candidate sort.

The pooled step's semantic candidate sort (pooled._sort1d_bitonic) is a
hybrid: row-parallel ``lax.sort`` builds/finishes C-wide sorted runs and
an XOR-pairing compare-exchange network handles strides >= C.  In XLA
every stride is a separate slice/select/concat op group whose operands
round-trip HBM (~0.45 ms/event at SC=131072, trace r5).  This kernel
runs ALL of one merge level's XOR passes on a VMEM-resident chunk:

* grid over the NP/k_lv aligned chunks of the level (a level-k merge
  only exchanges elements within aligned k_lv-blocks),
* per chunk, the passes s = k_lv/2 ... C are unrolled python loops of
  pure vector ops: reshape [rows, 128] -> [nb, 2*sr, 128] (sublane
  split only), static half-slices, lexicographic compare over the key
  tuple, select, concatenate,
* the sort DIRECTION of a chunk is ((chunk index) & 1) == 0 for
  ascending — constant per grid step (i & k_lv with i = g*k_lv + local,
  local < k_lv) — matching pooled.py's per-block direction rule.

Bit-exact to the XLA formulation (tests/test_sortkern.py differentials
+ the golden byte-PAF gates); used only when PoolParams.sortkern is on
(TPU default), the XLA path remains for CPU.

Mosaic constraints obeyed (docs/PERF.md): no i1 loop carries (no loop
carries at all — fully unrolled), rank <= 3 reshapes that keep the
128-lane dim, no dots, np.int32 constants in index maps.

Reference semantics: the candidate ordering of mapper.cpp:527-624 (the
pdqsort block), tie order pinned to creation order — the sort keys
include the creation-index key, so this network's output equals
lax.sort(num_keys=all) exactly.
"""

from __future__ import annotations

import functools

import numpy as np

pl = None
pltpu = None


def _lazy():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _p
        from jax.experimental.pallas import tpu as _t

        globals()["pl"] = _p
        globals()["pltpu"] = _t


def _lex_lt_eq(a, b):
    """Lexicographic (a < b, a == b) over tuples of i32 arrays — one
    pass serves both sort directions: swap = asc ? !(lt|eq) : lt."""
    out = None
    eq = None
    for x, y in zip(a, b):
        l_ = x < y
        if out is None:
            out, eq = l_, x == y
        else:
            out = out | (eq & l_)
            eq = eq & (x == y)
    return out, eq


def _level_kernel(*refs, NK, k_lv, C):
    import jax.numpy as jnp

    _lazy()
    rows = k_lv // 128
    g = pl.program_id(0)
    # ascending iff the chunk's k_lv bit is clear: i & k_lv with
    # i = g*k_lv + local  =>  (g & 1) == 0
    asc = (g & np.int32(1)) == np.int32(0)
    vals = [refs[i][...] for i in range(NK)]
    s = k_lv // 2
    while s >= C:
        sr = s // 128
        nb = rows // (2 * sr)
        vs = [v.reshape(nb, 2 * sr, 128) for v in vals]
        a = [v[:, :sr, :] for v in vs]
        b = [v[:, sr:, :] for v in vs]
        lt_ab, eq_ab = _lex_lt_eq(a, b)
        # ascending: swap iff b < a == !(a<b | a==b); descending: a < b.
        # Ties never swap in either direction.  Boolean algebra, not
        # jnp.where: Mosaic cannot legalize select_n over i1 operands
        # (docs/PERF.md tracker-kernel lessons).
        swap = (asc & ~(lt_ab | eq_ab)) | (~asc & lt_ab)
        vals = [
            jnp.concatenate(
                [jnp.where(swap, y, x), jnp.where(swap, x, y)], axis=1
            ).reshape(rows, 128)
            for x, y in zip(a, b)
        ]
        s //= 2
    for i in range(NK):
        refs[NK + i][...] = vals[i]


@functools.lru_cache(maxsize=None)
def _build(NK, NP, k_lv, C, interpret):
    import jax
    import jax.numpy as jnp

    _lazy()
    rows = k_lv // 128
    spec = pl.BlockSpec((rows, 128), lambda g: (g, np.int32(0)))
    kern = functools.partial(_level_kernel, NK=NK, k_lv=k_lv, C=C)
    call = pl.pallas_call(
        kern,
        grid=(NP // k_lv,),
        in_specs=[spec] * NK,
        out_specs=[spec] * NK,
        out_shape=[
            jax.ShapeDtypeStruct((NP // 128, 128), jnp.int32)
        ] * NK,
        input_output_aliases={i: i for i in range(NK)},
        interpret=interpret,
    )

    def run(ks):
        ks2 = [k.reshape(NP // 128, 128) for k in ks]
        out = call(*ks2)
        return [o.reshape(NP) for o in out]

    return run


def merge_level(ks, k_lv, C, interpret=False):
    """Run all stride >= C XOR passes of bitonic merge level ``k_lv``
    over the i32 key tuple ``ks`` (each [NP], NP % k_lv == 0,
    k_lv % (2*C) == 0, C % 128 == 0).  Returns the updated tuple."""
    NP = ks[0].shape[0]
    assert NP % k_lv == 0 and k_lv % (2 * C) == 0 and C % 128 == 0, (
        NP, k_lv, C,
    )
    return _build(len(ks), NP, k_lv, C, bool(interpret))(list(ks))
