"""Sharded FM-index mapping engine (docs/DESIGN.md: >1 Gb references).

The replicated engine needs ~1-5 bytes of device memory per reference
base; beyond ~1 Gb the index must shard.  Layout (2-D mesh):

* ``dp`` axis: read slots (the batch dimension of all engine state) —
  reads are independent, so this axis scales compute linearly with no
  hot-path collectives (same as the replicated mode).
* ``idx`` axis: FM-row ranges of the big tables — the interleaved occ
  buckets and the 1/32-sampled SA shard by row block; each shard answers
  the occ / SA queries that fall in its range and a ``psum`` over
  ``idx`` combines the one-hot answers (engine._shard_take).  Query
  volume is B x CE x 2 bucket rows per event — a few MB over ICI, far
  below the HBM traffic of the step itself.

Role parity: the reference caps references at ~1 Gb on one host
(README.md:242-246, bwa_index.hpp:176-178's sampled .sa); this layout is
how the same algorithm exceeds that on a TPU pod slice.

Byte-exactness: the sharded gathers return identical values to the
replicated takes, so golden PAF parity holds (tests/test_sharded.py runs
the proof on the virtual CPU mesh).
"""

from __future__ import annotations

import numpy as np

from ..config import Conf
from ..mapping.engine import (
    EngineParams, MapEngine, advance_block, device_index, make_state,
)
from ..mapping.pooled import PooledEngine


def _pad_rows(a: np.ndarray, mult: int) -> np.ndarray:
    extra = (-len(a)) % mult
    if extra:
        pad = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
        a = np.pad(a, pad)
    return a


class ShardedMapEngine(MapEngine):
    """MapEngine over a (dp, idx) mesh with row-sharded occ/SA tables.

    Drop-in for MapEngine in BatchMapper: same fresh_state/advance/
    readout surface; state arrays live dp-sharded on the mesh, the occ
    buckets and sampled SA live idx-sharded.
    """

    def __init__(self, fmi, model, threshes, conf: Conf | None = None,
                 mesh=None, dp_axis: str = "dp", idx_axis: str = "idx",
                 **over):
        import jax
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            raise ValueError("ShardedMapEngine needs a jax Mesh")
        self.conf = conf or Conf()
        over.setdefault("mxu", False)  # pallas inside shard_map: future work
        over.setdefault("sampled_sa", True)
        self.params = EngineParams.from_conf(self.conf, **over)
        p = self.params
        ndp = mesh.shape[dp_axis]
        nix = mesh.shape[idx_axis]
        if p.B % ndp:
            raise ValueError(f"batch {p.B} not divisible by dp={ndp}")
        self.mesh = mesh
        self.fmi = fmi
        self.model = model

        # host-side tables, big ones padded to the idx-axis multiple
        base = device_index(
            fmi, threshes, model, sampled_sa=True, sa_intv=p.sa_intv
        )
        occ = _pad_rows(np.asarray(base["occ_rows"]), nix)
        sa_samp = _pad_rows(np.asarray(base["sa_samp"]), nix)
        self._meta = {"n": base["n"], "primary": base["primary"]}
        small = {
            k: v
            for k, v in base.items()
            if k not in ("occ_rows", "sa_samp", "n", "primary")
        }

        sharded = NamedSharding(mesh, P(idx_axis))
        sharded2 = NamedSharding(mesh, P(idx_axis, None))
        repl = NamedSharding(mesh, P())
        self._tables = {
            "occ_rows": jax.device_put(occ, sharded2),
            "sa_samp": jax.device_put(sa_samp, sharded),
            **{k: jax.device_put(v, repl) for k, v in small.items()},
        }
        tbl_specs = {
            "occ_rows": P(idx_axis, None),
            "sa_samp": P(idx_axis),
            **{k: P() for k in small},
        }

        # local-view params: shard_map sees B/ndp read slots per device
        p_local = EngineParams(
            **{**p.__dict__, "B": p.B // ndp}
        )
        meta = dict(self._meta)

        def raw(state, means, on, tables):
            idx = dict(tables, **meta, shard_axis=idx_axis)
            return advance_block(idx, p_local, state, means, on)

        st_shape = make_state(p)
        st_specs = jax.tree.map(lambda _: P(dp_axis), st_shape)
        self._state_sharding = jax.tree.map(
            lambda _: NamedSharding(mesh, P(dp_axis)), st_shape
        )

        self._advance = jax.jit(
            shard_map(
                raw,
                mesh=mesh,
                in_specs=(st_specs, P(dp_axis, None), P(dp_axis, None),
                          tbl_specs),
                out_specs=st_specs,
                # pallas_call outputs (ShapeDtypeStruct) inside shard_map
                # trip the vma check on the TPU backend (pair_counts
                # auto-routes to its Pallas kernel there); the specs are
                # explicit so the check adds nothing
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        # jitted slot reset (MapEngine.reset_slots delegates to it); the
        # dp-sharded state shardings propagate through the elementwise ops
        from ..mapping.engine import reset_rows

        self._reset = jax.jit(reset_rows, donate_argnums=(0,))

    def fresh_state(self):
        import jax

        return jax.tree.map(
            jax.device_put, make_state(self.params), self._state_sharding
        )

    def advance(self, state, means, on):
        import jax.numpy as jnp

        means = jnp.asarray(means, dtype=jnp.float32)
        on = jnp.asarray(on, dtype=bool)
        return self._advance(state, means, on, self._tables)


class ShardedPooledEngine(PooledEngine):
    """The flagship pooled engine over a (dp, idx) mesh.

    Same layout as :class:`ShardedMapEngine` — read slots (and their
    pool segments) shard over ``dp``; the occ buckets and sampled SA
    shard over ``idx`` with psum-combined answers (engine._shard_take).
    Every batch-total pool budget (S, SC, RE, RT) divides across the dp
    shards, so each shard runs the standard step on its local
    B/ndp-read pool; per-read budgets (PC, R, FS, CL) are untouched —
    the reference's max_paths parity holds per read exactly as in the
    single-chip engine.  (Physical-cut ovf flags can differ from the
    unsharded engine only when a burst would overflow a shard-local
    budget but not the batch-global one; those reads re-run on the
    ladder either way.)

    Byte-exactness: tests/test_sharded.py proves golden-PAF identity on
    the virtual CPU mesh through the real BatchMapper loop.
    """

    def __init__(self, fmi, model, threshes, conf: Conf | None = None,
                 mesh=None, dp_axis: str = "dp", idx_axis: str = "idx",
                 **over):
        import jax
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..mapping.pooled import (
            PoolParams, make_pool_state, pool_advance_block,
            reset_pool_rows,
        )

        if mesh is None:
            raise ValueError("ShardedPooledEngine needs a jax Mesh")
        self.conf = conf or Conf()
        # pallas kernels / MXU routing inside shard_map: future work
        over.setdefault("mxu", False)
        over.setdefault("sort_mode", "flat")
        over.setdefault("tracker_kernel", False)
        over.setdefault("stepkern", False)
        over.setdefault("sortkern", False)
        # slot handoff needs the sb-window advance signature this
        # wrapper doesn't forward; BatchMapper would arm standbys and
        # crash advance() with an unexpected kwarg (code-review r5)
        over.setdefault("handoff", False)
        over.setdefault("sampled_sa", True)
        self.params = PoolParams.from_conf(self.conf, **over)
        p = self.params
        ndp = mesh.shape[dp_axis]
        nix = mesh.shape[idx_axis]
        for name, v in (("B", p.B), ("S", p.S), ("SC", p.SC),
                        ("RE", p.RE), ("RT", p.RT)):
            if v % ndp:
                raise ValueError(f"{name}={v} not divisible by dp={ndp}")
        self.mesh = mesh
        self.fmi = fmi
        self.model = model

        base = device_index(
            fmi, threshes, model, sampled_sa=p.sampled_sa,
            sa_intv=p.sa_intv,
        )
        big_keys = ["occ_rows"] + (
            ["sa_samp"] if p.sampled_sa else ["sa"]
        )
        self._meta = {"n": base["n"], "primary": base["primary"]}
        small = {
            k: v for k, v in base.items()
            if k not in big_keys + ["n", "primary"]
        }
        sharded1 = NamedSharding(mesh, P(idx_axis))
        sharded2 = NamedSharding(mesh, P(idx_axis, None))
        repl = NamedSharding(mesh, P())
        self._tables = {}
        tbl_specs = {}
        for k in big_keys:
            a = _pad_rows(np.asarray(base[k]), nix)
            sh = sharded2 if a.ndim == 2 else sharded1
            self._tables[k] = jax.device_put(a, sh)
            tbl_specs[k] = P(idx_axis, None) if a.ndim == 2 else P(idx_axis)
        for k, v in small.items():
            self._tables[k] = jax.device_put(v, repl)
            tbl_specs[k] = P()

        # local-view params: each dp shard runs B/ndp reads on an
        # S/ndp-slot pool with its share of the batch-total budgets
        p_local = PoolParams(
            **{
                **p.__dict__,
                "B": p.B // ndp,
                "S": p.S // ndp,
                "SC": p.SC // ndp,
                "RE": p.RE // ndp,
                "RT": p.RT // ndp,
            }
        )
        self._p_local = p_local
        meta = dict(self._meta)

        def raw(state, means, on, tables):
            idx = dict(tables, **meta, shard_axis=idx_axis)
            # dm_pool rides replicated/inert under shard_map (the step
            # passes it through when shard_axis is set — per-shard maxima
            # vary and cannot be a replicated carry)
            return pool_advance_block(idx, p_local, state, means, on)

        st_shape = make_pool_state(p)
        st_specs = {
            k: P(None) if k == "dm_pool" else P(dp_axis) for k in st_shape
        }
        self._state_sharding = {
            k: NamedSharding(mesh, s) for k, s in st_specs.items()
        }
        self._advance = jax.jit(
            shard_map(
                raw,
                mesh=mesh,
                in_specs=(st_specs, P(dp_axis, None), P(dp_axis, None),
                          tbl_specs),
                out_specs=st_specs,
                # pallas_call outputs (ShapeDtypeStruct) inside shard_map
                # trip the vma check on the TPU backend (pair_counts
                # auto-routes to its Pallas kernel there); the specs are
                # explicit so the check adds nothing
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        # reset must run PER SHARD: pool read-ids (q_rid) are shard-
        # local (the step runs with B/ndp), so the mask[rid] gather and
        # the dead marker only make sense in the local view
        self._reset = jax.jit(
            shard_map(
                reset_pool_rows,
                mesh=mesh,
                in_specs=(st_specs, P(dp_axis)),
                out_specs=st_specs,
                # pallas_call outputs (ShapeDtypeStruct) inside shard_map
                # trip the vma check on the TPU backend (pair_counts
                # auto-routes to its Pallas kernel there); the specs are
                # explicit so the check adds nothing
                check_vma=False,
            ),
            donate_argnums=(0,),
        )

    def fresh_state(self):
        import jax
        import jax.numpy as jnp

        from ..mapping.pooled import make_pool_state

        fresh = make_pool_state(self.params)
        # dead-slot marker is the LOCAL batch size (each shard's step
        # runs with B/ndp read slots; rid values are shard-local)
        fresh["q_rid"] = jnp.full(
            (self.params.S,), self._p_local.B, jnp.int32
        )
        return jax.tree.map(jax.device_put, fresh, self._state_sharding)

    def advance(self, state, means, on):
        import jax.numpy as jnp

        means = jnp.asarray(means, dtype=jnp.float32)
        on = jnp.asarray(on, dtype=bool)
        return self._advance(state, means, on, self._tables)
