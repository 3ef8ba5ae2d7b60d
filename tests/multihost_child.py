"""Child process for the multi-host (2-process) distributed test.

Each process owns 4 virtual CPU devices; jax.distributed joins them
into one 8-device global mesh.  The process feeds ITS half of the read
batch (per-process feeder rows -> global dp-sharded arrays), the
pooled engine advances every shard's pool under one shard_mapped jit
spanning both processes, and the decision-relevant state is
process_allgather'ed; process 0 writes it for the parent to compare
against the single-process run (SURVEY §5.8: multi-host readiness).

Usage: python multihost_child.py <proc_id> <nprocs> <port> <outdir>
"""

import os
import sys

proc_id, nprocs, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)

import numpy as np
from jax.experimental import multihost_utils
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from uncalled_tpu.mapping.pooled import pool_advance_block
from uncalled_tpu.testing.multihost_fixture import (
    build_engine, global_fresh_state, global_inputs,
)

assert len(jax.devices()) == 4 * nprocs, jax.devices()
assert len(jax.local_devices()) == 4

eng, T = build_engine()
n_shards = len(jax.devices())
mesh = Mesh(np.asarray(jax.devices()), ("dp",))
dp = NamedSharding(mesh, P("dp"))


def to_global(a):
    """Global dp-sharded array; THIS process materializes only its own
    addressable shards (the per-process feeder)."""
    return jax.make_array_from_callback(
        a.shape, NamedSharding(mesh, P("dp")),
        lambda idx: np.asarray(a[idx]),
    )


means, on = global_inputs(n_shards)
state = jax.tree.map(to_global, global_fresh_state(eng, n_shards))
means_g, on_g = to_global(means), to_global(on)

idx, params = eng.idx, eng.params
step = jax.jit(
    shard_map(
        lambda s, m, o: pool_advance_block(idx, params, s, m, o),
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"),
    )
)
out = step(state, means_g, on_g)
jax.block_until_ready(out)

keys = ["evt_i", "mm_len", "mm_ref_st", "mm_r1", "mm_r2e", "n_cl",
        "len_sum", "done", "q_rid", "q_total"]
gathered = {
    k: np.asarray(multihost_utils.process_allgather(out[k], tiled=True))
    for k in keys
}
if proc_id == 0:
    np.savez(os.path.join(outdir, "multihost_out.npz"), **gathered)
print(f"proc {proc_id} OK", flush=True)
