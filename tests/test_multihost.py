"""Multi-host execution readiness (SURVEY §5.8): two jax.distributed
processes (4 virtual CPU devices each) run the pooled engine's
shard_mapped step over one 8-device global mesh, with per-process
feeders and allgathered results — and the output is byte-identical to
the single-process 8-device run.

This is the honest multi-host substantiation available without two
real TPU hosts: the same shard_map program, the same mesh axes, the
same per-process feeder/result-gather code paths jax.distributed uses
on pods.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "multihost_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_pooled_step_matches_single(tmp_path):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    got = np.load(tmp_path / "multihost_out.npz")

    # single-process reference: same program on the 8-device local mesh
    ref = subprocess.run(
        [sys.executable, "-c", f"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
sys.path.insert(0, {REPO!r})
from uncalled_tpu.mapping.pooled import pool_advance_block
from uncalled_tpu.testing.multihost_fixture import (
    build_engine, global_fresh_state, global_inputs,
)
eng, T = build_engine()
mesh = Mesh(np.asarray(jax.devices()), ("dp",))
means, on = global_inputs(8)
state = jax.tree.map(jax.numpy.asarray, global_fresh_state(eng, 8))
step = jax.jit(shard_map(
    lambda s, m, o: pool_advance_block(eng.idx, eng.params, s, m, o),
    mesh=mesh, in_specs=(P("dp"), P("dp"), P("dp")), out_specs=P("dp"),
))
out = step(state, jax.numpy.asarray(means), jax.numpy.asarray(on))
keys = ["evt_i", "mm_len", "mm_ref_st", "mm_r1", "mm_r2e", "n_cl",
        "len_sum", "done", "q_rid", "q_total"]
np.savez(os.path.join({str(tmp_path)!r}, "single_out.npz"),
         **{{k: np.asarray(out[k]) for k in keys}})
"""],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert ref.returncode == 0, ref.stdout[-2000:] + ref.stderr[-2000:]
    want = np.load(tmp_path / "single_out.npz")
    for k in want.files:
        g, w = got[k], want[k]
        if g.dtype.kind == "f":
            assert np.array_equal(
                g.view(np.int32), w.view(np.int32)
            ), k  # bit-exact
        else:
            assert np.array_equal(g, w), k
