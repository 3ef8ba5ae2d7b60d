#!/usr/bin/env python
"""Probe XLA persistent-cache key stability across processes.

docs/PERF.md records that the same jitted pooled/classic advance program
writes a DIFFERENT cache key in every process (six ~160MB jit__adv
entries for byte-identical code), so every process pays full compiles.
This probe compiles a minimal Pallas (flat_gather) program into a scratch
cache dir; run it twice in separate processes and compare the printed
file lists.  If keys differ, diff the dumped HLO to find the unstable
payload bytes.

Usage: python tools/cache_key_probe.py [tag]
"""

import glob
import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = "/tmp/ck_probe_cache"


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    os.makedirs(CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from uncalled_tpu.ops.flat_gather import flat_gather

    t = jnp.arange(16384, dtype=jnp.int32)
    i = jnp.arange(2048, dtype=jnp.int32) * 3 % 16384

    f = jax.jit(lambda t_, i_: flat_gather(t_, i_, force=True))
    lowered = f.lower(t, i)
    txt = lowered.as_text()
    h = hashlib.sha256(txt.encode()).hexdigest()[:16]
    tag = sys.argv[1] if len(sys.argv) > 1 else "run"
    with open(f"/tmp/ck_probe_hlo_{tag}.txt", "w") as fh:
        fh.write(txt)
    out = f(t, i)
    jax.block_until_ready(out)
    files = sorted(os.path.basename(p) for p in glob.glob(CACHE + "/*"))
    print(f"{tag}: stablehlo sha={h}")
    for p in files:
        print("  cache:", p)


if __name__ == "__main__":
    main()
