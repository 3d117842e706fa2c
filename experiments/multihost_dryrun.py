#!/usr/bin/env python
"""Multi-PROCESS dryrun: 2 simulated hosts x 4 virtual CPU devices.

The single-process dryrun (__graft_entry__.dryrun_multichip) validates
sharding/collectives on one process's virtual devices; this script
additionally validates the MULTI-HOST code path — jax.distributed
coordinator handshake, cross-process device enumeration, a global mesh
spanning both processes, process-local data placement, and a GSPMD
decode step whose all-reduces cross the process boundary (DCN-analog).

Usage (driver/worker auto-fork):
    timeout 900 python experiments/multihost_dryrun.py
Each process embeds 4 virtual CPU devices; the global mesh is
dp=2 (one batch shard per "host") x tp=4, matching the 70B deployment
recipe in parallel/distributed.global_mesh.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVICES = 4
PORT = 9764


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from teal_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(coordinator_address=f"127.0.0.1:{PORT}",
                           num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.device_count() == N_PROC * LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp

    from teal_tpu.config import SparsityConfig, get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache
    from teal_tpu.parallel import shard_cache, shard_params
    from teal_tpu.parallel.distributed import global_mesh

    cfg = get_model_config("tiny", n_layers=2, n_heads=8, n_kv_heads=8,
                           dim=256, intermediate_size=512, vocab_size=512)
    mesh = global_mesh(tp=LOCAL_DEVICES, dp=N_PROC)

    # every process computes the same init (same seed) and device_put
    # places its addressable shards; jax.make_array_from_callback-style
    # global arrays come free since the init values are replicated
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    with jax.set_mesh(mesh):
        params = shard_params(params, mesh, cfg)
        cache = shard_cache(KVCache.init(cfg, N_PROC, 16, jnp.float32),
                            mesh)
        tokens = jnp.tile(jnp.arange(4, dtype=jnp.int32)[None],
                          (N_PROC, 1))
        th = llama.zero_thresholds(cfg)

        @jax.jit
        def step(params, cache, tokens, th):
            return llama.forward(params, tokens, cache, 0, th, cfg=cfg,
                                 sp=SparsityConfig(enabled=True,
                                                   apply_prefill=False))

        logits, cache = step(params, cache, tokens, th)
        # fetch this process's addressable view and check it
        local = [np.asarray(s.data) for s in logits.addressable_shards]
    ok = all(np.isfinite(a).all() for a in local)
    print(f"[proc {pid}] multihost step ok={ok} "
          f"global logits {logits.shape} local shards {len(local)}",
          flush=True)
    assert ok


def main() -> None:
    if "MH_PROC" in os.environ:
        worker(int(os.environ["MH_PROC"]))
        return
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ, MH_PROC=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=780)
        tail = b"\n".join(out.splitlines()[-6:]).decode(errors="replace")
        print(f"--- proc {pid} (rc={p.returncode}) ---\n{tail}",
              flush=True)
        rc |= p.returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
