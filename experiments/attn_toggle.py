#!/usr/bin/env python
"""Isolate the fused decode-attention kernel's effect on dense + sparse
decode (7B): fused on vs off, quick slope timing."""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from teal_tpu.config import SparsityConfig, get_model_config
import bench


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = get_model_config("7B")
    params = bench._fast_init(cfg, jnp.bfloat16)
    jax.device_get(params["layers"]["wq"].ravel()[0])
    log("params ready")
    import os

    for no_msa in ("", "1"):        # keep MSA (default) / disable MSA
        os.environ["TEAL_TPU_NO_MSA"] = no_msa
        msa = "" if no_msa else "1"
        for fused in (False, True):
            dense = SparsityConfig(enabled=False,
                                   fused_decode_attention=fused)
            tps = bench.decode_tps(cfg, params, dense, 256, 4, 16, reps=3)
            log(f"msa={'on ' if msa else 'off'} dense  fused={fused}: "
                f"{tps:.2f} tok/s ({1e3/tps:.2f} ms)")
            sp = SparsityConfig(enabled=True, kernel="block", block_size=64,
                                block_keep_frac=0.5, block_thresholding=True,
                                fused_decode_attention=fused)
            tps = bench.decode_tps(cfg, params, sp, 256, 4, 16, reps=3)
            log(f"msa={'on ' if msa else 'off'} sparse fused={fused}: "
                f"{tps:.2f} tok/s ({1e3/tps:.2f} ms)")


if __name__ == "__main__":
    main()
