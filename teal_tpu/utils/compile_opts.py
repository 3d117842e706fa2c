"""Per-program XLA compile options for the decode path (experiment knob).

XLA's memory-space-assignment (MSA) pass can promote the decode KV cache
(67 MB per k/v at 7B/256 — fits v5e's 128 MB VMEM) to VMEM around the
fused decode-attention custom call, round-tripping the full cache per
layer iteration (+5.8 ms/token). Measured matrix (7B, one v5e chip,
within one run):

    config                 MSA on     MSA off
    dense,  einsum attn    53.6       49.5    tok/s
    dense,  fused attn     40.7 (!)   52.5
    sparse, einsum attn    94.7       83.2
    sparse, fused attn     95.1       87.1

MSA promotion HELPS every program except dense+fused (the pathology).
The production fix is therefore in the model layer: the fused
decode-attention kernel auto-enables only on the block-kernel path
(`models.llama._can_fused_decode`), where MSA behaves, and MSA stays on.

This helper remains as an opt-in experiment knob: set TEAL_TPU_NO_MSA=1
to compile decode programs with the MSA VMEM pass disabled (e.g. to
re-measure the matrix on a new libtpu). The option name is
TPU-generation-specific; unknown names fail compilation loudly, so
options are returned only for known generations.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_GEN_OPTION = {
    # device_kind substring -> MSA VMEM pass option for that generation
    # (verified on TPU v5 lite: xla_vf_vmem_memory_space_assignment)
    "v5": "xla_vf_vmem_memory_space_assignment",
    "v6": "xla_gf_vmem_memory_space_assignment",
}


def decode_compiler_options() -> Optional[dict]:
    """Compile options for single-token decode programs (default None)."""
    if not os.environ.get("TEAL_TPU_NO_MSA"):
        return None
    try:
        if jax.default_backend() == "cpu":
            return None
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for sub, opt in _GEN_OPTION.items():
        if sub in kind:
            return {opt: "false"}
    return None
