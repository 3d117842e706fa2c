"""Trustworthy on-device timing.

This runtime's execution pipeline is fully asynchronous and
`block_until_ready` is NOT a reliable sync point (observed returning in
<1 ms for 300+ ms programs); only a host transfer (`device_get`) reliably
drains execution. XLA additionally hoists loop-invariant work, and naive
repeat-timing with identical inputs can hit result caches. `bench_chained`
defends against all three:

  - the op runs inside a `lax.scan` whose carry feeds each iteration's
    input from the previous iteration's output (no LICM, no elision);
  - the jitted runner reduces its carry to scalars, and every timed call
    is synced by `device_get` of those scalars (a few bytes);
  - the two timed calls use different fresh inputs and different static
    lengths; per-step time is the SLOPE (t_long - t_short)/(n_long -
    n_short), cancelling launch/RPC fixed overhead;
  - a linearity check flags non-positive slopes (caching suspected).

This replaces the reference's CUDA-event + L2-flush harness
(`kernels/kernel_utils.py:4-50`) with TPU-appropriate machinery.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from teal_tpu.utils.compile_opts import decode_compiler_options  # noqa: F401 (re-export)


def sync(tree):
    """Reliable execution barrier: host-fetch (device_get) of the tree.
    Prefer reducing to scalars before calling this on large arrays."""
    return jax.device_get(tree)


def bench_chained(
    step_fn: Callable,
    carry0,
    *,
    n_short: int = 128,
    n_long: int = 1024,
    reps: int = 5,
) -> float:
    """Median per-step seconds of `step_fn(carry) -> carry`.

    `step_fn` must return a carry of the same structure such that every
    value the op consumes depends on the previous step's output.
    """

    def make(n):
        @jax.jit
        def run(c):
            def body(c, _):
                return step_fn(c), ()

            c, _ = jax.lax.scan(body, c, None, length=n)
            # reduce to scalars so the sync transfer is a few bytes
            return jax.tree.map(
                lambda a: jnp.sum(a.astype(jnp.float32)), c
            )

        return run

    run_s, run_l = make(n_short), make(n_long)

    def fresh(i):
        # Perturb the carry so no two timed calls share input values.
        return jax.tree.map(
            lambda a: a + jnp.asarray(1e-6 * (i + 1), a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            carry0,
        )

    # compile + warm (device_get is the only reliable sync)
    sync(run_s(fresh(0)))
    sync(run_l(fresh(1)))

    slopes = []
    for r in range(reps):
        cs, cl = fresh(2 + 2 * r), fresh(3 + 2 * r)
        t0 = time.perf_counter()
        sync(run_s(cs))
        t1 = time.perf_counter()
        sync(run_l(cl))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_long - n_short))
    slopes.sort()
    slope = slopes[len(slopes) // 2]
    if slope <= 0:
        raise RuntimeError(
            f"non-positive per-step slope {slope:.3e}s — caching suspected; "
            "make step_fn's input depend on its previous output"
        )
    return slope
