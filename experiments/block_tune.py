"""Tuning variants for the block-gather GEMV.

Variants:
  base     — current production kernel (out-block revisiting accumulation)
  scratch  — accumulate in VMEM scratch, write out once at the last step
  xvmem    — xpack as a whole-VMEM operand (no per-step pipelined stream)
  both     — scratch + xvmem
  manual   — grid=1, explicit triple-buffered make_async_copy gather loop

Run: python experiments/block_tune.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from teal_tpu.utils.bench_utils import bench_chained

SUB, LANES = 8, 128


def report(name, secs, nbytes):
    print(f"{name:40s} {secs*1e6:9.2f} us   {nbytes/secs/1e9:8.1f} GB/s",
          flush=True)


def make_inputs(K, N, G, keep):
    nb = K // G
    kk = max(1, int(round(nb * keep)))
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    w = jax.random.normal(kw, (K, N), jnp.bfloat16)
    idx = jnp.asarray(
        np.sort(np.random.default_rng(0).choice(nb, kk, replace=False)),
        jnp.int32)
    xpack0 = jax.random.normal(kx, (kk, SUB, LANES), jnp.bfloat16)
    return idx, xpack0, w, kk


def v_base(K, N, G, keep):
    idx, xpack0, w, kk = make_inputs(K, N, G, keep)

    def kernel(idx_ref, x_ref, w_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jax.lax.dot_general(
            x_ref[0][:, :G], w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(kk,),
            in_specs=[pl.BlockSpec((1, SUB, LANES), lambda i, ir: (i, 0, 0)),
                      pl.BlockSpec((G, N), lambda i, ir: (ir[i], 0))],
            out_specs=pl.BlockSpec((SUB, N), lambda i, ir: (0, 0))),
        out_shape=jax.ShapeDtypeStruct((SUB, N), jnp.float32))

    def step(xp):
        o = call(idx, xp, w)
        return xpack0 + 1e-20 * o.reshape(-1)[: kk * SUB * LANES].reshape(
            kk, SUB, LANES).astype(jnp.bfloat16)

    return step, xpack0, kk * G * N * 2


def v_scratch(K, N, G, keep, xvmem=False):
    idx, xpack0, w, kk = make_inputs(K, N, G, keep)

    def kernel(idx_ref, x_ref, w_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xi = x_ref[i][:, :G] if xvmem else x_ref[0][:, :G]
        acc_ref[...] += jax.lax.dot_general(
            xi, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    xspec = (pl.BlockSpec(memory_space=pltpu.VMEM) if xvmem else
             pl.BlockSpec((1, SUB, LANES), lambda i, ir: (i, 0, 0)))
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(kk,),
            in_specs=[xspec,
                      pl.BlockSpec((G, N), lambda i, ir: (ir[i], 0))],
            out_specs=pl.BlockSpec((SUB, N), lambda i, ir: (0, 0)),
            scratch_shapes=[pltpu.VMEM((SUB, N), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((SUB, N), jnp.float32))

    def step(xp):
        o = call(idx, xp, w)
        return xpack0 + 1e-20 * o.reshape(-1)[: kk * SUB * LANES].reshape(
            kk, SUB, LANES).astype(jnp.bfloat16)

    return step, xpack0, kk * G * N * 2


def v_manual(K, N, G, keep, depth=3):
    idx, xpack0, w, kk = make_inputs(K, N, G, keep)
    nb = K // G
    w3 = w.reshape(nb, G, N)

    def kernel(idx_ref, x_ref, w_hbm, o_ref):
        def body(bufs, sems, acc):
            def get_dma(slot, j):
                return pltpu.make_async_copy(
                    w_hbm.at[idx_ref[j]], bufs.at[slot], sems.at[slot])

            for j in range(depth - 1):
                get_dma(j, j).start()

            acc[...] = jnp.zeros_like(acc)

            def loop(j, _):
                slot = jax.lax.rem(j, depth)

                @pl.when(j + depth - 1 < kk)
                def _():
                    get_dma(jax.lax.rem(j + depth - 1, depth),
                            j + depth - 1).start()

                pltpu.make_async_copy(
                    w_hbm.at[idx_ref[j]], bufs.at[slot], sems.at[slot]
                ).wait()
                acc[...] += jax.lax.dot_general(
                    x_ref[j][:, :G], bufs[slot],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return ()

            jax.lax.fori_loop(0, kk, loop, ())
            o_ref[...] = acc[...]

        pl.run_scoped(
            body,
            pltpu.VMEM((depth, G, N), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.VMEM((SUB, N), jnp.float32),
        )

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((SUB, N), jnp.float32))

    def step(xp):
        o = call(idx, xp, w3)
        return xpack0 + 1e-20 * o.reshape(-1)[: kk * SUB * LANES].reshape(
            kk, SUB, LANES).astype(jnp.bfloat16)

    return step, xpack0, kk * G * N * 2


def main():
    print("device:", jax.devices()[0], flush=True)
    shapes = [(4096, 12288, 32, 0.5), (4096, 12288, 32, 1.0),
              (11008, 4096, 64, 0.5)]
    for K, N, G, keep in shapes:
        print(f"--- K={K} N={N} G={G} keep={keep}")
        for name, mk in [
            ("base", lambda: v_base(K, N, G, keep)),
            ("scratch", lambda: v_scratch(K, N, G, keep)),
            ("scratch+xvmem", lambda: v_scratch(K, N, G, keep, xvmem=True)),
            ("manual d3", lambda: v_manual(K, N, G, keep, 3)),
            ("manual d4", lambda: v_manual(K, N, G, keep, 4)),
        ]:
            try:
                step, x0, nbytes = mk()
                t = bench_chained(step, x0, n_short=64, n_long=512, reps=3)
                report(name, t, nbytes)
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__} {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
