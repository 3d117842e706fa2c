#!/usr/bin/env python
"""Chunked decode-attention VARIANT probe: where does the deep-context
per-layer time go, and which hloop formulation is fastest on real
Mosaic lowering?

Variants (identical double-buffered DMA skeleton, different math body):
  dma-only   DMA the chunks, do a trivial reduce — pipeline floor
  fori       production form: lax.fori_loop over Hkv, per-head
             [GH,C] MXU score dot + [GH,D] PV dot (decode_attention.py)
  unroll     same per-head math, python-unrolled (static slices)
  bcast      whole-chunk VPU broadcast-multiply-reduce:
             [Hkv,GH,C] scores via sum over d, PV via sum over c
  bdot       batched lax.dot_general over the head dim (may not lower)

Run on chip:  python experiments/attn_variant_probe.py
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, reps=30):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def make_probe(variant, Hkv, GH, T, D, C):
    Hq = Hkv * GH
    nch = T // C

    def kern(q_ref, kc_ref, vc_ref, o_ref, kb, vb, m_ref, d_ref, a_ref,
             csem):
        def start_chunk(ci, slot):
            pltpu.make_async_copy(
                kc_ref.at[:, pl.ds(ci * C, C)],
                kb.at[pl.ds(slot * Hkv, Hkv)], csem.at[slot, 0]).start()
            pltpu.make_async_copy(
                vc_ref.at[:, pl.ds(ci * C, C)],
                vb.at[pl.ds(slot * Hkv, Hkv)], csem.at[slot, 1]).start()

        start_chunk(0, 0)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        d_ref[...] = jnp.zeros_like(d_ref)
        a_ref[...] = jnp.zeros_like(a_ref)

        def wait_chunk(slot):
            pltpu.make_async_copy(
                kc_ref.at[:, pl.ds(0, C)],
                kb.at[pl.ds(slot * Hkv, Hkv)], csem.at[slot, 0]).wait()
            pltpu.make_async_copy(
                vc_ref.at[:, pl.ds(0, C)],
                vb.at[pl.ds(slot * Hkv, Hkv)], csem.at[slot, 1]).wait()

        def per_head_update(qh, k_, v_, mh, dh, ah):
            # [GH, C] scores on the MXU, [GH, D] PV on the MXU
            s = jax.lax.dot_general(
                qh.astype(k_.dtype), k_[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_new = jnp.maximum(mh, jnp.max(s, axis=1, keepdims=True))
            e = jnp.exp(s - m_new)
            corr = jnp.exp(mh - m_new)
            d_new = dh * corr + jnp.sum(e, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                e.astype(v_.dtype), v_[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, d_new, ah * corr + pv

        def body_fori(slot):
            def hloop(hh, _):
                h0 = hh * GH
                m, d, a = per_head_update(
                    q_ref[pl.ds(h0, GH), :], kb[slot * Hkv + hh],
                    vb[slot * Hkv + hh], m_ref[pl.ds(h0, GH), :],
                    d_ref[pl.ds(h0, GH), :], a_ref[pl.ds(h0, GH), :])
                m_ref[pl.ds(h0, GH), :] = m
                d_ref[pl.ds(h0, GH), :] = d
                a_ref[pl.ds(h0, GH), :] = a
                return ()
            jax.lax.fori_loop(0, Hkv, hloop, ())

        def body_unroll(slot):
            for hh in range(Hkv):
                h0 = hh * GH
                m, d, a = per_head_update(
                    q_ref[h0:h0 + GH, :], kb[slot * Hkv + hh],
                    vb[slot * Hkv + hh], m_ref[h0:h0 + GH, :],
                    d_ref[h0:h0 + GH, :], a_ref[h0:h0 + GH, :])
                m_ref[h0:h0 + GH, :] = m
                d_ref[h0:h0 + GH, :] = d
                a_ref[h0:h0 + GH, :] = a

        def body_bcast(slot):
            q3 = q_ref[...].reshape(Hkv, GH, D).astype(jnp.float32)
            k3 = kb[pl.ds(slot * Hkv, Hkv)].astype(jnp.float32)
            v3 = vb[pl.ds(slot * Hkv, Hkv)].astype(jnp.float32)
            s = jnp.sum(q3[:, :, None, :] * k3[:, None, :, :], axis=3)
            m_old = m_ref[...].reshape(Hkv, GH, 1)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=2, keepdims=True))
            e = jnp.exp(s - m_new)                      # [Hkv, GH, C]
            corr = jnp.exp(m_old - m_new)
            d_new = (d_ref[...].reshape(Hkv, GH, 1) * corr
                     + jnp.sum(e, axis=2, keepdims=True))
            pv = jnp.sum(e[:, :, :, None] * v3[:, None, :, :], axis=2)
            a_old = a_ref[...].reshape(Hkv, GH, D)
            m_ref[...] = m_new.reshape(Hq, 1)
            d_ref[...] = d_new.reshape(Hq, 1)
            a_ref[...] = (a_old * corr + pv).reshape(Hq, D)

        def body_bdot(slot):
            q3 = q_ref[...].reshape(Hkv, GH, D)
            k3 = kb[pl.ds(slot * Hkv, Hkv)]
            v3 = vb[pl.ds(slot * Hkv, Hkv)]
            s = jax.lax.dot_general(
                q3.astype(k3.dtype), k3[...],
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [Hkv, GH, C]
            m_old = m_ref[...].reshape(Hkv, GH, 1)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=2, keepdims=True))
            e = jnp.exp(s - m_new)
            corr = jnp.exp(m_old - m_new)
            d_new = d_ref[...].reshape(Hkv, GH, 1) * corr + jnp.sum(
                e, axis=2, keepdims=True)
            pv = jax.lax.dot_general(
                e.astype(v3.dtype), v3[...],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [Hkv, GH, D]
            a_old = a_ref[...].reshape(Hkv, GH, D)
            m_ref[...] = m_new.reshape(Hq, 1)
            d_ref[...] = d_new.reshape(Hq, 1)
            a_ref[...] = (a_old * corr + pv).reshape(Hq, D)

        def body_dma(slot):
            # touch the buffers so the DMA isn't dead-code eliminated
            a_ref[0:1, :] = a_ref[0:1, :] + (
                kb[slot * Hkv, 0:1, :] + vb[slot * Hkv, 0:1, :]
            ).astype(jnp.float32)
            d_ref[0:1, :] = d_ref[0:1, :] + 1.0

        body = {"fori": body_fori, "unroll": body_unroll,
                "bcast": body_bcast, "bdot": body_bdot,
                "dma-only": body_dma}[variant]

        def cloop(ci, _):
            slot = jax.lax.rem(ci, 2)
            wait_chunk(slot)

            @pl.when(ci + 1 < nch)
            def _():
                start_chunk(ci + 1, jax.lax.rem(ci + 1, 2))

            body(slot)
            return ()

        jax.lax.fori_loop(0, nch, cloop, ())
        o_ref[...] = a_ref[...] * (1.0 / jnp.maximum(d_ref[...], 1e-30))

    def call(q, kc, vc):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Hq, D), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * Hkv, C, D), kc.dtype),
                pltpu.VMEM((2 * Hkv, C, D), vc.dtype),
                pltpu.VMEM((Hq, 1), jnp.float32),
                pltpu.VMEM((Hq, 1), jnp.float32),
                pltpu.VMEM((Hq, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )(q, kc, vc)

    # the tunnel runtime costs ~23 ms per host dispatch — time the
    # kernel by in-program repetition with a serial dependence (o feeds
    # q) and report the slope between two repetition counts instead
    @functools.partial(jax.jit, static_argnums=3)
    def run_n(q, kc, vc, n):
        def body(i, qq):
            o = call(qq, kc, vc)
            return qq + o * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, n, body, q)

    return run_n


def main():
    T, D, C = 2048, 128, 256
    for name, Hkv, GH in (("7B-MHA", 32, 1), ("8B-GQA", 8, 4)):
        Hq = Hkv * GH
        q = jnp.full((Hq, D), 0.02, jnp.float32)
        kc = jnp.full((Hkv, T, D), 0.03, jnp.bfloat16)
        vc = jnp.full((Hkv, T, D), 0.05, jnp.bfloat16)
        bytes_read = 2 * Hkv * T * D * 2
        roof = bytes_read / (HBM_GBPS * 1e9)
        log(f"--- {name}: Hkv={Hkv} GH={GH} T={T} | DMA roofline "
            f"{roof*1e6:.1f} us/layer ---")
        ref = None
        n_lo, n_hi = 8, 40
        for variant in ("dma-only", "fori", "unroll", "bcast", "bdot"):
            for attempt in range(3):
                try:
                    run = make_probe(variant, Hkv, GH, T, D, C)
                    # recover o from the n=1 feedback (q + o*1e-6);
                    # fp32 cancellation leaves ~4% noise — smoke only
                    out = (np.asarray(jax.device_get(run(q, kc, vc, 1)))
                           - np.asarray(q)) * 1e6
                    t_lo = timeit(lambda: jax.device_get(
                        run(q, kc, vc, n_lo)), reps=8)
                    t_hi = timeit(lambda: jax.device_get(
                        run(q, kc, vc, n_hi)), reps=8)
                    t = (t_hi - t_lo) / (n_hi - n_lo)
                    note = ""
                    if variant == "fori":
                        ref = out
                    elif ref is not None and variant != "dma-only":
                        rel = (np.linalg.norm(out - ref)
                               / (np.linalg.norm(ref) + 1e-30))
                        note = f" (vs fori rel {rel:.1e})"
                    log(f"{variant:9s}: {t*1e6:8.1f} us/layer "
                        f"({t/roof:5.1f}x roofline, x32 layers = "
                        f"{t*32*1e3:5.2f} ms/tok){note}")
                    break
                except Exception as e:
                    msg = str(e)
                    if ("remote_compile" in msg or "HTTP 500" in msg) \
                            and attempt < 2:
                        log(f"{variant:9s}: transient compile error, "
                            "retrying")
                        time.sleep(20)
                        continue
                    log(f"{variant:9s}: FAIL {type(e).__name__}: "
                        f"{msg[:160]}")
                    break


if __name__ == "__main__":
    main()
