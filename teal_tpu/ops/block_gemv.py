"""Block-sparse GEMV: the TPU-native sparse decode kernel.

The reference's Triton kernel (`kernels/sparse_gemv.py:49-142`) skips
individual weight rows via masked loads — efficient on GPUs, but on TPU
per-row gathers cost a fixed ~180 ns of grid/DMA machinery per row
(measured; see experiments/kernel_probe.py), which is slower than dense.
TPU DMA wants big contiguous blocks, so sparsity here is *group-granular*:
the input dimension is cut into groups of G rows (G a multiple of the bf16
sublane tile, 16); a group is kept if its activation score (max |x| within
the group) clears a calibrated group threshold. Kept groups' weight slabs
`[G, N]` are gathered by a scalar-prefetched Pallas grid — each step DMAs
one contiguous G-row slab and accumulates an MXU partial product into a
VMEM-resident fp32 output block (deterministic accumulation, unlike the
reference's fp16 `atomic_add` split-K, sparse_gemv.py:83).

Capacity is static (jit-specialized per sparsity level, the analog of the
reference's SPARSITY_BIN autotune key, sparse_gemv.py:47). Selection
follows THE unified rule (docs/KERNEL_NOTES.md "Selection semantics"):
top-`k_keep` groups by score in top-k mode, or — in threshold mode —
survivors (`score > t`) in ascending index order, first `k_keep` kept.
Both are implemented identically here, in the fused kernel's scalar-core
scan, and in the accuracy path (`sparsify.sparsify_groups`).

Weight layout: plain 2D `[K, N]` (K = input dim). Group slabs at G-row
granularity are contiguous tile-rows in the TPU's tiled layout, so gather
DMAs run at full HBM bandwidth.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def block_gather_gemv(idx, xpack, w, *, G: int, k_keep: int,
                      out_dtype=jnp.bfloat16):
    """y[1, N] = sum over kept groups of xpack[g] @ w[G-slab g].

    idx:   [k_keep] int32 — kept group indices (ascending for DMA locality)
    xpack: [k_keep, 1, 128] — kept group j's x values in row j, lanes
           [:G] (broadcast to the [8, G] MXU lhs in-kernel); or
           [k_keep, 8, 128] with distinct per-batch sublane rows
           (batched decode)
    w:     [K, N]
    """
    K, N = w.shape
    if K % G or N % LANES:
        raise ValueError(
            f"block kernel needs K divisible by G and N by 128; got "
            f"K={K}, N={N}, G={G} (model dims too small for block mode — "
            "use kernel='masked_dense')"
        )
    return block_gather_gemv_multi(idx, xpack, (w,), G=G, k_keep=k_keep,
                                   out_dtype=out_dtype)[0]


def effective_block_size(G: int, K: int) -> int:
    """Grid steps cost a fixed ~200 ns regardless of slab size (measured),
    so deep input dims double the group size to keep the per-step DMA
    large enough to amortize it (e.g. down-proj K=11008: G 32 -> 64).
    Capped at one lane tile (128) so a group's x values fit one row of
    the kernel's [rows, 128] input layout, and clamped to the largest
    power-of-two divisor of K that is <= the request (tiny-config dims
    below or misaligned with the requested block size would otherwise
    give zero/ragged groups)."""
    g = G
    while g > 1 and (g > K or K % g):
        g //= 2
    while K // g > 256 and K % (g * 2) == 0 and g < LANES:
        g *= 2
    return g


class _WeightPlan:
    """Describes how the gather kernels handle one weight operand.

    kind "array": plain bf16/fp32/int8 [K, N] (or layer-stacked
    [L, K, N]); one DMA of a [G, N] slab per kept group, one MXU dot.

    kind "int4": dict {"qp", "sz"} — 4-bit weights nibble-packed along
    the input dim (`pack_int4`, two rows per byte: rows [gG, gG+G/2) in
    the low nibbles, [gG+G/2, gG+G) in the high nibbles of packed rows
    [gG/2, (g+1)G/2)), plus per-(group, out-channel) affine params
    sz[g] = [scale_g, zero_g] stacked [nb, 2, N]. Two DMAs per kept
    group (packed slab [G/2, N] int8 + sz row [2, N]); dequant is
    FACTORED through the dot — since scale/zero are constant within a
    group's K-rows,
        x @ (nib*scale + zero) = (x @ nib) * scale + sum(x) * zero
    so the MXU multiplies raw nibbles and the affine lands as one VPU
    fma on the [8, N] dot result (no dequantized slab materialized).
    Requires G/2 >= 32 (the int8 sublane tile): int4 sparse mode runs
    at G >= 64 with quantization group == gather group.
    """

    def __init__(self, w):
        if isinstance(w, dict) and "qp" in w:
            self.kind = "int4"
            self.arrays = (w["qp"], w["sz"])
            self.N = int(w["qp"].shape[-1])
            self.stacked = w["qp"].ndim == 3
        else:
            self.kind = "array"
            self.arrays = (w,)
            self.N = int(w.shape[-1])
            self.stacked = w.ndim == 3
        self.n_dma = len(self.arrays)

    def buf_shapes(self, G: int, depth: int):
        if self.kind == "int4":
            qp, sz = self.arrays
            return [((depth, G // 2, self.N), qp.dtype),
                    ((depth, 2, self.N), sz.dtype)]
        return [((depth, G, self.N), self.arrays[0].dtype)]

    def key(self, G: int):
        """Hashable cache key component for jit specialization."""
        return (self.kind, self.N, self.stacked,
                tuple(str(a.dtype) for a in self.arrays))


def _plan_weights(ws):
    return [_WeightPlan(w) for w in ws]


def _pick_depth(plans, G: int, budget: int = 9 << 20) -> int:
    """Slot-buffer pipeline depth: triple-buffer when the slabs fit a
    ~9 MB VMEM budget, else double-buffer (still overlaps compute with
    one in-flight gather). Big groups (G=128) with wide outputs would
    blow the ~16 MB/core VMEM at depth 3 (e.g. gate/up slabs are
    [128, 11008] bf16 = 2.8 MB each)."""
    import math

    per_slot = sum(
        jnp.dtype(dt).itemsize * math.prod(shape[1:])
        for p in plans for shape, dt in p.buf_shapes(G, 1)
    )
    return 3 if 3 * per_slot <= budget else 2


def _xi_at(x_ref, j, G: int):
    """Group j's x values as the [SUBLANES, G] MXU lhs.

    x is packed [rows, 1, LANES] for batch-1 (one row per group,
    broadcast across sublanes HERE instead of materializing the
    8x-replicated copy in XLA — Mosaic only dynamic-indexes the leading
    non-tiled dim, so the row carries its own (1, 128) tile), or
    [rows, SUBLANES, LANES] with distinct per-batch sublane rows
    (batched decode)."""
    if x_ref.shape[1] == 1:
        row = x_ref[j][0, :G]
        return jnp.broadcast_to(row[None, :], (SUBLANES, G))
    return x_ref[j][:, :G]


def _dma_copies(plan, w_refs, bufs, sems, layer_ref, slot, gidx, G: int):
    """The gather copy descriptors for group index value `gidx` of one
    weight (started at issue time, re-built identically at wait time).

    w_refs/bufs: this weight's refs/slot buffers; sems: [depth, n_dma].
    Slab starts are multiples of G (>= the dtype's sublane tile), so
    every slab is whole contiguous tile-rows in HBM. 3D weights are
    layer-stacked [L, ...]: the scalar-prefetched layer index joins the
    gather, so scan-over-layers models never slice big weights outside
    the kernel (an XLA dynamic-slice feeding a custom call would
    materialize a full copy of the layer's weights every decode step).
    """
    if plan.kind == "int4":
        qp_ref, sz_ref = w_refs
        start_row = pl.multiple_of(gidx * (G // 2), G // 2)
        if plan.stacked:
            src_qp = qp_ref.at[layer_ref[0], pl.ds(start_row, G // 2), :]
            src_sz = sz_ref.at[layer_ref[0], gidx]
        else:
            src_qp = qp_ref.at[pl.ds(start_row, G // 2), :]
            src_sz = sz_ref.at[gidx]
        return [
            pltpu.make_async_copy(src_qp, bufs[0].at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(src_sz, bufs[1].at[slot], sems.at[slot, 1]),
        ]
    start_row = pl.multiple_of(gidx * G, G)
    if plan.stacked:
        src = w_refs[0].at[layer_ref[0], pl.ds(start_row, G), :]
    else:
        src = w_refs[0].at[pl.ds(start_row, G), :]
    return [pltpu.make_async_copy(src, bufs[0].at[slot], sems.at[slot, 0])]


def _start_dmas(plan, w_refs, bufs, sems, layer_ref, slot, gidx, G: int):
    for cp in _dma_copies(plan, w_refs, bufs, sems, layer_ref, slot, gidx, G):
        cp.start()


def _accumulate(plan, w_refs, bufs, sems, layer_ref, slot, gidx, xi, acc,
                col0: int, G: int):
    """Wait for one weight's slot DMAs and accumulate its contribution
    into acc[:, col0:col0+N]."""
    N = plan.N
    for cp in _dma_copies(plan, w_refs, bufs, sems, layer_ref, slot, gidx, G):
        cp.wait()
    if plan.kind == "int4":
        pi = bufs[0][slot].astype(jnp.int32)          # [G/2, N]
        lo = (pi & 15).astype(jnp.bfloat16)
        hi = ((pi >> 4) & 15).astype(jnp.bfloat16)
        nib = jnp.concatenate([lo, hi], axis=0)       # [G, N]
        dot_res = jax.lax.dot_general(
            xi, nib, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sz = bufs[1][slot].astype(jnp.float32)        # [2, N]
        sumx = jnp.sum(xi.astype(jnp.float32), axis=1, keepdims=True)
        acc[:, col0:col0 + N] += dot_res * sz[0][None, :] \
            + sumx * sz[1][None, :]
    else:
        wb = bufs[0][slot]
        if wb.dtype != jnp.bfloat16 and wb.dtype != jnp.float32:
            wb = wb.astype(jnp.bfloat16)
        acc[:, col0:col0 + N] += jax.lax.dot_general(
            xi, wb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _scoped_buffers(plans, G: int, depth: int, n_out: int,
                    rows: int = SUBLANES):
    """VMEM slot buffers + DMA semaphores + accumulator for run_scoped.
    Returns (scope_args, unpack) where unpack(scoped) ->
    (per-weight bufs list, per-weight sems list, acc).

    rows: accumulator sublane rows (8 default; 16 for the single-launch
    B<=16 decode — the MXU lhs is then two sublane tiles)."""
    args = []
    counts = []
    for p in plans:
        shapes = p.buf_shapes(G, depth)
        counts.append(len(shapes))
        for shape, dt in shapes:
            args.append(pltpu.VMEM(shape, dt))
    for p in plans:
        args.append(pltpu.SemaphoreType.DMA((depth, p.n_dma)))
    args.append(pltpu.VMEM((rows, n_out), jnp.float32))

    def unpack(scoped):
        bufs, k = [], 0
        for c in counts:
            bufs.append(scoped[k:k + c])
            k += c
        sems = scoped[k:k + len(plans)]
        acc = scoped[k + len(plans)]
        return bufs, sems, acc

    return args, unpack


def _manual_gather_kernel(idx_ref, layer_ref, x_ref, *refs, G: int, plans,
                          k_keep: int, depth: int):
    """Triple-buffered explicit-DMA gather over kept groups.

    For each kept group j, one DMA set per weight copies its contiguous
    slab(s) into the slot buffers; one MXU dot per weight accumulates
    into the fp32 VMEM accumulator. Explicit `depth`-deep buffering
    keeps `depth-1` group-gathers in flight — measured ~8% faster than
    the Pallas grid pipeline at these shapes (93% of HBM peak;
    experiments/block_tune.py)."""
    n_refs = sum(p.n_dma for p in plans)
    w_ref_groups, k = [], 0
    for p in plans:
        w_ref_groups.append(refs[k:k + p.n_dma])
        k += p.n_dma
    o_ref = refs[k]
    offs = [0]
    for p in plans:
        offs.append(offs[-1] + p.N)

    def body(*scoped):
        bufs, sems, acc = _unpack(scoped)

        def start(slot, j):
            for wi, p in enumerate(plans):
                _start_dmas(p, w_ref_groups[wi], bufs[wi], sems[wi],
                            layer_ref, slot, idx_ref[j], G)

        for j in range(min(depth - 1, k_keep)):
            start(j, j)

        acc[...] = jnp.zeros_like(acc)

        def loop(j, _):
            slot = jax.lax.rem(j, depth)

            @pl.when(j + depth - 1 < k_keep)
            def _():
                start(jax.lax.rem(j + depth - 1, depth), j + depth - 1)

            xi = _xi_at(x_ref, j, G)
            for wi, p in enumerate(plans):
                _accumulate(p, w_ref_groups[wi], bufs[wi], sems[wi],
                            layer_ref, slot, idx_ref[j], xi, acc,
                            offs[wi], G)
            return ()

        jax.lax.fori_loop(0, k_keep, loop, ())
        o_ref[...] = acc[...]

    scope_args, _unpack = _scoped_buffers(plans, G, depth, offs[-1])
    pl.run_scoped(body, *scope_args)


@functools.partial(jax.jit, static_argnames=("G", "k_keep", "out_dtype",
                                             "depth", "out_rows"))
def block_gather_gemv_multi(idx, xpack, ws, *, G: int, k_keep: int,
                            out_dtype=jnp.bfloat16,
                            depth: Optional[int] = None,
                            layer=None, out_rows: int = 1):
    """Fused multi-weight gather GEMV: one launch gathers each kept G-row
    slab from EVERY weight (q/k/v or gate/up share one selection and one
    kernel — the TPU analog of the reference's fused-QKV kernel,
    `kernels/sparse_gemv.py:147-237`). Weights stay separate arrays, so
    tensor-parallel sharding specs are untouched.

    Weights may be 2D [K, N] or layer-stacked 3D [L, K, N] with `layer`
    the (traced) layer index — the stacked form is what scan-over-layers
    models must use (see src_slab note). Returns a list of [1, N_w]
    outputs."""
    ws = tuple(ws)
    plans = _plan_weights(ws)
    if depth is None:
        depth = _pick_depth(plans, G)
    Ns = tuple(p.N for p in plans)
    n_tot = sum(Ns)
    flat = [a for p in plans for a in p.arrays]
    if layer is None:
        layer = jnp.zeros((1,), jnp.int32)
    else:
        layer = jnp.asarray(layer, jnp.int32).reshape(1)

    kernel = functools.partial(
        _manual_gather_kernel, G=G, plans=plans, k_keep=k_keep, depth=depth,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in flat],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SUBLANES, n_tot), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * SUBLANES * k_keep * G * n_tot,
            bytes_accessed=k_keep * sum(
                (G // 2 if p.kind == "int4" else G) * p.N
                * p.arrays[0].dtype.itemsize
                for p in plans
            ),
            transcendentals=0,
        ),
    )(idx, layer, xpack, *flat)
    outs = []
    off = 0
    for N in Ns:
        outs.append(out[:out_rows, off:off + N].astype(out_dtype))
        off += N
    return outs


def _slab_copy(ref, buf, sem, layer_ref, nbp: int):
    """Async-copy descriptor for one layer's [nbp, 128] slab of a packed
    per-layer operand ([nbp, 128] unstacked, or [L*nbp, 128] stacked with
    the layer axis folded into the sublane dim — see `pack_norm3`).
    Rebuild identically at start and wait time."""
    if ref.shape[0] == nbp:
        src = ref
    else:
        src = ref.at[pl.ds(pl.multiple_of(layer_ref[0] * nbp, nbp), nbp)]
    return pltpu.make_async_copy(src, buf, sem)


def _norm_fold(x3_ref, norm_ref, xn_ref, g_ref, gsem, layer_ref, *,
               nb: int, G: int, norm_eps: float):
    """In-kernel rms_norm: normalize raw packed x3 into xn_ref using the
    (possibly layer-stacked) packed gain in `norm_ref` (ANY memory; its
    DMA overlaps the sum-of-squares reduction). Mirrors `llama.rms_norm`
    op order so calibrated thresholds apply unchanged.

    Gains are packed 2D fp32 ([nbp, 128], stacked [L*nbp, 128] with nbp
    = nb padded to the fp32 sublane tile; see `pack_norm3`): a layer's
    slab is then a tile-aligned sublane-dim slice — a [nb, 1, 128]
    layout would make the DMA slice across a size-1 tiled sublane dim,
    which Mosaic cannot lower."""
    nbp = _norm_rows(nb)
    gcp = _slab_copy(norm_ref, g_ref, gsem, layer_ref, nbp)
    gcp.start()
    xf = x3_ref[...].astype(jnp.float32)           # [nb, rows, 128]
    # per-sublane-row mean square: row r is batch element r (batched
    # decode) or THE element (rows == 1); zero-padded rows normalize to
    # zero either way
    scale = jax.lax.rsqrt(
        jnp.sum(xf * xf, axis=(0, 2), keepdims=True) / jnp.float32(nb * G)
        + norm_eps)                                # [1, rows, 1]
    gcp.wait()
    # slice the REF, then expand dims on the loaded value: the combined
    # `g_ref[...][:nb, None, :]` form lowers to a gather op Mosaic
    # rejects ("Shape mismatch in input, indices and output") whenever
    # nb < nbp (tiny configs; experiments/_repro_normfold.py)
    g = g_ref[:nb, :].astype(x3_ref.dtype)
    xn_ref[...] = (xf * scale).astype(x3_ref.dtype) * g[:, None, :]


def _select_scan(thr, x_ref, scores_v, scores_s, idx_s, ssem, *,
                 nb: int, cap: int, fixed: bool = False,
                 ramp_start=None, ramp_depth: int = 0):
    """VPU group scores -> SMEM -> scalar-core threshold+capacity scan.
    Fills idx_s and returns the survivor count (the unified selection
    rule: first `cap` survivors by index). idx_s entries beyond the
    count are left unwritten — `_gather_loop` guards every read with
    `j < count`.

    `ramp_start(slot, gidx)` (with `ramp_depth` = the gather pipeline
    depth): issue the first `ramp_depth - 1` survivors' weight DMAs
    from INSIDE the scan as they are found, so the gather ramp runs
    under the rest of the scalar scan instead of after it (the caller
    then passes skip_ramp=True to `_gather_loop`).

    `fixed` (diagnostic, `SparsityConfig.debug_fixed_selection`): skip
    the whole selection head and keep groups 0..cap-1 — same DMA/MXU
    work at full capacity, no scores/SMEM/scalar scan. Isolates the
    selection latency at each launch. NOT a production mode."""
    if fixed:
        def fill(j, _):
            idx_s[j] = j
            return ()

        jax.lax.fori_loop(0, cap, fill, ())
        if ramp_start is not None:
            for j in range(min(ramp_depth - 1, cap)):
                ramp_start(j, j)
        return cap
    # group score: max |x| over lanes AND sublane rows — the pooled-max
    # batched rule (`select_groups_batched`); identical to the row-0
    # score when rows == 1 or rows are replicated/zero-padded.
    # TWO-STEP reduction, every intermediate rank 2 with no
    # size-1-middle-axis slice: a single axis=(1,2) reduction (with or
    # without keepdims + slice) crashes the current Mosaic
    # layout-inference pass (inferReshape check
    # `arr.size() >= layout_rank`, layout.h:320 SIGABRT)
    m = jnp.max(jnp.abs(x_ref[...].astype(jnp.float32)), axis=2)  # [nb, rows]
    scores_v[...] = jnp.max(m, axis=1, keepdims=True)             # [nb, 1]
    cp = pltpu.make_async_copy(scores_v, scores_s, ssem)
    cp.start()
    cp.wait()

    def scan_body(i, cnt):
        keep = (scores_s[i, 0] > thr) & (cnt < cap)

        @pl.when(keep)
        def _():
            idx_s[cnt] = i
            if ramp_start is not None:
                @pl.when(cnt < ramp_depth - 1)
                def _():
                    ramp_start(cnt, i)

        return cnt + jax.lax.select(keep, 1, 0)

    return jax.lax.fori_loop(0, nb, scan_body, 0)


def _gather_loop(plans, w_ref_groups, bufs, sems, layer_ref, x_ref, idx_s,
                 count, acc, offs, *, G: int, cap: int, depth: int,
                 skip_ramp: bool = False):
    """Pipelined gather+MXU-accumulate over the first `count` kept groups
    (indices in idx_s). Shared by the fused-select kernel, the fused
    attention-block kernel, and the whole-token kernel. `skip_ramp`:
    the first depth-1 DMA sets were already issued by the caller (from
    inside the selection scan, see `_select_scan(ramp_start=...)`)."""
    def start(slot, j):
        for wi, p in enumerate(plans):
            _start_dmas(p, w_ref_groups[wi], bufs[wi], sems[wi],
                        layer_ref, slot, idx_s[j], G)

    if not skip_ramp:
        for j in range(min(depth - 1, cap)):
            @pl.when(j < count)
            def _(j=j):
                start(j, j)

    acc[...] = jnp.zeros_like(acc)

    def loop(j, _):
        slot = jax.lax.rem(j, depth)

        @pl.when(j + depth - 1 < count)
        def _():
            start(jax.lax.rem(j + depth - 1, depth), j + depth - 1)

        @pl.when(j < count)
        def _():
            xi = _xi_at(x_ref, idx_s[j], G)
            for wi, p in enumerate(plans):
                _accumulate(p, w_ref_groups[wi], bufs[wi], sems[wi],
                            layer_ref, slot, idx_s[j], xi, acc,
                            offs[wi], G)
        return ()

    jax.lax.fori_loop(0, cap, loop, ())


def _fused_select_gather_kernel(thr_ref, layer_ref, x3_ref, *refs, G: int,
                                plans, nb: int, cap: int, depth: int,
                                norm: bool = False, norm_eps: float = 0.0,
                                out_packed: bool = False,
                                res: bool = False, silu_pair: bool = False,
                                fixed_sel: bool = False):
    """Selection fused into the gather: group scores are reduced on the
    VPU, DMA'd to SMEM, and a scalar-core scan over the `nb` groups builds
    the kept-index list and issues the weight DMAs — no XLA top-k /
    sort / gather ops between kernels. Threshold semantics with a static
    capacity `cap`; groups beyond capacity are dropped lowest-index-last
    (scores are scanned in order, so the FIRST `cap` survivors win —
    combined with a calibrated threshold the overflow case is rare).

    With `norm=True`, rms_norm is folded in too: x3 carries the RAW
    residual stream and refs[0] is the packed norm gain (see
    `pack_norm3`, ANY memory). The gain DMA overlaps the sum-of-squares
    reduction; normalization mirrors `llama.rms_norm`'s op order
    ((x_f32 * rsqrt(mean(x^2) + eps)) -> x.dtype, * gain), so thresholds
    calibrated on normalized activations apply unchanged — and the two
    XLA rms_norm dispatches per layer disappear.

    Packed-pipeline modes (G == 128 decode, batch 1 — every kernel's
    packed-row output IS the next kernel's x3 input, so a whole layer
    chains with zero XLA ops between launches):
      - `out_packed`: write o_ref as [n_out/128, 1, 128] rows (static
        per-tile slices of the accumulator) instead of [8, n_out] lanes.
      - `res`: an extra packed [n_out/128, 1, 128] residual input is
        added in fp32 before the cast (the XLA `h + proj` disappears).
      - `silu_pair`: plans must be (gate, up) with equal N; rows are
        silu(gate) * up — the MLP activation never exists in XLA."""
    if norm:
        norm_ref, refs = refs[0], refs[1:]
    if res:
        res_ref, refs = refs[0], refs[1:]
    w_ref_groups, k = [], 0
    for p in plans:
        w_ref_groups.append(refs[k:k + p.n_dma])
        k += p.n_dma
    o_ref = refs[k]
    offs = [0]
    for p in plans:
        offs.append(offs[-1] + p.N)

    def body(*scoped):
        if norm:
            xn_ref, g_ref, gsem = scoped[-3:]
            scoped = scoped[:-3]
        bufs, sems, acc = _unpack(scoped[:-5])
        scores_v = scoped[-5]           # VMEM (nb, 1) f32
        scores_s = scoped[-4]           # SMEM (nb, 1) f32
        idx_s = scoped[-3]              # SMEM (cap,) i32
        cnt_s = scoped[-2]              # SMEM (1,) i32
        ssem = scoped[-1]               # DMA sem for the scores copy

        # 0. optional folded rms_norm: gain DMA overlaps the ssq reduce
        if norm:
            _norm_fold(x3_ref, norm_ref, xn_ref, g_ref, gsem, layer_ref,
                       nb=nb, G=G, norm_eps=norm_eps)
            x_ref = xn_ref
        else:
            x_ref = x3_ref

        # 1-3. scores + scalar-core threshold/capacity scan; the first
        # depth-1 survivors' weight DMAs issue from inside the scan
        def ramp(slot, gidx):
            for wi, p in enumerate(plans):
                _start_dmas(p, w_ref_groups[wi], bufs[wi], sems[wi],
                            layer_ref, slot, gidx, G)

        count = _select_scan(thr_ref[0], x_ref, scores_v, scores_s, idx_s,
                             ssem, nb=nb, cap=cap, fixed=fixed_sel,
                             ramp_start=ramp, ramp_depth=depth)
        cnt_s[0] = count

        # 4. gather + accumulate (same structure as the prefetch kernel)
        _gather_loop(plans, w_ref_groups, bufs, sems, layer_ref, x_ref,
                     idx_s, count, acc, offs, G=G, cap=cap, depth=depth,
                     skip_ramp=True)
        if silu_pair:
            for j in range(plans[0].N // LANES):
                g_ = acc[0:1, j * LANES:(j + 1) * LANES]
                u_ = acc[0:1, offs[1] + j * LANES:offs[1] + (j + 1) * LANES]
                row = g_ * (1.0 / (1.0 + jnp.exp(-g_))) * u_
                o_ref[j] = row.astype(o_ref.dtype)
        elif out_packed:
            for j in range(offs[-1] // LANES):
                row = acc[0:1, j * LANES:(j + 1) * LANES]
                if res:
                    row = row + res_ref[j].astype(jnp.float32)
                o_ref[j] = row.astype(o_ref.dtype)
        else:
            o_ref[...] = acc[...]

    scope_args, _unpack = _scoped_buffers(plans, G, depth, offs[-1])
    extra = []
    if norm:
        extra = [pltpu.VMEM((nb, 1, LANES), x3_ref.dtype),  # normalized x
                 pltpu.VMEM((_norm_rows(nb), LANES), norm_ref.dtype),
                 pltpu.SemaphoreType.DMA(())]
    pl.run_scoped(
        body,
        *scope_args,
        pltpu.VMEM((nb, 1), jnp.float32),
        pltpu.SMEM((nb, 1), jnp.float32),
        pltpu.SMEM((cap,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
        *extra,
    )


@functools.partial(jax.jit, static_argnames=("G", "cap", "out_dtype",
                                             "depth", "norm_eps",
                                             "fixed_sel"))
def fused_select_gather_gemv(x3, thr, ws, *, G: int, cap: int,
                             out_dtype=jnp.bfloat16,
                             depth: Optional[int] = None,
                             layer=None, norm3=None,
                             norm_eps: float = 1e-5,
                             fixed_sel: bool = False):
    """Threshold-mode sparse GEMV with in-kernel selection.

    x3:  [nb, 1, 128] (`pack_x3`) — group g's x values in row g's lanes
         [:G], zero beyond G; the kernel broadcasts the single sublane
         row to the MXU lhs in-VMEM (batched callers pass [nb, 8, 128]
         with batch b in sublane row b, `pack_x3_rows`).
    thr: [1] f32 group-score threshold.
    ws:  weights, 2D [K, N] or stacked 3D [L, K, N] (+ `layer`).
    norm3: optional packed rms_norm gain ([nb, 1, 128] or layer-stacked
         [L, nb, 1, 128], see `pack_norm3`) — x3 then carries the RAW
         residual stream and the norm happens in-kernel before selection.
    Returns a list of [1, N_w] outputs.
    """
    ws = tuple(ws)
    plans = _plan_weights(ws)
    if depth is None:
        depth = _pick_depth(plans, G)
    Ns = tuple(p.N for p in plans)
    flat = [a for p in plans for a in p.arrays]
    nb = x3.shape[0]
    n_tot = sum(Ns)
    if layer is None:
        layer = jnp.zeros((1,), jnp.int32)
    else:
        layer = jnp.asarray(layer, jnp.int32).reshape(1)
    if norm3 is not None and norm3.ndim == 3:
        # flatten the layer axis into the sublane dim (see _norm_fold)
        norm3 = norm3.reshape(-1, norm3.shape[-1])
    norm_ops = () if norm3 is None else (norm3,)

    kernel = functools.partial(
        _fused_select_gather_kernel, G=G, plans=plans, nb=nb, cap=cap,
        depth=depth, norm=norm3 is not None, norm_eps=norm_eps,
        fixed_sel=fixed_sel,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # thr, layer
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)
           for _ in (*norm_ops, *flat)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SUBLANES, n_tot), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * SUBLANES * cap * G * n_tot,
            bytes_accessed=cap * sum(
                (G // 2 if p.kind == "int4" else G) * p.N
                * p.arrays[0].dtype.itemsize
                for p in plans
            ),
            transcendentals=0,
        ),
    )(jnp.asarray(thr, jnp.float32).reshape(1), layer, x3, *norm_ops,
      *flat)
    outs = []
    off = 0
    for N in Ns:
        outs.append(out[:1, off:off + N].astype(out_dtype))
        off += N
    return outs


@functools.partial(jax.jit, static_argnames=("G", "cap", "out_dtype",
                                             "depth", "norm_eps",
                                             "silu_pair", "fixed_sel"))
def fused_select_gather_packed(x3, thr, ws, *, G: int, cap: int,
                               out_dtype=jnp.bfloat16,
                               depth: Optional[int] = None,
                               layer=None, norm3=None,
                               norm_eps: float = 1e-5, res3=None,
                               silu_pair: bool = False,
                               fixed_sel: bool = False):
    """Packed-pipeline projection (G == 128 decode, batch 1): in-kernel
    threshold selection like `fused_select_gather_gemv`, but the output
    comes back in the kernels' packed-row layout [n_out/128, 1, 128] —
    directly consumable as the next launch's x3 — with the residual add
    (`res3`, packed) and the MLP activation (`silu_pair`: ws = (gate, up),
    returns packed silu(gate)*up) folded in. A whole transformer layer
    chains through these with ZERO XLA ops between Pallas launches."""
    ws = tuple(ws)
    plans = _plan_weights(ws)
    if depth is None:
        depth = _pick_depth(plans, G)
    Ns = tuple(p.N for p in plans)
    flat = [a for p in plans for a in p.arrays]
    nb = x3.shape[0]
    n_tot = sum(Ns)
    if silu_pair:
        assert len(plans) == 2 and Ns[0] == Ns[1] and res3 is None
        n_out = Ns[0]
    else:
        n_out = n_tot
    assert n_out % LANES == 0
    if layer is None:
        layer = jnp.zeros((1,), jnp.int32)
    else:
        layer = jnp.asarray(layer, jnp.int32).reshape(1)
    if norm3 is not None and norm3.ndim == 3:
        norm3 = norm3.reshape(-1, norm3.shape[-1])
    extra_ops = [a for a in (norm3, res3) if a is not None]

    kernel = functools.partial(
        _fused_select_gather_kernel, G=G, plans=plans, nb=nb, cap=cap,
        depth=depth, norm=norm3 is not None, norm_eps=norm_eps,
        out_packed=True, res=res3 is not None, silu_pair=silu_pair,
        fixed_sel=fixed_sel,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # thr, layer
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]          # x3
        + [pl.BlockSpec(memory_space=pl.ANY)
           for _ in range(1 if norm3 is not None else 0)]         # norm
        + [pl.BlockSpec(memory_space=pltpu.VMEM)
           for _ in range(1 if res3 is not None else 0)]          # res
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in flat],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out // LANES, 1, LANES),
                                       out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * SUBLANES * cap * G * n_tot,
            bytes_accessed=cap * sum(
                (G // 2 if p.kind == "int4" else G) * p.N
                * p.arrays[0].dtype.itemsize
                for p in plans
            ),
            transcendentals=n_out if silu_pair else 0,
        ),
    )(jnp.asarray(thr, jnp.float32).reshape(1), layer, x3, *extra_ops,
      *flat)


def pack_x3(x, G: int):
    """[1, K] -> [nb, 1, 128]: group g's values in row g, lanes [:G],
    zero beyond (the kernels' single-row input layout; the [SUBLANES, G]
    MXU lhs is broadcast in-kernel — materializing the 8x replication in
    XLA cost ~0.2 ms/token at 7B)."""
    K = x.shape[-1]
    nb = K // G
    if G == LANES:
        return x.reshape(nb, 1, LANES)
    x2 = jnp.zeros((nb, LANES), x.dtype)
    return x2.at[:, :G].set(x.reshape(nb, G)).reshape(nb, 1, LANES)


def pack_x3_rows(x, G: int, rows: int = SUBLANES):
    """Batched packed rows: [B, K] -> [K//G, rows, 128], batch b's
    group-g values in sublane row b of tile-row g, lanes [:G], zero
    beyond (rows >= B stay zero — pooled selection and the MXU see
    zeros). rows 8 (one sublane tile) or 16 (B <= 16 single launch)."""
    B, K = x.shape
    nb = K // G
    assert B <= rows and rows % SUBLANES == 0, (B, rows)
    xg = jnp.swapaxes(x.reshape(B, nb, G), 0, 1)       # [nb, B, G]
    out = jnp.zeros((nb, rows, LANES), x.dtype)
    return out.at[:, :B, :G].set(xg)


def _norm_rows(nb: int) -> int:
    """Packed-gain rows, padded to the fp32 sublane tile (8) so a layer
    slab's DMA slice offset/shape stay tile-aligned for any nb."""
    return -(-nb // 8) * 8


def pack_norm3(g, G: int):
    """rms_norm gain [K] (or layer-stacked [L, K]) -> packed fp32
    [nbp, 128] (/[L, nbp, 128]) for the in-kernel norm fold, group g's
    gain in row g, lanes [:G], rows padded to the fp32 sublane tile
    (`_norm_rows`). fp32 (exact upcast) keeps the slab slice tileable;
    packed once per forward call (outside the layer scan)."""
    K = g.shape[-1]
    nb = K // G
    nbp = _norm_rows(nb)
    lead = g.shape[:-1]
    g = g.astype(jnp.float32)
    out = jnp.zeros((*lead, nbp, LANES), jnp.float32)
    out = out.at[..., :nb, :G].set(g.reshape(*lead, nb, G))
    return out


def group_scores(x, G: int):
    """Per-group max-|x| score. x: [1, K] -> [K//G]."""
    return jnp.max(jnp.abs(x).reshape(-1, G), axis=-1)


def select_groups(x, G: int, k_keep: int,
                  threshold: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Build (idx, xpack) kernel inputs under THE unified selection rule
    (docs/KERNEL_NOTES.md "Selection semantics"):

      - top-k mode (`threshold=None`): the top `k_keep` groups by
        max-|x| score.
      - threshold mode: survivors (`score > threshold`) in ascending
        index order, first `k_keep` kept — identical to the fused
        kernel's scalar-core scan and to `sparsify_groups(threshold=)`.
        Dropped/padded slots contribute zero.
    """
    nb = x.shape[-1] // G
    if k_keep >= nb and threshold is None:
        # dense fast path: every group kept — no scoring/top-k needed
        idx = jnp.arange(nb, dtype=jnp.int32)
        xg = x.reshape(nb, G)
    elif threshold is not None:
        s = group_scores(x, G)
        surv = s > threshold
        mask = surv & (jnp.cumsum(surv) <= k_keep)
        # kept indices in ascending order; pad with sentinel nb
        order = jnp.where(mask, jnp.arange(nb), nb)
        idx = jnp.sort(order)[: min(k_keep, nb)]
        pad = idx >= nb
        idx = jnp.where(pad, 0, idx)
        xg = x.reshape(nb, G)[idx]                   # [k_keep, G]
        xg = jnp.where(pad[:, None], 0, xg)
    else:
        s = group_scores(x, G)
        top_s, idx = jax.lax.top_k(s, k_keep)
        idx = jnp.sort(idx)
        xg = x.reshape(nb, G)[idx]                   # [k_keep, G]
    if G == LANES:
        xpack = xg.reshape(xg.shape[0], 1, LANES)
    else:
        xpack = jnp.zeros((xg.shape[0], LANES), x.dtype)
        xpack = xpack.at[:, :G].set(xg).reshape(xg.shape[0], 1, LANES)
    return idx.astype(jnp.int32), xpack


def select_groups_batched(x, G: int, k_keep: int, threshold=None):
    """Batched (B <= 8) selection: groups picked by the max score across
    the batch (shared kept set — the union-biased compromise that keeps
    the gather capacity static), xpack rows 0..B-1 carry each sequence's
    values. The MXU lhs has 8 rows regardless, so batched decode costs the
    same HBM traffic as batch-1.

    With `threshold`, the unified rule applies to the POOLED score:
    survivors in ascending index order, first k_keep kept."""
    B, K = x.shape
    assert B <= SUBLANES, (B, SUBLANES)
    nb = K // G
    scores = jnp.max(jnp.abs(x).reshape(B, nb, G), axis=-1)   # [B, nb]
    pooled = jnp.max(scores, axis=0)                          # [nb]
    if threshold is not None:
        surv = pooled > threshold
        mask = surv & (jnp.cumsum(surv) <= k_keep)
        order = jnp.where(mask, jnp.arange(nb), nb)
        idx = jnp.sort(order)[: min(k_keep, nb)]
        pad = idx >= nb
        idx = jnp.where(pad, 0, idx)
        xg = x.reshape(B, nb, G)[:, idx]                      # [B, k, G]
        xg = jnp.where(pad[None, :, None], 0, xg)
    else:
        _, idx = jax.lax.top_k(pooled, k_keep)
        idx = jnp.sort(idx)
        xg = x.reshape(B, nb, G)[:, idx]                      # [B, k, G]
    xpack = jnp.zeros((idx.shape[0], SUBLANES, LANES), x.dtype)
    xpack = xpack.at[:, :B, :G].set(jnp.swapaxes(xg, 0, 1))
    return idx.astype(jnp.int32), xpack


def _weight_kind(w) -> str:
    if isinstance(w, dict) and "qp" in w:
        return "int4"            # packed {"qp","sz"}: dequant in-kernel
    if isinstance(w, dict):
        return "int8"            # {"q","scale"}: per-channel post-scale
    return "array"


def _shared_group_size(ws, block_size: int, K: int) -> int:
    """Gather group size for a projection set: int4 packed slabs need
    G/2 >= the int8 sublane tile, so any int4 weight raises G to >= 64
    (quant group == gather group; `quant.int4_gather_group`)."""
    G = effective_block_size(block_size, K)
    if any(_weight_kind(w) == "int4" for w in ws):
        G = max(64, G)
    return G


def _kernel_operands(ws):
    """(kernel operands, int8 scales-to-apply-after list)."""
    raw, scales = [], []
    for w in ws:
        kind = _weight_kind(w)
        if kind == "int4":
            raw.append({"qp": w["qp"], "sz": w["sz"]})
            scales.append(None)
        elif kind == "int8":
            raw.append(w["q"])
            scales.append(w["scale"])
        else:
            raw.append(w)
            scales.append(None)
    return raw, scales


def project_many_batched(x, ws, block_size: int = 32,
                         keep_frac: Optional[float] = None, layer=None,
                         threshold=None):
    """Batched (B <= 8) block-sparse projections sharing one input batch.
    x: [B, K]; returns list of [B, N_w]."""
    B, K = x.shape
    G = _shared_group_size(ws, block_size, K)
    nb = K // G
    k_keep = max(1, min(nb, int(round(nb * (keep_frac if keep_frac else 0.625)))))
    idx, xpack = select_groups_batched(x, G, k_keep, threshold=threshold)
    raw, scales = _kernel_operands(ws)
    ys = block_gather_gemv_multi(idx, xpack, raw, G=G, k_keep=k_keep,
                                 out_dtype=jnp.float32, layer=layer,
                                 out_rows=B)
    outs = []
    for y, s in zip(ys, scales):
        if s is not None:
            y = y * s[None, :]
        outs.append(y.astype(x.dtype))
    return outs


def batched_group_mask(x, G: int, k_keep: int, threshold=None):
    """Semantics twin of the batched selection: [B, K] keep mask."""
    B, K = x.shape
    nb = K // G
    scores = jnp.max(jnp.abs(x).reshape(B, nb, G), axis=-1)
    pooled = jnp.max(scores, axis=0)
    if threshold is not None:
        surv = pooled > threshold
        mask = surv & (jnp.cumsum(surv) <= k_keep)
    else:
        _, idx = jax.lax.top_k(pooled, k_keep)
        mask = jnp.zeros((nb,), bool).at[idx].set(True)
    return jnp.repeat(mask, G)[None, :]


def block_sparse_matmul(x, w, threshold, block_size: int = 32,
                        keep_frac: Optional[float] = None):
    """Drop-in sparse projection for decode. x: [..., 1, K]; w: [K, N].

    keep_frac sets the static gather capacity; defaults to 0.625 (capacity
    margin over 50% sparsity). The dispatcher in `sparse_gemv` passes the
    configured value.
    """
    K, N = w.shape
    G = effective_block_size(block_size, K)
    nb = K // G
    k_keep = max(1, min(nb, int(round(nb * (keep_frac if keep_frac else 0.625)))))
    lead = x.shape[:-1]
    xf = x.reshape(1, K)
    idx, xpack = select_groups(xf, G, k_keep, threshold=threshold)
    y = block_gather_gemv(idx, xpack, w, G=G, k_keep=k_keep,
                          out_dtype=x.dtype)
    return y.reshape(*lead, N)


def project_many(x, ws, block_size: int = 32,
                 keep_frac: Optional[float] = None, layer=None,
                 threshold=None, norm3=None, norm_eps: float = 1e-5):
    """Apply the block-sparse GEMV to several weights sharing one input
    (q/k/v share the post-LN hidden state; gate/up share the MLP input —
    reference groups at `teal/mlp.py:50-56`, `teal/self_attn.py:70-84`).
    Group selection runs once and is reused, the analog of the reference's
    fused-QKV kernel sharing one activation load
    (`kernels/sparse_gemv.py:147-237`).

    Each w may be 2D [K, N], layer-stacked 3D [L, K, N] (pass `layer`),
    an int8 dict {"q": 2D/3D, "scale": [N]}, or a packed int4 dict
    {"qp", "sz"} (dequantized inside the kernel).

    `norm3` (threshold mode only): packed rms_norm gain — `x` is then the
    RAW residual stream and the norm is folded into the kernel."""
    K = x.shape[-1]
    G = _shared_group_size(ws, block_size, K)
    nb = K // G
    k_keep = max(1, min(nb, int(round(nb * (keep_frac if keep_frac else 0.625)))))
    lead = x.shape[:-1]
    xf = x.reshape(1, K)
    raw, scales = _kernel_operands(ws)
    if threshold is not None:
        # calibrated-threshold mode: selection runs on the scalar core
        # inside the kernel (no XLA top-k/sort/gather between launches)
        x3 = pack_x3(xf, G)
        ys = fused_select_gather_gemv(
            x3, jnp.reshape(threshold, (1,)), raw, G=G, cap=k_keep,
            out_dtype=jnp.float32, layer=layer, norm3=norm3,
            norm_eps=norm_eps,
        )
    elif norm3 is not None:
        raise ValueError("norm3 fold requires threshold mode")
    else:
        idx, xpack = select_groups(xf, G, k_keep)
        ys = block_gather_gemv_multi(idx, xpack, raw, G=G, k_keep=k_keep,
                                     out_dtype=jnp.float32, layer=layer)
    outs = []
    for y, s in zip(ys, scales):
        if s is not None:
            y = y * s[None, :]
        outs.append(y.astype(x.dtype).reshape(*lead, y.shape[-1]))
    return outs


def block_sparse_matmul_reference(x, w, threshold, block_size: int = 32,
                                  keep_frac: Optional[float] = None):
    """Pure-jnp semantics twin of `block_sparse_matmul` (tests/accuracy
    path): same unified selection rule, dense math."""
    K, N = w.shape
    G = effective_block_size(block_size, K)
    nb = K // G
    k_keep = max(1, min(nb, int(round(nb * (keep_frac if keep_frac else 0.625)))))
    lead = x.shape[:-1]
    xf = x.reshape(1, K)
    s = group_scores(xf, G)
    if threshold is not None:
        surv = s > threshold
        mask = surv & (jnp.cumsum(surv) <= k_keep)
    else:
        top_s, idx = jax.lax.top_k(s, k_keep)
        mask = jnp.zeros((nb,), bool).at[idx].set(True)
    xm = jnp.where(jnp.repeat(mask, G)[None, :], xf, 0)
    y = jnp.matmul(xm, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(*lead, N)
