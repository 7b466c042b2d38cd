"""Fused beam-ancestry self-attention over MERGED-LANE decode caches.

The production decode step's dominant HBM cost is re-reading the per-layer
KV caches every token (reference hot loop:
``/root/reference/captioning/models/cachedTransformer.py:398-420``).  The
jnp path stores them as ``[N, h, T, dk]`` — the dk=64 minor dim fills half
a 128-lane tile, so every byte of cache is read twice, and XLA materializes
the ``[N, h, bw, T]`` score tensor between the QK and PV einsums (round-3/4
profiles: ~7.8 ms/step of a ~16 ms step at the B=1024 beam-5 headline).

This kernel operates on caches stored ``[N, T, h*dk=D]`` — 512 lanes fill
MXU/VPU tiles exactly — and fuses mask+softmax+context in VMEM, so per
step each cache byte moves HBM->VMEM once and nothing intermediate goes
back.  Per-head contraction over the merged lane dim uses a BLOCK-DIAGONAL
permuted query built once in XLA (q is ~100x smaller than the caches):

  Qp[(qq, hh), :] = Q[qq, :] * (lane in head hh)          # [bw*h, D]
  S_s = Qp @ K_s^T    per sibling slot s                   # [bw*h, T]

row (qq, hh) contracts only head hh's lanes — exact per-head scores from
ONE MXU matmul per sibling.  The context applies the trick backwards:

  C_s = P_s @ V_s                                          # [bw*h, D]
  ctx[qq, :] = sum_hh C[(qq, hh), :] * (lane in head hh)

landing each head's context in its own lane span — already merged-head
output for the ``wo`` projection.

Mosaic legality/perf rules this file is shaped around (each violation was
measured to cost the entire bandwidth win or fail to compile):
  * every input keeps its NATURAL layout — [N*h, D], [N, T, D], [N, T] —
    so XLA inserts no layout-constraint copies around the custom call
    (4-D reshaped operands forced whole-cache copies: +3.7 ms/step);
  * in-kernel slices are leading-dim ref indexes only;
  * vector reshapes only regroup f32 sublanes in multiples of 8
    ([bw*h, X] <-> [bw, h, X] with h == 8 — exactly one tile row);
  * the ancestry mask is built in-kernel from the int32 ``anc`` table
    (i1 vectors cannot be reshaped/concatenated; float side-inputs with a
    T-minor dim would pad 21 -> 128 lanes).

Ancestry semantics match ``models/transformer.py:_attend_beam``: physical
K/V slots never move during beam search; ``anc[row, j]`` names the sibling
slot (within the row's block of ``bw`` lanes) holding its lineage's
time-``j`` entry, and non-selected (sibling, time) slots score -1e9.

Eval-path only (no attention dropout): train-mode decode keeps the jnp
fallback so the rng-exact RL recompute stays byte-stable.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9  # matches models/transformer.py masking


def _pick_block(n_img: int, candidates=(8, 4, 2, 1)) -> int:
    """Images per grid cell (VMEM is 16 MB; K+V for 8 images is ~2.6 MB,
    which double-buffers comfortably)."""
    env = os.environ.get('BEAM_ATTEND_IB')
    if env:
        return int(env)
    for c in candidates:
        if n_img % c == 0:
            return c
    return 1


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB core VMEM


def _wa_block(n_img: int, bw: int, h: int, T: int, D: int, esize: int):
    """Images per chunk for the fused write+attend kernel, or None when no
    legal chunking exists.  Constraints: chunks tile n_img exactly, DMA row
    slices stay 8-aligned (cb*bw % 8), and the double-buffered scratch
    (K/V slabs + write-back groups + queries + contexts) fits VMEM."""
    env = os.environ.get('BEAM_ATTEND_IB')
    for cb in ((int(env),) if env else (32, 16, 8, 4, 2, 1)):
        if n_img % cb or (cb * bw) % 8:
            continue
        rows = cb * bw
        slabs = 2 * 2 * rows * T * D * esize          # ksl + vsl, 2 slots
        groups = 2 * 2 * rows * 8 * D * esize         # kgsl + vgsl
        qs = 2 * rows * h * D * esize                 # qsl (block-diag q)
        rest = 2 * rows * D * esize * 3 + 2 * rows * 128 * 4
        if env or slabs + groups + qs + rest <= _VMEM_BUDGET:
            return cb
    return None


def _attend_kernel(t_ref, q_ref, k_ref, v_ref, anc_ref, o_ref, *,
                   ib: int, bw: int, h: int, T: int, D: int):
    """One grid cell: ``ib`` images.

    t_ref: [1] SMEM   uniform step index (positions <= t0 valid)
    q_ref: [ib*bw*h, D]  block-diagonal permuted queries (q-major rows)
    k/v_ref: [ib*bw, T, D]  merged-lane cache rows
    anc_ref: [ib*bw, T] int32  ancestry table rows
    o_ref: [ib*bw, D]  merged-head contexts
    """
    t0 = t_ref[0]
    cdt = k_ref.dtype
    R = bw * h
    dk = D // h
    inv = jnp.asarray(1.0 / math.sqrt(dk), jnp.float32)
    neg = jnp.asarray(_NEG_INF, jnp.float32)
    # row r of the context keeps lanes of head r % h
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1) // dk
    row_h = jax.lax.broadcasted_iota(jnp.int32, (R, D), 0) % h
    rmask = (lane_h == row_h).astype(jnp.float32)               # [R, D]
    tt = jax.lax.broadcasted_iota(jnp.int32, (bw, T), 1)
    tvalid = tt <= t0                                           # [bw, T]

    outs = []
    for i in range(ib):
        qp = q_ref[i * R:(i + 1) * R, :]                        # [R, D]
        anci = anc_ref[i * bw:(i + 1) * bw, :]                  # [bw, T]
        # per-sibling masked scores as f32 [bw, h, T] (8-sublane regroup)
        sf = []
        for s in range(bw):
            s32 = jax.lax.dot_general(
                qp, k_ref[i * bw + s], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [R, T]
            s32 = (s32 * inv).astype(cdt).astype(jnp.float32)
            ok = (anci == s) & tvalid if bw > 1 else tvalid     # [bw, T]
            sf.append(jnp.where(ok[:, None, :],
                                s32.reshape(bw, h, T), neg))
        m = sf[0].max(axis=-1, keepdims=True)                   # [bw, h, 1]
        for s in range(1, bw):
            m = jnp.maximum(m, sf[s].max(axis=-1, keepdims=True))
        den = jnp.zeros_like(m)
        es = []
        for s in range(bw):
            e = jnp.exp(sf[s] - m)
            es.append(e)
            den = den + e.sum(axis=-1, keepdims=True)
        c = jnp.zeros((R, D), jnp.float32)
        for s in range(bw):
            p = (es[s] / den).reshape(R, T).astype(cdt)
            c = c + jax.lax.dot_general(
                p, v_ref[i * bw + s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [R, D]
        # tile-aligned head sum: [bw*h, D] -> [bw, h, D] (h rows = 1 tile)
        outs.append((c * rmask).reshape(bw, h, D).sum(axis=1))
    o_ref[:] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bw', 'h'))
def attend_merged(q, k, v, anc, t0, *, bw: int, h: int):
    """Fused decode-step self-attention over merged-lane caches.

    q: [N, D]; k/v: [N, T, D]; anc: [N, T] int32 (ignored when bw == 1);
    t0: scalar int32 — uniform step index, positions <= t0 valid.
    Returns the merged-head context [N, D] in q.dtype.
    """
    N, T, D = k.shape
    assert N % bw == 0 and D % h == 0
    n_img = N // bw
    R = bw * h
    ib = _pick_block(n_img)
    grid = (n_img // ib,)

    # block-diagonal permuted queries, q-major rows, natural [N*h, D]
    dk = D // h
    lane_mask = (jnp.arange(D) // dk)[None, :] == jnp.arange(h)[:, None]
    qp = (q[:, None, :] * lane_mask.astype(q.dtype)[None]).reshape(N * h, D)
    if anc is None:
        anc = jnp.zeros((N, T), jnp.int32)
    t_arr = jnp.asarray(t0, jnp.int32).reshape(1)

    kern = functools.partial(_attend_kernel, ib=ib, bw=bw, h=h, T=T, D=D)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ib * R, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ib * bw, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ib * bw, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ib * bw, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ib * bw, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), q.dtype),
    )(t_arr, qp, k, v, anc)


# ---------------------------------------------------------------------------
# v3: write+attend in ONE kernel — manual double-buffered DMA, the cache
# aliased in/out so the per-step K/V entry is written IN PLACE from inside
# the kernel (an XLA-level dynamic-update-slice feeding a custom call made
# the whole cache get defensively copied: +3.7 ms/step measured), and only
# the valid t <= t0 prefix of each cache slab is loaded (8-row groups,
# static predicates — ~40% less traffic averaged over a 21-step decode).
# ---------------------------------------------------------------------------

def _wa_kernel(t_ref, qp_hbm, k_hbm, v_hbm, anc_hbm, kn_hbm, vn_hbm,
               ctx_hbm, ko_hbm, vo_hbm,
               ksl, vsl, qsl, asl, knsl, vnsl, ctxsl,
               kgsl, vgsl, lsem, ssem, *,
               cb: int, bw: int, h: int, T: int, D: int, gt: int):
    """Fused write+attend over the whole batch in one invocation.

    Chunks of ``cb`` images stream through 2 VMEM slots; loads of chunk
    c+1 overlap chunk c's compute.  Cache slabs load only the 8-row time
    groups with any valid position (group predicates are uniform across
    chunks — t0 is one scalar).  The new K/V entries are stored into the
    slab (so the attend sees step t0) and DMA'd back to the ALIASED cache
    at [rows, t0] — the only HBM bytes of the cache that change.
    """
    t0 = t_ref[0]
    R = bw * h
    RN = cb * bw
    RQ = cb * R
    n_img = k_hbm.shape[0] // bw
    n_chunks = n_img // cb
    groups = [(g * gt, min(gt, T - g * gt)) for g in range(pl.cdiv(T, gt))]
    dk = D // h
    inv = jnp.asarray(1.0 / math.sqrt(dk), jnp.float32)
    neg = jnp.asarray(_NEG_INF, jnp.float32)
    cdt = ksl.dtype
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1) // dk
    row_h = jax.lax.broadcasted_iota(jnp.int32, (R, D), 0) % h
    rmask = (lane_h == row_h).astype(jnp.float32)               # [R, D]
    tt = jax.lax.broadcasted_iota(jnp.int32, (bw, T), 1)
    tvalid = tt <= t0                                           # [bw, T]

    def loads(slot, c):
        r0 = c * RN
        for g, (g0, gl) in enumerate(groups):
            @pl.when(g0 <= t0)
            def _(g0=g0, gl=gl, g=g):
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(r0, RN), pl.ds(g0, gl), :],
                    ksl.at[slot, :, pl.ds(g0, gl), :],
                    lsem.at[slot, g]).start()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(r0, RN), pl.ds(g0, gl), :],
                    vsl.at[slot, :, pl.ds(g0, gl), :],
                    lsem.at[slot, 3 + g]).start()

            # V rows never DMA'd hold VMEM garbage; the PV contraction
            # multiplies them by p == 0 and 0 * NaN poisons the whole
            # context row.  Zero them (VMEM-local, no HBM traffic).  K
            # garbage needs no scrub: it only reaches masked score
            # columns, and the where() select kills NaN there.
            @pl.when(g0 > t0)
            def _(g0=g0, gl=gl):
                vsl[slot, :, g0:g0 + gl, :] = jnp.zeros(
                    (RN, gl, D), vsl.dtype)
        pltpu.make_async_copy(qp_hbm.at[pl.ds(c * RQ, RQ), :],
                              qsl.at[slot], lsem.at[slot, 6]).start()
        pltpu.make_async_copy(anc_hbm.at[pl.ds(r0, RN), :],
                              asl.at[slot], lsem.at[slot, 7]).start()
        pltpu.make_async_copy(kn_hbm.at[pl.ds(r0, RN), :],
                              knsl.at[slot], lsem.at[slot, 8]).start()
        pltpu.make_async_copy(vn_hbm.at[pl.ds(r0, RN), :],
                              vnsl.at[slot], lsem.at[slot, 9]).start()

    def wait_loads(slot, c):
        r0 = c * RN
        for g, (g0, gl) in enumerate(groups):
            @pl.when(g0 <= t0)
            def _(g0=g0, gl=gl, g=g):
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(r0, RN), pl.ds(g0, gl), :],
                    ksl.at[slot, :, pl.ds(g0, gl), :],
                    lsem.at[slot, g]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(r0, RN), pl.ds(g0, gl), :],
                    vsl.at[slot, :, pl.ds(g0, gl), :],
                    lsem.at[slot, 3 + g]).wait()
        pltpu.make_async_copy(qp_hbm.at[pl.ds(c * RQ, RQ), :],
                              qsl.at[slot], lsem.at[slot, 6]).wait()
        pltpu.make_async_copy(anc_hbm.at[pl.ds(r0, RN), :],
                              asl.at[slot], lsem.at[slot, 7]).wait()
        pltpu.make_async_copy(kn_hbm.at[pl.ds(r0, RN), :],
                              knsl.at[slot], lsem.at[slot, 8]).wait()
        pltpu.make_async_copy(vn_hbm.at[pl.ds(r0, RN), :],
                              vnsl.at[slot], lsem.at[slot, 9]).wait()

    g0t = (t0 // gt) * gt  # start of the 8-row group holding t0

    def stores(slot, c):
        r0 = c * RN
        pltpu.make_async_copy(ctxsl.at[slot],
                              ctx_hbm.at[pl.ds(r0, RN), :],
                              ssem.at[slot, 0]).start()
        # whole-group write-back (single-row bf16 DMA slices are not
        # tile-aligned); the group was loaded, patched with the new entry
        # in kgsl/vgsl, and costs 8x a row = still ~0.3 us per chunk
        pltpu.make_async_copy(kgsl.at[slot],
                              ko_hbm.at[pl.ds(r0, RN), pl.ds(g0t, gt), :],
                              ssem.at[slot, 1]).start()
        pltpu.make_async_copy(vgsl.at[slot],
                              vo_hbm.at[pl.ds(r0, RN), pl.ds(g0t, gt), :],
                              ssem.at[slot, 2]).start()

    def wait_stores(slot, c):
        r0 = c * RN
        pltpu.make_async_copy(ctxsl.at[slot],
                              ctx_hbm.at[pl.ds(r0, RN), :],
                              ssem.at[slot, 0]).wait()
        pltpu.make_async_copy(kgsl.at[slot],
                              ko_hbm.at[pl.ds(r0, RN), pl.ds(g0t, gt), :],
                              ssem.at[slot, 1]).wait()
        pltpu.make_async_copy(vgsl.at[slot],
                              vo_hbm.at[pl.ds(r0, RN), pl.ds(g0t, gt), :],
                              ssem.at[slot, 2]).wait()

    loads(0, 0)

    def chunk_body(c, _):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            # the next chunk reuses this slot's scratch: its previous
            # stores must have drained (no-op for c < 2)
            @pl.when(c >= 1)
            def _():
                wait_stores(nxt, c - 1)
            loads(nxt, c + 1)

        wait_loads(slot, c)

        # merged-sibling contraction: all bw sibling caches of an image
        # form ONE [bw*T, D] operand (a free leading-dim regroup of the
        # slab rows), so the whole ancestry attend is 2 MXU matmuls per
        # image — [R, D] @ [D, bw*T] fills 120 of 128 lanes vs 24 for the
        # per-sibling dots it replaces (measured 6.5 -> see BENCH.md).
        tcol = (jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) == t0)
        ST = bw * T
        col_s = jax.lax.broadcasted_iota(jnp.int32, (bw, ST), 1) // T
        col_t = jax.lax.broadcasted_iota(jnp.int32, (bw, ST), 1) - col_s * T
        for i in range(cb):
            qp = qsl[slot, i * R:(i + 1) * R, :]                # [R, D]
            anci = asl[slot, i * bw:(i + 1) * bw, 0:T]          # [bw, T]
            kn = knsl[slot, i * bw:(i + 1) * bw, :]             # [bw, D]
            vn = vnsl[slot, i * bw:(i + 1) * bw, :]
            kv = jnp.where(tcol, kn[:, None, :],
                           ksl[slot, i * bw:(i + 1) * bw])      # [bw, T, D]
            vv = jnp.where(tcol, vn[:, None, :],
                           vsl[slot, i * bw:(i + 1) * bw])
            s32 = jax.lax.dot_general(
                qp, kv.reshape(ST, D), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [R, ST]
            s32 = (s32 * inv).astype(cdt).astype(jnp.float32)
            # column (s, t) is valid for query row q iff anc[q, t] == s
            # and t <= t0; anc tiled along s gives anc[q, t] per column
            anct = jnp.concatenate([anci] * bw, axis=1)         # [bw, ST]
            ok = (anct == col_s) & (col_t <= t0) if bw > 1 else (
                jnp.broadcast_to(col_t <= t0, (bw, ST)))
            sf = jnp.where(ok[:, None, :], s32.reshape(bw, h, ST), neg)
            m = sf.max(axis=-1, keepdims=True)                  # [bw, h, 1]
            e = jnp.exp(sf - m)
            p = (e / e.sum(axis=-1, keepdims=True)).reshape(R, ST)
            cacc = jax.lax.dot_general(
                p.astype(cdt), vv.reshape(ST, D), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [R, D]
            ctxsl[slot, i * bw:(i + 1) * bw, :] = (
                (cacc * rmask).reshape(bw, h, D).sum(axis=1)
                .astype(ctxsl.dtype))
        # patched write-back group: slab rows g0t..g0t+gt with row t0
        # replaced by the fresh entries (VMEM->VMEM DMA: vector slices at
        # a dynamic offset are not tile-aligned for bf16)
        gk = pltpu.make_async_copy(
            ksl.at[slot, :, pl.ds(g0t, gt), :], kgsl.at[slot],
            lsem.at[slot, 10])
        gv = pltpu.make_async_copy(
            vsl.at[slot, :, pl.ds(g0t, gt), :], vgsl.at[slot],
            lsem.at[slot, 11])
        gk.start()
        gv.start()
        gk.wait()
        gv.wait()
        gmask = (jax.lax.broadcasted_iota(jnp.int32, (gt, 1), 0)
                 == (t0 - g0t))
        kgsl[slot] = jnp.where(gmask, knsl[slot][:, None, :], kgsl[slot])
        vgsl[slot] = jnp.where(gmask, vnsl[slot][:, None, :], vgsl[slot])
        stores(slot, c)
        return ()

    jax.lax.fori_loop(0, n_chunks, chunk_body, (), unroll=False)
    wait_stores((n_chunks - 1) % 2, n_chunks - 1)
    if n_chunks >= 2:
        wait_stores((n_chunks - 2) % 2, n_chunks - 2)


@functools.partial(jax.jit, static_argnames=('bw', 'h'))
def attend_write_merged(q, k_cache, v_cache, k_new, v_new, anc, t0, *,
                        bw: int, h: int):
    """One fused op: write this step's K/V entry (in place, aliased) and
    attend through the ancestry table.

    q/k_new/v_new: [N, D]; k_cache/v_cache: [N, T, D]; anc: [N, T] int32;
    t0: scalar int32 uniform step.  Returns (ctx [N, D], k_cache',
    v_cache') — the caches are the SAME buffers, updated at [:, t0, :].
    """
    N, T, D = k_cache.shape
    assert N % bw == 0 and D % h == 0
    assert T % 8 == 0, ('cache length must pad to a multiple of 8 '
                        '(DMA slices on the T dim must be tile-aligned)')
    n_img = N // bw
    cb = _pick_block(n_img)
    R = bw * h

    dk = D // h
    lane_mask = (jnp.arange(D) // dk)[None, :] == jnp.arange(h)[:, None]
    qp = (q[:, None, :] * lane_mask.astype(q.dtype)[None]).reshape(N * h, D)
    if anc is None:
        anc = jnp.zeros((N, T), jnp.int32)
    # DMA slices need 128-aligned minor dims: ride the ancestry ints in a
    # [N, 128] buffer (pad value bw never matches a sibling index)
    anc128 = jnp.full((N, 128), bw, jnp.int32).at[:, :T].set(anc[:, :T])
    t_arr = jnp.asarray(t0, jnp.int32).reshape(1)

    gt = 8
    kern = functools.partial(_wa_kernel, cb=cb, bw=bw, h=h, T=T, D=D, gt=gt)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    ctx, k_out, v_out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [any_spec] * 6,
        out_specs=[any_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((N, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={2: 1, 3: 2},  # k_cache->k_out, v_cache->v_out
        scratch_shapes=[
            pltpu.VMEM((2, cb * bw, T, D), k_cache.dtype),   # ksl
            pltpu.VMEM((2, cb * bw, T, D), v_cache.dtype),   # vsl
            pltpu.VMEM((2, cb * R, D), q.dtype),             # qsl
            pltpu.VMEM((2, cb * bw, 128), jnp.int32),        # asl
            pltpu.VMEM((2, cb * bw, D), k_new.dtype),        # knsl
            pltpu.VMEM((2, cb * bw, D), v_new.dtype),        # vnsl
            pltpu.VMEM((2, cb * bw, D), q.dtype),            # ctxsl
            pltpu.VMEM((2, cb * bw, 8, D), k_cache.dtype),   # kgsl
            pltpu.VMEM((2, cb * bw, 8, D), v_cache.dtype),   # vgsl
            pltpu.SemaphoreType.DMA((2, 12)),                # lsem
            pltpu.SemaphoreType.DMA((2, 3)),                 # ssem
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(t_arr, qp, k_cache, v_cache, anc128, k_new, v_new)
    return ctx, k_out, v_out


# ---------------------------------------------------------------------------
# jnp reference (CPU fallback + parity oracle). Same merged-lane layout.
# ---------------------------------------------------------------------------

def attend_merged_ref(q, k, v, anc, t0, *, bw: int, h: int):
    """jnp twin of ``attend_merged`` (runs anywhere)."""
    N, T, D = k.shape
    dk = D // h
    nb = N // bw
    q4 = q.reshape(nb, bw, h, dk)
    k5 = k.reshape(nb, bw, T, h, dk)
    v5 = v.reshape(nb, bw, T, h, dk)
    scores = jnp.einsum('bqhd,bsthd->bqhst', q4, k5) / jnp.sqrt(
        jnp.asarray(dk, q.dtype))
    pos = jnp.arange(T)
    tmask = pos <= t0                                            # [T]
    if bw > 1:
        sel = jax.nn.one_hot(anc.reshape(nb, bw, T), bw, dtype=bool)
        allowed = jnp.moveaxis(sel, -1, -2) & tmask              # [b,q,s,t]
    else:
        allowed = jnp.broadcast_to(tmask, (nb, bw, bw, T))
    scores = jnp.where(allowed[:, :, None], scores, _NEG_INF)
    p = jax.nn.softmax(
        scores.reshape(nb, bw, h, bw * T).astype(jnp.float32),
        axis=-1).astype(q.dtype).reshape(nb, bw, h, bw, T)
    out = jnp.einsum('bqhst,bsthd->bqhd', p, v5)
    return out.reshape(N, D)
