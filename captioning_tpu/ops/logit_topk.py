"""Fused vocab-logit epilogue: matmul + log-softmax + stats + top-k.

The beam step's table math is the other half of the decode budget next to
the KV attend (BENCH.md round-4: ~8.7 ms/step at B=1024 beam 5).  The jnp
fast path materializes the [N, V1] f32 table in HBM several times per
step: the generator matmul writes 194 MB of logits, log_softmax reads and
rewrites them, ``_finish_table`` reads them again for the row_sum/entropy
reductions and the candidate add, and ``lax.top_k`` sorts the whole
[B, bdash*V1] table.  Per-token, every byte of that is thrown away except
bdash winners and two scalars per row.

This kernel produces exactly those survivors in ONE streaming pass; the
table never exists in HBM.  The generator weight matrix (bf16, ~10 MB at
the COCO vocab) stays resident in VMEM across the whole batch (constant
block index), rows stream through in chunks, and each [R, TV] logit tile
lives only long enough to update:

  * flash-style running softmax stats per row: max ``m``, Σexp(t-m)
    over the raw logits ``t`` (production applies UNK suppression AFTER
    log_softmax, so the denominator ignores it), plus Σexp(t'-m) and
    Σexp(t'-m)(t'-m) over the ADJUSTED logits ``t' = t + unk_bias``
    (the entropy reduction production takes over the adjusted table),
    and Σt' for the carried ``unaug`` row sum;
  * a running per-row top-k of ``t'`` (monotone in the candidate score
    lsm' + beam_sum, so selection commutes with the epilogue), with
    lax.top_k's lowest-index tie-breaking reproduced by first-match
    argmax sweeps.

Returned per row: the top-k ADJUSTED log-softmax values and indices,
``row_sum`` = Σ(lsm + unk_adjust) and ``ent`` = -Σ exp(lsm')·lsm' —
bitwise the quantities `engine.decoding._beam_search_fast._finish_table`
reduces, up to f32 accumulation order (same documented near-tie class as
ops/beam_attend.py; tools/bench_logit_topk.py bounds it).

Matches the per-token epilogue of the reference hot loop
(``/root/reference/captioning/models/cachedTransformer.py:398-420`` +
``CaptionModel.py:115-176``), restructured as one HBM-free pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9          # pad / masked-candidate value (finite: 0*_NEG != NaN)
_TV = 512            # vocab tile lanes (4 MXU tiles per dot)


def _logit_topk_kernel(scal_ref, x_ref, w_hbm, b_ref, of_ref, oi_ref, wsl,
                       wsem, *, k: int, V1: int, Vp: int,
                       unk_idx: int, R: int, D: int):
    """One grid cell: R rows against the whole vocab, W tiles streamed
    from HBM with double-buffered DMA (a VMEM-resident W block would be
    double-buffered by the pipeline into a ~20 MB allocation).

    scal_ref: SMEM [2] f32 — (temperature, unk_bias) ride as TRACED
    scalars so one compiled program serves eval sweeps over temperature /
    UNK suppression (the engine traces them; a static bake would fork the
    whole beam program per setting).  x_ref: [R, D] bf16 decoder outputs;
    w_hbm: [nt, D, TV] bf16 tile-major weights; b_ref: [nt, 1, TV] bf16
    (padded columns carry _NEG bias).  of_ref [R, 128] f32 packs top-k
    lsm' values (lanes 0..k-1), row_sum (lane k) and ent (lane k+1);
    oi_ref [R, 128] i32 the top-k indices.
    """
    temp = scal_ref[0]
    unk_bias = scal_ref[1]
    x = x_ref[:]
    nt = Vp // _TV
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _TV), 1)

    def wdma(slot, j):
        return pltpu.make_async_copy(w_hbm.at[j], wsl.at[slot],
                                     wsem.at[slot])

    wdma(0, 0).start()

    def tile(j, carry):
        m, s, sp, ep, tsum, rv, ri = carry
        c0 = j * _TV
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nt)
        def _():
            wdma(jax.lax.rem(j + 1, 2), j + 1).start()

        wdma(slot, j).wait()
        t32 = jax.lax.dot_general(
            x, wsl[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # production: bf16 matmul output + bf16 bias, cast f32, / temp
        t = (t32.astype(b_ref.dtype) + b_ref[j]).astype(jnp.float32)
        t = t / temp
        gid = lane + c0
        valid = gid < V1
        t = jnp.where(valid, t, _NEG)        # padded cols (last tile)
        # traced unk_bias: 0.0 is an exact no-op (t + 0.0), unk_idx == -1
        # never matches; the where costs one vop on one tile's worth of
        # lanes per pass
        tp = jnp.where(gid == unk_idx, t + unk_bias, t)

        # flash rescale to the new running max of the RAW logits
        mt = t.max(axis=-1, keepdims=True)
        mn = jnp.maximum(m, mt)
        r = jnp.exp(m - mn)
        et = jnp.exp(t - mn)
        etp = jnp.exp(tp - mn)
        s = s * r + et.sum(-1, keepdims=True)
        # E' couples to S' under a base shift: E'_new = r*(E' + (m-mn)*S')
        ep = r * (ep + (m - mn) * sp) + (etp * (tp - mn)).sum(
            -1, keepdims=True)
        sp = sp * r + etp.sum(-1, keepdims=True)
        tsum = tsum + jnp.where(valid, tp, 0.0).sum(-1, keepdims=True)
        m = mn

        # tile top-k then merge into the running list.  First-match
        # argmax (min index among maxima) reproduces lax.top_k ties.
        tw = tp
        tv_j = []
        ti_j = []
        for _ in range(k):
            mv = tw.max(axis=-1, keepdims=True)                  # [R, 1]
            iv = jnp.where(tw == mv, lane, Vp).min(
                axis=-1, keepdims=True)                          # [R, 1]
            tv_j.append(mv)
            ti_j.append(iv + c0)
            tw = jnp.where(lane == iv, _NEG, tw)
        cv = jnp.concatenate([rv] + tv_j, axis=1)                # [R, 2k]
        ci = jnp.concatenate([ri] + ti_j, axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * k), 1)
        nrv = []
        nri = []
        for _ in range(k):
            mv = cv.max(axis=-1, keepdims=True)
            pv = jnp.where(cv == mv, pos, 2 * k).min(
                axis=-1, keepdims=True)
            nrv.append(mv)
            nri.append(jnp.where(pos == pv, ci, 0).sum(
                -1, keepdims=True))
            cv = jnp.where(pos == pv, _NEG, cv)
        rv = jnp.concatenate(nrv, axis=1)
        ri = jnp.concatenate(nri, axis=1)
        return m, s, sp, ep, tsum, rv, ri

    m, s, sp, ep, tsum, rv, ri = jax.lax.fori_loop(
        0, nt, tile,
        (jnp.full((R, 1), _NEG, jnp.float32),   # running max of t
         jnp.zeros((R, 1), jnp.float32),        # sum exp(t - m)
         jnp.zeros((R, 1), jnp.float32),        # sum exp(t' - m)
         jnp.zeros((R, 1), jnp.float32),        # sum exp(t'-m)(t'-m)
         jnp.zeros((R, 1), jnp.float32),        # sum t' (valid cols)
         jnp.full((R, k), _NEG, jnp.float32),   # running top-k of t'
         jnp.zeros((R, k), jnp.int32)))

    logs = jnp.log(s)
    c = m + logs                                   # log-softmax constant
    ent = -(ep - logs * sp) / s                    # -Σ exp(lsm')·lsm'
    row_sum = tsum - jnp.float32(V1) * c
    kl = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    vals = jnp.zeros((R, 128), jnp.float32)
    idxs = jnp.zeros((R, 128), jnp.int32)
    for q in range(k):
        vals = jnp.where(kl == q, rv[:, q:q + 1] - c, vals)
        idxs = jnp.where(kl == q, ri[:, q:q + 1], idxs)
    vals = jnp.where(kl == k, row_sum, vals)
    vals = jnp.where(kl == k + 1, ent, vals)
    of_ref[:] = vals
    oi_ref[:] = idxs


@functools.partial(jax.jit, static_argnames=('k', 'unk_idx', 'block'))
def logit_topk(x, w, b, temp=1.0, unk_bias=0.0, *, k: int,
               unk_idx: int = -1, block: int = 512):
    """Fused generator + log-softmax + stats + per-row top-k.

    x: [N, D] (cast to w.dtype); w: [D, V1]; b: [V1] — the generator
    Dense params.  ``temp`` / ``unk_bias`` are TRACED scalars (python
    floats or jnp f32): eval sweeps over temperature / UNK suppression
    reuse one compiled program, matching the engine's compile-key
    hygiene (`api._dynamic_beam_params`).  Returns (top_lsm [N, k] f32,
    top_ix [N, k] i32, row_sum [N] f32, ent [N] f32) where top_lsm are
    ADJUSTED log-softmax values (unk_bias added at unk_idx AFTER the
    softmax, production `_unk_adjust` semantics) of the k best vocab
    entries, ordered desc with lax.top_k tie-breaking.
    """
    N, D = x.shape
    V1 = w.shape[1]
    Vp = -(-V1 // _TV) * _TV
    R = block
    while N % R:
        R //= 2
    grid = (N // R,)
    nt = Vp // _TV
    # tile-major layouts so the kernel's fori_loop indexes W/b tiles by a
    # single leading dim (dynamic minor-dim slices are not tile-legal);
    # loop-invariant in the decode loop, so XLA hoists the transposes
    wp = jnp.pad(w, ((0, 0), (0, Vp - V1))).reshape(
        D, nt, _TV).transpose(1, 0, 2)                    # [nt, D, TV]
    bp = jnp.pad(b.astype(w.dtype).reshape(1, V1),
                 ((0, 0), (0, Vp - V1)),
                 constant_values=_NEG).reshape(nt, 1, _TV)
    scal = jnp.stack([jnp.float32(temp), jnp.float32(unk_bias)])
    kern = functools.partial(
        _logit_topk_kernel, k=k, V1=V1, Vp=Vp,
        unk_idx=int(unk_idx), R=R, D=D)
    of, oi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((nt, 1, _TV), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, D, _TV), w.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((N, 128), jnp.float32),
                   jax.ShapeDtypeStruct((N, 128), jnp.int32)],
    )(scal, x.astype(w.dtype), wp, bp)
    return of[:, :k], oi[:, :k], of[:, k], of[:, k + 1]


def logit_topk_ref(x, w, b, temp=1.0, unk_bias=0.0, *, k: int,
                   unk_idx: int = -1):
    """jnp twin (production math, materialized table): parity oracle and
    CPU fallback.  Mirrors the step's generator + the fast beam path's
    `_finish_table` reductions.  temp/unk_bias traced like logit_topk."""
    logits = (jnp.dot(x.astype(w.dtype), w,
                      preferred_element_type=w.dtype) + b.astype(w.dtype)
              ).astype(jnp.float32)
    lsm = jax.nn.log_softmax(logits / jnp.float32(temp), axis=-1)
    col = jnp.arange(w.shape[1]) == unk_idx
    lsm = lsm + jnp.where(col, jnp.float32(unk_bias), 0.0)
    row_sum = lsm.sum(-1)
    ent = -(jnp.exp(lsm) * lsm).sum(-1)
    tv, ti = jax.lax.top_k(lsm, k)
    return tv, ti, row_sum, ent
