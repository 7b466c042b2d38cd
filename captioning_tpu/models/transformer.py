"""Transformer captioner with KV-cached single-step decode.

TPU-native rebuild of the reference annotated-transformer captioner
(``/root/reference/captioning/models/TransformerModel.py:237-363``) merged
with the KV-cache decode semantics of
(``/root/reference/captioning/models/cachedTransformer.py:127-242``) — the
cached step is mathematically identical to full-prefix re-decode at eval,
so it is the only decode path here (the fast variant made default).

Faithful details:
* pre-LN sublayers with the reference's LayerNorm flavour: normalization by
  the *unbiased* std (torch ``x.std(-1)`` divides by n-1) with eps added to
  the std, not the variance (TransformerModel.py:76-87).
* src_embed is identity — the encoder input is the att_embed output
  (TransformerModel.py:250).
* Embeddings scaled by sqrt(d_model) + sinusoidal PE (:208-235).
* xavier-uniform init for every weight with dim > 1 (:254-258).
* teacher-forcing seq_mask: (seq != eos) & (seq != pad), position 0 forced
  on, ANDed with the causal mask (:321-328).

TPU-native structure: the N_enc/N_dec layer parameters are STACKED on a
leading layer axis and eval-mode paths run the layers through a single
``lax.scan`` (one compiled layer body instead of L unrolled copies, so the
scanned beam/greedy decode programs compile ~L-times less HLO), with the
KV caches held as one [B, L, h, T, dk] tensor updated in place through the
scan carry.  Train-mode paths index the same stacks per layer (free static
slices) so training numerics and the module dropout-rng order are
identical to an unrolled implementation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.beam_attend import attend_write_merged, _wa_block
from .harness import ModelConfig
from .layers import Dense, MaskedBatchNorm, MLPEmbed

_NEG_INF = -1e9


def _xavier_dense(features, dtype, name=None):
    return Dense(features, dtype=dtype, name=name,
                 kernel_init=nn.initializers.xavier_uniform())


class RefLayerNorm(nn.Module):
    """Torch-flavoured LayerNorm (unbiased std + eps on std)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a_2 = self.param('a_2', nn.initializers.ones, (c,))
        b_2 = self.param('b_2', nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True) * (c / max(c - 1, 1))  # unbiased
        std = jnp.sqrt(var)
        y = a_2 * (x32 - mean) / (std + self.eps) + b_2
        return y.astype(x.dtype)


def _split_heads(x, h):
    # [..., T, D] -> [..., h, T, dk]
    *lead, T, D = x.shape
    x = x.reshape(*lead, T, h, D // h)
    return jnp.swapaxes(x, -2, -3)


def _merge_heads(x):
    # [..., h, T, dk] -> [..., T, D]
    x = jnp.swapaxes(x, -2, -3)
    *lead, T, h, dk = x.shape
    return x.reshape(*lead, T, h * dk)


def _attend_beam(q, k, v, anc, time_mask, bw, dropout_fn):
    """Decode-step attention through a beam-ancestry table.

    Physical K/V slots never move during beam search; instead each row
    carries ``anc[row, j]`` = the slot (within its block of ``bw``
    consecutive rows) holding its lineage's time-``j`` entry.  Scores are
    computed against every sibling slot and the ancestor's lane is
    selected with an exact mask, so the softmax sees exactly the same
    values as attending a physically reordered cache (non-selected lanes
    contribute exp(-1e9) == 0 in f32).

    q: [N, h, 1, dk]; k/v: [N, h, T, dk]; anc: [N, T] int32;
    time_mask: [N, T] bool (valid past positions).
    """
    N, h, T, dk = k.shape
    nb = N // bw
    q4 = q.reshape(nb, bw, h, dk)
    k5 = k.reshape(nb, bw, h, T, dk)
    v5 = v.reshape(nb, bw, h, T, dk)
    scores = jnp.einsum('bqhd,bshtd->bqhst', q4, k5) / jnp.sqrt(
        jnp.asarray(dk, q.dtype))
    sel = jax.nn.one_hot(anc.reshape(nb, bw, T), bw, dtype=bool)  # [b,q,t,s]
    allowed = (jnp.moveaxis(sel, -1, -2) &
               time_mask.reshape(nb, bw, 1, T))                   # [b,q,s,t]
    scores = jnp.where(allowed[:, :, None], scores, _NEG_INF)
    p = jax.nn.softmax(scores.reshape(nb, bw, h, bw * T).astype(jnp.float32),
                       axis=-1).astype(q.dtype).reshape(nb, bw, h, bw, T)
    p = dropout_fn(p)
    out = jnp.einsum('bqhst,bshtd->bqhd', p, v5)
    return out.reshape(N, h, 1, dk)


def _attend_merged_eval(q, k, v, anc, time_mask, bw, h, dropout_fn):
    """Eval twin of ``_attend_beam``/``_attend`` over MERGED-LANE caches.

    ``use_pallas`` eval decode stores each layer's K/V as [N, Tp, h*dk]
    (512 lanes fill VPU/MXU tiles exactly; the [N, h, T, dk=64] layout
    reads every cache byte twice through the 128-lane pad) so the fused
    write+attend kernel (ops/beam_attend.py) can stream it.  This jnp twin
    carries the non-kernel cases: CPU/interpret runs and the staggered-t
    diverse-beam path.  Identical math to the unmerged attends — the
    reshapes below are free minor/major-dim regroups.

    q: [N, D]; k/v: [N, Tp, D]; anc: [N, Tp] int32 (beam only);
    time_mask: [N, Tp] bool.  Returns merged-head contexts [N, D].
    """
    N, T, D = k.shape
    dk = D // h
    scale = jnp.sqrt(jnp.asarray(dk, q.dtype))
    if bw:
        nb = N // bw
        q4 = q.reshape(nb, bw, h, dk)
        k5 = k.reshape(nb, bw, T, h, dk)
        v5 = v.reshape(nb, bw, T, h, dk)
        scores = jnp.einsum('bqhd,bsthd->bqhst', q4, k5) / scale
        sel = jax.nn.one_hot(anc.reshape(nb, bw, T), bw, dtype=bool)
        allowed = (jnp.moveaxis(sel, -1, -2) &
                   time_mask.reshape(nb, bw, 1, T))
        scores = jnp.where(allowed[:, :, None], scores, _NEG_INF)
        p = jax.nn.softmax(
            scores.reshape(nb, bw, h, bw * T).astype(jnp.float32),
            axis=-1).astype(q.dtype).reshape(nb, bw, h, bw, T)
        p = dropout_fn(p)
        out = jnp.einsum('bqhst,bsthd->bqhd', p, v5)
        return out.reshape(N, D)
    q3 = q.reshape(N, h, dk)
    k4 = k.reshape(N, T, h, dk)
    v4 = v.reshape(N, T, h, dk)
    scores = jnp.einsum('bhd,bthd->bht', q3, k4) / scale
    scores = jnp.where(time_mask[:, None, :], scores, _NEG_INF)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    p = dropout_fn(p)
    out = jnp.einsum('bht,bthd->bhd', p, v4)
    return out.reshape(N, D)


def _attend_shared(q, k, v, mask, dropout_fn):
    """Cross-attention where one K/V row is shared by a block of query rows.

    Beam lanes of the same image attend the SAME encoder memory; feeding the
    un-replicated [nb, h, M, dk] K/V here cuts the dominant cross-attention
    HBM traffic by the beam width vs attending a lane-replicated copy.

    q: [nb, bw, h, dk]; k/v: [nb, h, M, dk]; mask: [nb, M] or None.
    Returns [nb*bw, h, 1, dk].
    """
    nb, bw, h, dk = q.shape
    scores = jnp.einsum('bqhd,bhmd->bqhm', q, k) / jnp.sqrt(
        jnp.asarray(dk, q.dtype))
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :] == 0, _NEG_INF, scores)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    p = dropout_fn(p)
    out = jnp.einsum('bqhm,bhmd->bqhd', p, v)
    return out.reshape(nb * bw, h, 1, dk)


def _attend_grouped(q, k, v, mask, dropout_fn):
    """Cross-attention for teacher forcing where one K/V row is shared by a
    block of ``s`` query ROWS (the seq_per_img sequences of one image).

    q: [B, s, h, T, dk]; k/v: [B, h, M, dk]; mask: [B, M] or None.
    Returns [B*s, h, T, dk].  Reads the encoder memory once per image
    instead of once per sequence.
    """
    B, s, h, T, dk = q.shape
    scores = jnp.einsum('bshtd,bhmd->bshtm', q, k) / jnp.sqrt(
        jnp.asarray(dk, q.dtype))
    if mask is not None:
        scores = jnp.where(mask[:, None, None, None, :] == 0, _NEG_INF,
                           scores)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    p = dropout_fn(p)
    out = jnp.einsum('bshtm,bhmd->bshtd', p, v)
    return out.reshape(B * s, h, T, dk)


def _attend(q, k, v, mask, dropout_fn):
    """Scaled dot product attention (reference TransformerModel.py:152-162).

    q: [..., h, Tq, dk]; k/v: [..., h, Tk, dk]; mask broadcastable to
    [..., 1, Tq, Tk] (1 = attend).
    """
    dk = q.shape[-1]
    scores = jnp.einsum('...qd,...kd->...qk', q, k) / jnp.sqrt(
        jnp.asarray(dk, q.dtype))
    if mask is not None:
        scores = jnp.where(mask == 0, _NEG_INF, scores)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    p = dropout_fn(p)
    return jnp.einsum('...qk,...kd->...qd', p, v)


def _lazy_cross_attend(sproj, y, mem, att_masks, bw, h, dropout_fn,
                       dropped: bool = False):
    """Decode-step cross-attention over the RAW encoder memory.

    Exact reformulation of q·K(mem) -> softmax -> p·V(mem): the K
    projection folds into the query (K's bias shifts every score of a
    row equally, so softmax is invariant to it) and the V projection is
    applied to the attended context.  V's bias enters weighted by
    sum_m p_m — exactly 1 for plain softmax (the eval path adds ``bv``
    directly to keep its numerics bit-identical to the cached-K/V
    formulation), but NOT 1 under attention dropout, where the dropped
    probabilities carry ``p.sum(-1)`` through to the bias term
    (``dropped=True``, train-mode RL decode).
    Per-layer [B, h, M, dk] K/V tensors (reference
    cachedTransformer.py:201-242 caches them) are never materialized:
    same HBM traffic per step, but MXU-shaped batched matmuls instead
    of the [B,h,M]-output mul+reduce VPU fusions (which measured ~half
    the greedy step, tools/profile_decode.py) and 12x less feats
    memory.

    ``sproj`` carries ``wq``/``wk``/``wv``/``wo`` Dense submodules
    (bert's BertAttnBlock; the transformer itself uses the stacked-param
    twin ``_lazy_cross_stk``); the residual/LN policy around the returned
    ``wo`` output is the caller's.

    y: [B, 1, D] with B = nb*bw (bw > 1 when beam blocks share feats);
    mem: [nb, M, D]; att_masks: [nb, M] or None.  Returns [B, 1, D].
    """
    D = y.shape[-1]
    dk = D // h
    nb, M, _ = mem.shape
    q = _split_heads(sproj.wq(y), h)[:, :, 0]            # [B, h, dk]
    wk = sproj.wk.variables['params']['kernel'].astype(mem.dtype)
    qt = jnp.einsum('bhk,dhk->bhd', q, wk.reshape(D, h, dk))
    scores = jnp.einsum('gqd,gmd->gqm', qt.reshape(nb, bw * h, D),
                        mem) / jnp.sqrt(jnp.asarray(dk, q.dtype))
    if att_masks is not None:
        scores = jnp.where(att_masks[:, None, :] == 0, _NEG_INF, scores)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    p = dropout_fn(p)
    ctx = jnp.einsum('gqm,gmd->gqd', p, mem)             # [nb, bw*h, D]
    wv = sproj.wv.variables['params']['kernel'].astype(mem.dtype)
    bv = sproj.wv.variables['params']['bias'].astype(mem.dtype)
    out = jnp.einsum('bhd,dhk->bhk', ctx.reshape(-1, h, D),
                     wv.reshape(D, h, dk))
    if dropped:
        # dropout rescaled/zeroed p: the cached-K/V computation weights
        # V's bias by the (dropped) probability mass, not by 1
        out = out + bv.reshape(1, h, dk) * p.sum(-1).reshape(-1, h, 1)
    else:
        out = out + bv.reshape(1, h, dk)
    return sproj.wo(out.reshape(-1, 1, D))


# -- stacked-parameter helpers ------------------------------------------------
# The transformer stores its N_enc/N_dec layer parameters STACKED on a
# leading layer axis (one [L, ...] array per weight kind) instead of L
# separate submodules.  Eval-mode paths then run the layers through a
# single lax.scan — the compiled HLO contains ONE layer body instead of L
# unrolled copies (~L-times smaller decode-step program, attacking the
# cold-compile cost of the scanned beam program), while train-mode paths
# index the stack per layer (a free static slice — identical math, and
# the same module-level dropout-rng call order as the unrolled original).


def _stacked_bias_init(fan_in: int):
    """torch nn.Linear default bias U(+-1/sqrt(fan_in)) on a [L, out] stack."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _plin(x, p, dtype):
    """layers.Dense compute on an explicit {'kernel','bias'} param dict."""
    y = jnp.dot(x.astype(dtype), p['kernel'].astype(dtype),
                preferred_element_type=dtype)
    return y + p['bias'].astype(dtype)


def _pln(x, a_2, b_2, eps=1e-6):
    """RefLayerNorm compute on explicit params (unbiased std + eps on std)."""
    c = x.shape[-1]
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True) * (c / max(c - 1, 1))
    std = jnp.sqrt(var)
    y = a_2 * (x32 - mean) / (std + eps) + b_2
    return y.astype(x.dtype)


def _lazy_cross_stk(lp, y, mem, att_masks, bw, h, dtype, dropout_fn,
                    dropped: bool = False):
    """_lazy_cross_attend on explicit per-layer params (see its docstring).

    ``lp`` carries {'wq','wk','wv','wo'} param dicts for ONE layer (sliced
    from the [L, ...] stacks); the math is identical to the module-based
    variant bert_cap still uses.
    """
    D = y.shape[-1]
    dk = D // h
    nb, M, _ = mem.shape
    q = _split_heads(_plin(y, lp['wq'], dtype), h)[:, :, 0]   # [B, h, dk]
    wk = lp['wk']['kernel'].astype(mem.dtype)
    qt = jnp.einsum('bhk,dhk->bhd', q, wk.reshape(D, h, dk))
    scores = jnp.einsum('gqd,gmd->gqm', qt.reshape(nb, bw * h, D),
                        mem) / jnp.sqrt(jnp.asarray(dk, q.dtype))
    if att_masks is not None:
        scores = jnp.where(att_masks[:, None, :] == 0, _NEG_INF, scores)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    p = dropout_fn(p)
    ctx = jnp.einsum('gqm,gmd->gqd', p, mem)                  # [nb, bw*h, D]
    wv = lp['wv']['kernel'].astype(mem.dtype)
    bv = lp['wv']['bias'].astype(mem.dtype)
    out = jnp.einsum('bhd,dhk->bhk', ctx.reshape(-1, h, D),
                     wv.reshape(D, h, dk))
    if dropped:
        out = out + bv.reshape(1, h, dk) * p.sum(-1).reshape(-1, h, 1)
    else:
        out = out + bv.reshape(1, h, dk)
    return _plin(out.reshape(-1, 1, D), lp['wo'], dtype)


class TransformerCaptioner(nn.Module):
    """Encoder-decoder captioner exposing the engine step protocol."""
    cfg: ModelConfig
    # beam search never physically reorders this model's KV caches; it
    # reorders an ancestry table instead (engine/decoding.py beam_search)
    SUPPORTS_BEAM_ANCESTRY = True
    # step() accepts cross-attention feats with one row per beam BLOCK
    # (nb = B // beam_width) instead of lane-replicated rows, halving+
    # the cross-attend HBM traffic (see _attend_shared)
    SUPPORTS_SHARED_BEAM_FEATS = True
    # step(return_hidden=True) exposes the pre-generator hidden so the
    # engine can run the fused logit epilogue (ops/logit_topk.py)
    SUPPORTS_FUSED_LOGIT = True

    def setup(self):
        cfg = self.cfg
        D, F = cfg.d_model, cfg.d_ff
        self.att_bn_in = MaskedBatchNorm() if cfg.use_bn else None
        self.att_embed = MLPEmbed(D, cfg.drop_prob_lm, cfg.dtype)
        self.att_bn_out = MaskedBatchNorm() if cfg.use_bn == 2 else None

        # layer params stacked on a leading [L] axis (see the stacked-param
        # helpers above); xavier fans exclude the layer batch axis
        xav = nn.initializers.xavier_uniform(batch_axis=0)

        def lin(name, L, din, dout):
            return {'kernel': self.param(name + '_kernel', xav,
                                         (L, din, dout)),
                    'bias': self.param(name + '_bias',
                                       _stacked_bias_init(din), (L, dout))}

        def ln(name, L):
            return {'a': self.param(name + '_a2', nn.initializers.ones,
                                    (L, D)),
                    'b': self.param(name + '_b2', nn.initializers.zeros,
                                    (L, D))}

        Le, Ld = cfg.N_enc, cfg.N_dec
        self.enc_stack = {
            'wq': lin('enc_self_wq', Le, D, D),
            'wk': lin('enc_self_wk', Le, D, D),
            'wv': lin('enc_self_wv', Le, D, D),
            'wo': lin('enc_self_wo', Le, D, D),
            'w1': lin('enc_ffn_w1', Le, D, F),
            'w2': lin('enc_ffn_w2', Le, F, D),
            'n1': ln('enc_norm1', Le), 'n2': ln('enc_norm2', Le)}
        self.enc_final_norm = RefLayerNorm()

        self.dec_stack = {
            's_wq': lin('dec_self_wq', Ld, D, D),
            's_wk': lin('dec_self_wk', Ld, D, D),
            's_wv': lin('dec_self_wv', Ld, D, D),
            's_wo': lin('dec_self_wo', Ld, D, D),
            'c_wq': lin('dec_src_wq', Ld, D, D),
            'c_wk': lin('dec_src_wk', Ld, D, D),
            'c_wv': lin('dec_src_wv', Ld, D, D),
            'c_wo': lin('dec_src_wo', Ld, D, D),
            'w1': lin('dec_ffn_w1', Ld, D, F),
            'w2': lin('dec_ffn_w2', Ld, F, D),
            'n1': ln('dec_norm1', Ld), 'n2': ln('dec_norm2', Ld),
            'n3': ln('dec_norm3', Ld)}
        self.dec_final_norm = RefLayerNorm()

        self.tgt_embed = self.param(
            'tgt_embed', nn.initializers.xavier_uniform(),
            (cfg.vocab_size + 1, D))
        self.generator = _xavier_dense(cfg.vocab_size + 1, cfg.dtype)

        # sinusoidal PE table (reference :219-231)
        max_len = max(cfg.seq_length + 4, 64)
        pe = np.zeros((max_len, D), np.float32)
        position = np.arange(0, max_len)[:, None].astype(np.float32)
        div_term = np.exp(np.arange(0, D, 2).astype(np.float32) *
                          -(np.log(10000.0) / D))
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term)
        self.pe = jnp.asarray(pe)

    # -- helpers -----------------------------------------------------------
    def _dropout(self, x, rate, train: bool):
        if not train or rate == 0.0:
            return x
        rng = self.make_rng('dropout')
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    def _attn_dropout(self, train: bool):
        return lambda p: self._dropout(p, self.cfg.dropout, train)

    def _embed_tokens(self, ids, t0, train: bool):
        """Embeddings * sqrt(d) + PE (positions t0..t0+T) + dropout
        (reference :208-235)."""
        cfg = self.cfg
        x = jnp.take(self.tgt_embed.astype(cfg.dtype), ids, axis=0)
        x = x * jnp.sqrt(jnp.asarray(cfg.d_model, cfg.dtype))
        pe = jax.lax.dynamic_slice_in_dim(self.pe, t0, x.shape[-2])
        x = x + pe[None].astype(cfg.dtype)
        return self._dropout(x, cfg.dropout, train)

    # -- encoder -------------------------------------------------------------
    def _enc_layer(self, x, lp, mask, train: bool):
        """One encoder layer on sliced stacked params (shared by the
        eval-mode layer scan and the unrolled train path)."""
        cfg = self.cfg
        h = cfg.num_att_heads
        dt = cfg.dtype
        y = _pln(x, lp['n1']['a'], lp['n1']['b'])
        q = _split_heads(_plin(y, lp['wq'], dt), h)
        k = _split_heads(_plin(y, lp['wk'], dt), h)
        v = _split_heads(_plin(y, lp['wv'], dt), h)
        y = _plin(_merge_heads(_attend(q, k, v, mask,
                                       self._attn_dropout(train))),
                  lp['wo'], dt)
        x = x + self._dropout(y, cfg.dropout, train)
        y = _plin(self._dropout(
            nn.relu(_plin(_pln(x, lp['n2']['a'], lp['n2']['b']),
                          lp['w1'], dt)), cfg.dropout, train), lp['w2'], dt)
        x = x + self._dropout(y, cfg.dropout, train)
        return x

    def encode(self, att_feats, att_masks, train: bool = False):
        cfg = self.cfg
        x = att_feats
        if self.att_bn_in is not None:
            x = self.att_bn_in(x, att_masks, train)
        x = self.att_embed(x, train)
        if self.att_bn_out is not None:
            x = self.att_bn_out(x, att_masks, train)
        # src mask [B, 1, 1, M]
        mask = None
        if att_masks is not None:
            mask = att_masks[:, None, None, :]
        if train:
            # unrolled: layer dropout rngs come from the module rng counter
            for i in range(cfg.N_enc):
                lp = jax.tree.map(lambda p: p[i], self.enc_stack)
                x = self._enc_layer(x, lp, mask, True)
        elif cfg.N_enc:
            # one compiled layer body, scanned over the param stacks
            x, _ = jax.lax.scan(
                lambda c, lp: (self._enc_layer(c, lp, mask, False), None),
                x, self.enc_stack)
        return self.enc_final_norm(x)

    # -- engine protocol -----------------------------------------------------
    def prepare_feature(self, fc_feats, att_feats, att_masks,
                        train: bool = False):
        memory = self.encode(att_feats, att_masks, train)
        # Decode steps attend the raw memory with the K/V projections folded
        # around the attention (_lazy_cross_stk), so the reference's
        # per-layer K/V decode caches (cachedTransformer.py:201-242) are
        # never materialized — the "cache" is the memory itself.
        return {'memory': memory, 'att_masks': att_masks}

    def init_state(self, batch_size: int, train: bool = False,
                   beam: bool = False):
        # PER-LAYER caches (k0..k{L-1}/v0..v{L-1}), not one stacked
        # [B, L, h, T, dk] tensor: stacking was measured on the v5e
        # to cost ~9 ms/step at the beam-5 B=1024 headline shape (2916 ->
        # 1909 cap/s) regardless of whether the layer loop is unrolled
        # (static slices) or scanned — the per-layer dynamic-update-slices
        # into the shared 110 MB buffer defeat XLA's in-place aliasing in
        # the decode while-loop.  Separate buffers alias cleanly.  The
        # PARAM stacks stay (that is where the 665 s -> ~70 s cold-compile
        # win lives).
        #
        # Layouts: use_pallas eval decode holds each cache MERGED-LANE
        # [B, Tp, h*dk] (Tp padded to 8 for DMA tile alignment) for the
        # fused write+attend kernel (ops/beam_attend.py); train decode and
        # use_pallas=0 keep [B, h, T, dk] — step() detects the layout from
        # the cache rank, so the rng-exact RL recompute path is untouched.
        # Merged engages for single-group BEAM decode (beam=True, any
        # batch) and for SMALL-batch greedy/sample rows, where the
        # pseudo-beam kernel blocks win the latency-bound step (B=64:
        # 2168 -> 2727 cap/s); large-batch greedy keeps [B, h, T, dk] —
        # the full-lane MXU attends there beat the kernel (B=1024: 12766
        # vs 11309 cap/s, v5e).  Diverse groups (staggered t) also land
        # here with beam=False: the kernel cannot serve them and the
        # merged jnp twin measured 14.24 vs 9.32 ms/step (BENCH.md r4
        # layout sweep).
        cfg = self.cfg
        T = cfg.seq_length + 1  # bos + seq_length steps
        h = cfg.num_att_heads
        dk = cfg.d_model // h
        state = {'t': jnp.zeros((batch_size,), jnp.int32)}
        if cfg.use_pallas and not train and (beam or batch_size <= 256):
            Tp = -(-T // 8) * 8
            for i in range(cfg.N_dec):
                state['k%d' % i] = jnp.zeros(
                    (batch_size, Tp, cfg.d_model), cfg.dtype)
                state['v%d' % i] = jnp.zeros(
                    (batch_size, Tp, cfg.d_model), cfg.dtype)
        else:
            for i in range(cfg.N_dec):
                state['k%d' % i] = jnp.zeros((batch_size, h, T, dk),
                                             cfg.dtype)
                state['v%d' % i] = jnp.zeros((batch_size, h, T, dk),
                                             cfg.dtype)
        return state

    def step(self, it, feats, state, train: bool = False,
             logsoftmax: bool = True, uniform_t: bool = False,
             beam_width: int = 0, return_hidden: bool = False):
        """Single cached decoder step (cachedTransformer.py:398-420).

        ``t`` is PER ROW (state['t']): diverse-beam groups are staggered in
        time, so rows of the same batched call can sit at different
        positions.  Callers that guarantee every row is at the same step
        (plain sampling, non-diverse beam) pass ``uniform_t=True`` to get
        the cheaper dynamic-slice cache update instead of a row scatter.

        ``beam_width > 0`` enables ancestry attention: the caller
        (beam_search) never physically reorders the K/V caches — rows are
        grouped in blocks of ``beam_width`` physical slots and
        ``state['anc']`` maps each row's past positions to sibling slots.
        This removes the dominant HBM traffic of beam search (a full
        cache permute per step)."""
        cfg = self.cfg
        h = cfg.num_att_heads
        dt = cfg.dtype
        t_rows = state['t']                       # [B]
        merged = state['k0'].ndim == 3            # [B, Tp, D] eval caches
        T = state['k0'].shape[-2]                 # Tp when merged
        B = it.shape[0]
        t0 = t_rows[0]
        x = jnp.take(self.tgt_embed.astype(dt), it[:, None], axis=0)
        x = x * jnp.sqrt(jnp.asarray(cfg.d_model, dt))
        pe = self.pe.astype(dt)
        if uniform_t:
            x = x + jax.lax.dynamic_slice_in_dim(pe, t0, 1, axis=0)[None]
        else:
            x = x + pe[t_rows][:, None, :]
        x = self._dropout(x, cfg.dropout, train)

        new_state = dict(state, t=state['t'] + 1)
        # positions 0..t_row are valid after this step's write
        pos_ids = jnp.arange(T)
        anc = time_mask = self_mask = None
        if uniform_t:
            self_mask = (pos_ids <= t0)[None, None, None, :]   # [1,1,1,T]
            tmask_rows = jnp.broadcast_to((pos_ids <= t0)[None], (B, T))
        else:
            self_mask = (pos_ids[None, :] <= t_rows[:, None]
                         )[:, None, None, :]                   # [B,1,1,T]
            tmask_rows = pos_ids[None, :] <= t_rows[:, None]
        # shared cross-attention: feats may carry one row per beam block
        # (sample_beam passes un-replicated memory when the model supports
        # shared feats); detected by shape so it works with either the
        # ancestry or the physical-reorder beam path
        mem, am = feats['memory'], feats['att_masks']
        cross_bw = B // mem.shape[0]

        rows = jnp.arange(B)

        if beam_width:
            slot = (rows % beam_width).astype(jnp.int32)
            if uniform_t:
                anc = jax.lax.dynamic_update_slice_in_dim(
                    state['anc'], slot[:, None], t0, axis=1)
            else:
                anc = state['anc'].at[rows, t_rows].set(slot)
            time_mask = tmask_rows
            new_state['anc'] = anc

        # fused write+attend kernel (ops/beam_attend.py) over the merged
        # caches: eval-only (no attention dropout) and uniform-t.  Greedy/
        # sampling rows (beam_width == 0) run as pseudo-beam blocks — bw_eff
        # rows share one kernel block with an identity ancestry, turning
        # the per-row matvecs into near-full-lane MXU matmuls.
        use_kernel = (merged and uniform_t and not train
                      and jax.default_backend() == 'tpu')
        anc_k, bw_eff = anc, beam_width
        if use_kernel:
            if not beam_width:
                bw_eff = next((g for g in (8, 4, 2, 1) if B % g == 0))
                anc_k = jnp.broadcast_to(
                    (rows % bw_eff).astype(jnp.int32)[:, None], (B, T))
            cb = _wa_block(B // bw_eff, bw_eff, h, T, cfg.d_model,
                           jnp.dtype(dt).itemsize)
            use_kernel = cb is not None

        dropped = train and cfg.dropout > 0

        def layer(x, lp, k_cache, v_cache):
            """One decoder layer on its own [B, h, T, dk] caches: write this
            step's K/V entry in place (XLA aliases the per-layer buffers
            through the decode while-loop carry), attend, cross-attend
            lazily, FFN.  Params come pre-sliced from the [L]-stacked
            arrays (static index, free)."""
            y = _pln(x, lp['n1']['a'], lp['n1']['b'])
            if merged:
                q_m = _plin(y, lp['s_wq'], dt)[:, 0]          # [B, D]
                k_new = _plin(y, lp['s_wk'], dt)[:, 0]
                v_new = _plin(y, lp['s_wv'], dt)[:, 0]
                if use_kernel:
                    ctx, k_cache, v_cache = attend_write_merged(
                        q_m, k_cache, v_cache, k_new, v_new, anc_k, t0,
                        bw=bw_eff, h=h)
                else:
                    if uniform_t:
                        k_cache = jax.lax.dynamic_update_slice_in_dim(
                            k_cache, k_new[:, None], t0, axis=1)
                        v_cache = jax.lax.dynamic_update_slice_in_dim(
                            v_cache, v_new[:, None], t0, axis=1)
                    else:
                        k_cache = k_cache.at[rows, t_rows].set(k_new)
                        v_cache = v_cache.at[rows, t_rows].set(v_new)
                    ctx = _attend_merged_eval(
                        q_m, k_cache, v_cache, anc, tmask_rows, beam_width,
                        h, self._attn_dropout(train))
                y = _plin(ctx[:, None, :], lp['s_wo'], dt)
                x = x + self._dropout(y, cfg.dropout, train)
            else:
                q = _split_heads(_plin(y, lp['s_wq'], dt), h)  # [B,h,1,dk]
                k_new = _split_heads(_plin(y, lp['s_wk'], dt), h)
                v_new = _split_heads(_plin(y, lp['s_wv'], dt), h)
                if uniform_t:
                    k_cache = jax.lax.dynamic_update_slice_in_dim(
                        k_cache, k_new, t0, axis=2)
                    v_cache = jax.lax.dynamic_update_slice_in_dim(
                        v_cache, v_new, t0, axis=2)
                else:
                    k_cache = k_cache.at[rows, :, t_rows, :].set(
                        k_new[:, :, 0, :])
                    v_cache = v_cache.at[rows, :, t_rows, :].set(
                        v_new[:, :, 0, :])
                if beam_width:
                    y = _plin(_merge_heads(_attend_beam(
                        q, k_cache, v_cache, anc, time_mask, beam_width,
                        self._attn_dropout(train))), lp['s_wo'], dt)
                else:
                    y = _plin(_merge_heads(_attend(
                        q, k_cache, v_cache, self_mask,
                        self._attn_dropout(train))), lp['s_wo'], dt)
                x = x + self._dropout(y, cfg.dropout, train)

            y = _lazy_cross_stk(
                {'wq': lp['c_wq'], 'wk': lp['c_wk'],
                 'wv': lp['c_wv'], 'wo': lp['c_wo']},
                _pln(x, lp['n2']['a'], lp['n2']['b']), mem, am,
                cross_bw, h, dt, self._attn_dropout(train), dropped)
            x = x + self._dropout(y, cfg.dropout, train)

            y = _plin(self._dropout(
                nn.relu(_plin(_pln(x, lp['n3']['a'], lp['n3']['b']),
                              lp['w1'], dt)), cfg.dropout, train),
                lp['w2'], dt)
            x = x + self._dropout(y, cfg.dropout, train)
            return x, k_cache, v_cache

        # Always unrolled: train needs the module rng-counter order per
        # layer (rng-exact RL recompute), and eval keeps per-layer cache
        # buffers (see init_state) that a layer scan cannot carry without
        # re-stacking them every step.  Compile cost is carried by the
        # param stacks, not the unroll: cold compile measured ~67 s
        # unrolled vs 665 s with unstacked per-layer params.
        for i in range(cfg.N_dec):
            lp = jax.tree.map(lambda p: p[i], self.dec_stack)
            x, new_state['k%d' % i], new_state['v%d' % i] = layer(
                x, lp, state['k%d' % i], state['v%d' % i])

        x = self.dec_final_norm(x)[:, 0]
        if return_hidden:
            # the fused logit epilogue (ops/logit_topk.py) applies the
            # generator itself, in-kernel
            return x, new_state
        logits = self.generator(x).astype(jnp.float32)
        state = new_state
        if logsoftmax:
            return jax.nn.log_softmax(logits, axis=-1), state
        return logits, state

    # -- teacher forcing (parallel over time) --------------------------------
    def forward_tf(self, fc_feats, att_feats, seq, att_masks,
                   train: bool = False):
        """reference TransformerModel._forward (:340-348) with the
        _prepare_feature_forward seq_mask semantics (:312-338)."""
        cfg = self.cfg
        h = cfg.num_att_heads
        if seq.ndim == 3:
            seq = seq.reshape(-1, seq.shape[2])
        memory = self.encode(att_feats, att_masks, train)
        # the seq_per_img sequences of one image share the encoder memory:
        # cross-attention runs grouped (one K/V row per image) instead of
        # replicating memory per sequence
        seq_per_img = seq.shape[0] // memory.shape[0]
        nb = memory.shape[0]

        T = seq.shape[1]
        seq_mask = (seq != cfg.eos_idx) & (seq != cfg.pad_idx)
        seq_mask = seq_mask.at[:, 0].set(True)
        causal = jnp.tril(jnp.ones((T, T), bool))
        tgt_mask = (seq_mask[:, None, None, :] & causal[None, None])  # [B,1,T,T]
        src_mask = None
        if att_masks is not None:
            src_mask = att_masks[:, None, None, :]

        dt = cfg.dtype
        x = self._embed_tokens(seq, 0, train)
        for i in range(cfg.N_dec):
            lp = jax.tree.map(lambda p: p[i], self.dec_stack)
            y = _pln(x, lp['n1']['a'], lp['n1']['b'])
            q = _split_heads(_plin(y, lp['s_wq'], dt), h)
            k = _split_heads(_plin(y, lp['s_wk'], dt), h)
            v = _split_heads(_plin(y, lp['s_wv'], dt), h)
            y = _plin(_merge_heads(_attend(q, k, v, tgt_mask,
                                           self._attn_dropout(train))),
                      lp['s_wo'], dt)
            x = x + self._dropout(y, cfg.dropout, train)

            y = _pln(x, lp['n2']['a'], lp['n2']['b'])
            q2 = _split_heads(_plin(y, lp['c_wq'], dt), h)
            mk = _split_heads(_plin(memory, lp['c_wk'], dt), h)
            mv = _split_heads(_plin(memory, lp['c_wv'], dt), h)
            if seq_per_img > 1:
                y = _plin(_merge_heads(_attend_grouped(
                    q2.reshape(nb, seq_per_img, h, T, -1), mk, mv,
                    att_masks, self._attn_dropout(train))), lp['c_wo'], dt)
            else:
                y = _plin(_merge_heads(_attend(
                    q2, mk, mv, src_mask, self._attn_dropout(train))),
                    lp['c_wo'], dt)
            x = x + self._dropout(y, cfg.dropout, train)

            y = _plin(self._dropout(
                nn.relu(_plin(_pln(x, lp['n3']['a'], lp['n3']['b']),
                              lp['w1'], dt)), cfg.dropout, train),
                lp['w2'], dt)
            x = x + self._dropout(y, cfg.dropout, train)
        x = self.dec_final_norm(x)
        logits = self.generator(x).astype(jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1)

    def __call__(self, fc_feats, att_feats, att_masks, it):
        """Init-only entry: touches every parameter once."""
        feats = self.prepare_feature(fc_feats, att_feats, att_masks, False)
        state = self.init_state(att_feats.shape[0])
        logprobs, _ = self.step(it, feats, state, False)
        # also touch TF path params (same weights; no new params created)
        return logprobs
