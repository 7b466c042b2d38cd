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
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

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


class MHAProj(nn.Module):
    """The 4 projection matrices of one MultiHeadedAttention block."""
    d_model: int
    dtype: Any = jnp.float32

    def setup(self):
        self.wq = _xavier_dense(self.d_model, self.dtype)
        self.wk = _xavier_dense(self.d_model, self.dtype)
        self.wv = _xavier_dense(self.d_model, self.dtype)
        self.wo = _xavier_dense(self.d_model, self.dtype)


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
    (transformer MHAProj or bert BertAttnBlock); the residual/LN policy
    around the returned ``wo`` output is the caller's.

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


class FFN(nn.Module):
    d_model: int
    d_ff: int
    dtype: Any = jnp.float32

    def setup(self):
        self.w_1 = _xavier_dense(self.d_ff, self.dtype)
        self.w_2 = _xavier_dense(self.d_model, self.dtype)


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

    def setup(self):
        cfg = self.cfg
        D = cfg.d_model
        self.att_bn_in = MaskedBatchNorm() if cfg.use_bn else None
        self.att_embed = MLPEmbed(D, cfg.drop_prob_lm, cfg.dtype)
        self.att_bn_out = MaskedBatchNorm() if cfg.use_bn == 2 else None

        self.enc_self = tuple(MHAProj(D, cfg.dtype) for _ in range(cfg.N_enc))
        self.enc_ffn = tuple(FFN(D, cfg.d_ff, cfg.dtype) for _ in range(cfg.N_enc))
        self.enc_norm1 = tuple(RefLayerNorm() for _ in range(cfg.N_enc))
        self.enc_norm2 = tuple(RefLayerNorm() for _ in range(cfg.N_enc))
        self.enc_final_norm = RefLayerNorm()

        self.dec_self = tuple(MHAProj(D, cfg.dtype) for _ in range(cfg.N_dec))
        self.dec_src = tuple(MHAProj(D, cfg.dtype) for _ in range(cfg.N_dec))
        self.dec_ffn = tuple(FFN(D, cfg.d_ff, cfg.dtype) for _ in range(cfg.N_dec))
        self.dec_norm1 = tuple(RefLayerNorm() for _ in range(cfg.N_dec))
        self.dec_norm2 = tuple(RefLayerNorm() for _ in range(cfg.N_dec))
        self.dec_norm3 = tuple(RefLayerNorm() for _ in range(cfg.N_dec))
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

    def _ffn_apply(self, ffn: FFN, x, train: bool):
        return ffn.w_2(self._dropout(nn.relu(ffn.w_1(x)), self.cfg.dropout,
                                     train))

    def _lazy_cross(self, sproj, y, mem, att_masks, bw, dropout_fn,
                    dropped: bool = False):
        """See _lazy_cross_attend (module level, shared with bert_cap)."""
        return _lazy_cross_attend(sproj, y, mem, att_masks, bw,
                                  self.cfg.num_att_heads, dropout_fn, dropped)

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
    def encode(self, att_feats, att_masks, train: bool = False):
        cfg = self.cfg
        h = cfg.num_att_heads
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
        for i in range(cfg.N_enc):
            proj = self.enc_self[i]
            y = self.enc_norm1[i](x)
            q, k, v = (_split_heads(proj.wq(y), h), _split_heads(proj.wk(y), h),
                       _split_heads(proj.wv(y), h))
            y = proj.wo(_merge_heads(_attend(q, k, v, mask,
                                             self._attn_dropout(train))))
            x = x + self._dropout(y, cfg.dropout, train)
            y = self._ffn_apply(self.enc_ffn[i], self.enc_norm2[i](x), train)
            x = x + self._dropout(y, cfg.dropout, train)
        return self.enc_final_norm(x)

    # -- engine protocol -----------------------------------------------------
    def prepare_feature(self, fc_feats, att_feats, att_masks,
                        train: bool = False):
        memory = self.encode(att_feats, att_masks, train)
        # Decode steps attend the raw memory with the K/V projections folded
        # around the attention (_lazy_cross), so the reference's per-layer
        # K/V decode caches (cachedTransformer.py:201-242) are never
        # materialized — the "cache" is the memory itself.
        if self.is_initializing():
            # wk/wv are otherwise applied only by forward_tf; touch them so
            # init creates the full (checkpoint-compatible) param tree
            for i in range(self.cfg.N_dec):
                _ = self.dec_src[i].wk(memory[:, :1])
                _ = self.dec_src[i].wv(memory[:, :1])
        return {'memory': memory, 'att_masks': att_masks}

    def init_state(self, batch_size: int):
        # per-layer cache entries: each step updates one small tensor
        # in place instead of copying an [B, N_dec, ...] monolith
        cfg = self.cfg
        T = cfg.seq_length + 1  # bos + seq_length steps
        h = cfg.num_att_heads
        dk = cfg.d_model // h
        state = {'t': jnp.zeros((batch_size,), jnp.int32)}
        for i in range(cfg.N_dec):
            state['k%d' % i] = jnp.zeros((batch_size, h, T, dk), cfg.dtype)
            state['v%d' % i] = jnp.zeros((batch_size, h, T, dk), cfg.dtype)
        return state

    def step(self, it, feats, state, train: bool = False,
             logsoftmax: bool = True, uniform_t: bool = False,
             beam_width: int = 0):
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
        t_rows = state['t']                       # [B]
        T = state['k0'].shape[-2]
        B = it.shape[0]
        t0 = t_rows[0]
        x = jnp.take(self.tgt_embed.astype(cfg.dtype), it[:, None], axis=0)
        x = x * jnp.sqrt(jnp.asarray(cfg.d_model, cfg.dtype))
        pe = self.pe.astype(cfg.dtype)
        if uniform_t:
            x = x + jax.lax.dynamic_slice_in_dim(pe, t0, 1, axis=0)[None]
        else:
            x = x + pe[t_rows][:, None, :]
        x = self._dropout(x, cfg.dropout, train)

        new_state = dict(state, t=state['t'] + 1)
        # positions 0..t_row are valid after this step's write
        pos_ids = jnp.arange(T)
        if uniform_t:
            self_mask = (pos_ids <= t0)[None, None, None, :]   # [1,1,1,T]
        else:
            self_mask = (pos_ids[None, :] <= t_rows[:, None]
                         )[:, None, None, :]                   # [B,1,1,T]
        # shared cross-attention: feats may carry one row per beam block
        # (sample_beam passes un-replicated memory when the model supports
        # shared feats); detected by shape so it works with either the
        # ancestry or the physical-reorder beam path
        nb_feats = feats['memory'].shape[0]
        cross_bw = B // nb_feats

        rows = jnp.arange(B)

        def _cache_write(cache, new):              # new: [B, h, 1, dk]
            if uniform_t:
                return jax.lax.dynamic_update_slice_in_dim(
                    cache, new, t0, axis=-2)
            return cache.at[rows, :, t_rows, :].set(new[:, :, 0, :])

        if beam_width:
            slot = (rows % beam_width).astype(jnp.int32)
            if uniform_t:
                anc = jax.lax.dynamic_update_slice_in_dim(
                    state['anc'], slot[:, None], t0, axis=1)
                time_mask = jnp.broadcast_to((pos_ids <= t0)[None], (B, T))
            else:
                anc = state['anc'].at[rows, t_rows].set(slot)
                time_mask = pos_ids[None, :] <= t_rows[:, None]
            new_state['anc'] = anc

        for i in range(cfg.N_dec):
            proj = self.dec_self[i]
            y = self.dec_norm1[i](x)
            q = _split_heads(proj.wq(y), h)           # [B, h, 1, dk]
            k_new = _split_heads(proj.wk(y), h)       # [B, h, 1, dk]
            v_new = _split_heads(proj.wv(y), h)
            k_cache = _cache_write(state['k%d' % i], k_new)
            v_cache = _cache_write(state['v%d' % i], v_new)
            new_state['k%d' % i] = k_cache
            new_state['v%d' % i] = v_cache
            if beam_width:
                y = proj.wo(_merge_heads(_attend_beam(
                    q, k_cache, v_cache, anc, time_mask, beam_width,
                    self._attn_dropout(train))))
            else:
                y = proj.wo(_merge_heads(_attend(
                    q, k_cache, v_cache, self_mask,
                    self._attn_dropout(train))))
            x = x + self._dropout(y, cfg.dropout, train)

            y = self._lazy_cross(self.dec_src[i], self.dec_norm2[i](x),
                                 feats['memory'], feats['att_masks'],
                                 cross_bw, self._attn_dropout(train),
                                 dropped=train and self.cfg.dropout > 0)
            x = x + self._dropout(y, cfg.dropout, train)

            y = self._ffn_apply(self.dec_ffn[i], self.dec_norm3[i](x), train)
            x = x + self._dropout(y, cfg.dropout, train)

        x = self.dec_final_norm(x)[:, 0]
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

        x = self._embed_tokens(seq, 0, train)
        for i in range(cfg.N_dec):
            proj = self.dec_self[i]
            y = self.dec_norm1[i](x)
            q, k, v = (_split_heads(proj.wq(y), h), _split_heads(proj.wk(y), h),
                       _split_heads(proj.wv(y), h))
            y = proj.wo(_merge_heads(_attend(q, k, v, tgt_mask,
                                             self._attn_dropout(train))))
            x = x + self._dropout(y, cfg.dropout, train)

            sproj = self.dec_src[i]
            y = self.dec_norm2[i](x)
            q2 = _split_heads(sproj.wq(y), h)
            mk = _split_heads(sproj.wk(memory), h)
            mv = _split_heads(sproj.wv(memory), h)
            if seq_per_img > 1:
                y = sproj.wo(_merge_heads(_attend_grouped(
                    q2.reshape(nb, seq_per_img, h, T, -1), mk, mv,
                    att_masks, self._attn_dropout(train))))
            else:
                y = sproj.wo(_merge_heads(_attend(
                    q2, mk, mv, src_mask, self._attn_dropout(train))))
            x = x + self._dropout(y, cfg.dropout, train)

            y = self._ffn_apply(self.dec_ffn[i], self.dec_norm3[i](x), train)
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
