"""BERT-style captioner (native flax rebuild of the reference BertCapModel).

The reference (``/root/reference/captioning/models/BertCapModel.py``) wraps
huggingface ``BertModel``s as encoder/decoder (randomly initialized, not
pretrained): the encoder consumes the att-embed output directly (its
embeddings are deleted, :79-81), the decoder is a BERT stack with causal
self-attention + cross-attention, learned position embeddings and post-LN
blocks with gelu.  This is that architecture built natively, exposing the
engine step protocol with KV-cached decoding.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .harness import ModelConfig
from .layers import Dense, MaskedBatchNorm, MLPEmbed
from .transformer import (_attend, _attend_beam, _attend_grouped,
                          _lazy_cross_attend, _merge_heads, _split_heads)

_LN_EPS = 1e-12  # BertConfig default


class BertLayerNorm(nn.Module):
    eps: float = _LN_EPS

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class BertAttnBlock(nn.Module):
    """self-attention + output dense + post-LN."""
    d_model: int
    dtype: Any = jnp.float32

    def setup(self):
        D = self.d_model
        self.wq = Dense(D, dtype=self.dtype)
        self.wk = Dense(D, dtype=self.dtype)
        self.wv = Dense(D, dtype=self.dtype)
        self.wo = Dense(D, dtype=self.dtype)
        self.ln = BertLayerNorm()


class BertFFNBlock(nn.Module):
    d_model: int
    d_ff: int
    dtype: Any = jnp.float32

    def setup(self):
        self.w_in = Dense(self.d_ff, dtype=self.dtype)
        self.w_out = Dense(self.d_model, dtype=self.dtype)
        self.ln = BertLayerNorm()


class BertCaptioner(nn.Module):
    """BERT encoder-decoder captioner with the engine step protocol."""
    cfg: ModelConfig
    SUPPORTS_BEAM_ANCESTRY = True
    # step() accepts block-shared cross-attention feats (one encoder-memory
    # row per beam block) — see transformer._attend_shared
    SUPPORTS_SHARED_BEAM_FEATS = True

    def setup(self):
        cfg = self.cfg
        D = cfg.d_model
        self.att_bn_in = MaskedBatchNorm() if cfg.use_bn else None
        self.att_embed = MLPEmbed(D, cfg.drop_prob_lm, cfg.dtype)
        self.att_bn_out = MaskedBatchNorm() if cfg.use_bn == 2 else None

        self.enc_self = tuple(BertAttnBlock(D, cfg.dtype)
                              for _ in range(cfg.N_enc))
        self.enc_ffn = tuple(BertFFNBlock(D, cfg.d_ff, cfg.dtype)
                             for _ in range(cfg.N_enc))
        self.dec_self = tuple(BertAttnBlock(D, cfg.dtype)
                              for _ in range(cfg.N_dec))
        self.dec_cross = tuple(BertAttnBlock(D, cfg.dtype)
                               for _ in range(cfg.N_dec))
        self.dec_ffn = tuple(BertFFNBlock(D, cfg.d_ff, cfg.dtype)
                             for _ in range(cfg.N_dec))

        init = nn.initializers.normal(stddev=0.02)  # BERT default
        self.word_embed = self.param('word_embed', init,
                                     (cfg.vocab_size + 1, D))
        max_pos = max(cfg.seq_length + 4, 17)
        self.pos_embed = self.param('pos_embed', init, (max_pos, D))
        self.type_embed = self.param('type_embed', init, (1, D))
        self.embed_ln = BertLayerNorm()
        self.generator = Dense(cfg.vocab_size + 1, dtype=cfg.dtype,
                               kernel_init=nn.initializers.xavier_uniform())

    def _dropout(self, x, rate, train: bool):
        if not train or rate == 0.0:
            return x
        rng = self.make_rng('dropout')
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    def _attn(self, blk: BertAttnBlock, q_in, kv_k, kv_v, mask, train):
        """pre-projected K/V, post-LN residual (BERT style)."""
        h = self.cfg.num_att_heads
        q = _split_heads(blk.wq(q_in), h)
        x = _merge_heads(_attend(q, kv_k, kv_v, mask,
                                 lambda p: self._dropout(
                                     p, self.cfg.dropout, train)))
        x = self._dropout(blk.wo(x), self.cfg.dropout, train)
        return blk.ln(q_in + x)

    def _attn_anc(self, blk: BertAttnBlock, q_in, kv_k, kv_v, anc,
                  time_mask, bw, train):
        """self-attention through the beam-ancestry table (see
        transformer._attend_beam); post-LN residual as in _attn."""
        h = self.cfg.num_att_heads
        q = _split_heads(blk.wq(q_in), h)
        x = _merge_heads(_attend_beam(q, kv_k, kv_v, anc, time_mask, bw,
                                      lambda p: self._dropout(
                                          p, self.cfg.dropout, train)))
        x = self._dropout(blk.wo(x), self.cfg.dropout, train)
        return blk.ln(q_in + x)

    def _ffn(self, blk: BertFFNBlock, x, train):
        y = jax.nn.gelu(blk.w_in(x), approximate=False)
        y = self._dropout(blk.w_out(y), self.cfg.dropout, train)
        return blk.ln(x + y)

    def encode(self, att_feats, att_masks, train: bool = False):
        cfg = self.cfg
        h = cfg.num_att_heads
        x = att_feats
        if self.att_bn_in is not None:
            x = self.att_bn_in(x, att_masks, train)
        x = self.att_embed(x, train)
        if self.att_bn_out is not None:
            x = self.att_bn_out(x, att_masks, train)
        mask = att_masks[:, None, None, :] if att_masks is not None else None
        for i in range(cfg.N_enc):
            blk = self.enc_self[i]
            k = _split_heads(blk.wk(x), h)
            v = _split_heads(blk.wv(x), h)
            x = self._attn(blk, x, k, v, mask, train)
            x = self._ffn(self.enc_ffn[i], x, train)
        return x

    def _embed_tokens(self, ids, t0, train):
        cfg = self.cfg
        x = jnp.take(self.word_embed.astype(cfg.dtype), ids, axis=0)
        pe = jax.lax.dynamic_slice_in_dim(self.pos_embed, t0, x.shape[-2])
        x = x + pe[None].astype(cfg.dtype) + self.type_embed[0].astype(
            cfg.dtype)
        x = self.embed_ln(x)
        return self._dropout(x, cfg.dropout, train)

    def _embed_tokens_rows(self, it, t_rows, train):
        """single-token embed at per-row positions (staggered groups)."""
        cfg = self.cfg
        x = jnp.take(self.word_embed.astype(cfg.dtype), it[:, None], axis=0)
        x = x + self.pos_embed[t_rows][:, None, :].astype(cfg.dtype) + \
            self.type_embed[0].astype(cfg.dtype)
        x = self.embed_ln(x)
        return self._dropout(x, cfg.dropout, train)

    # -- engine protocol ------------------------------------------------------
    def prepare_feature(self, fc_feats, att_feats, att_masks,
                        train: bool = False):
        memory = self.encode(att_feats, att_masks, train)
        # Decode steps attend the raw memory with the cross K/V projections
        # folded around the attention (transformer._lazy_cross_attend); the
        # per-layer [B, h, M, dk] cross caches are never materialized.
        if self.is_initializing():
            # wk/wv are otherwise applied only by forward_tf; touch them so
            # init creates the full (checkpoint-compatible) param tree
            for i in range(self.cfg.N_dec):
                _ = self.dec_cross[i].wk(memory[:, :1])
                _ = self.dec_cross[i].wv(memory[:, :1])
        return {'memory': memory, 'att_masks': att_masks}

    def init_state(self, batch_size: int):
        cfg = self.cfg
        T = cfg.seq_length + 1
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
        cfg = self.cfg
        h = cfg.num_att_heads
        t_rows = state['t']                     # per-row positions
        T = state['k0'].shape[-2]
        B = it.shape[0]
        t0 = t_rows[0]
        x = self._embed_tokens_rows(it, t_rows, train)
        new_state = dict(state, t=state['t'] + 1)
        if uniform_t:
            self_mask = (jnp.arange(T) <= t0)[None, None, None, :]
        else:
            self_mask = (jnp.arange(T)[None, :] <= t_rows[:, None]
                         )[:, None, None, :]
        rows = jnp.arange(B)

        def _cache_write(cache, new):
            if uniform_t:
                return jax.lax.dynamic_update_slice_in_dim(
                    cache, new, t0, axis=-2)
            return cache.at[rows, :, t_rows, :].set(new[:, :, 0, :])

        if beam_width:
            slot = (rows % beam_width).astype(jnp.int32)
            if uniform_t:
                anc = jax.lax.dynamic_update_slice_in_dim(
                    state['anc'], slot[:, None], t0, axis=1)
                time_mask = jnp.broadcast_to(
                    (jnp.arange(T) <= t0)[None], (B, T))
            else:
                anc = state['anc'].at[rows, t_rows].set(slot)
                time_mask = jnp.arange(T)[None, :] <= t_rows[:, None]
            new_state['anc'] = anc

        # shared cross-attention: feats may carry one memory row per beam
        # block (shape-detected, like the transformer step)
        nb_feats = feats['memory'].shape[0]
        cross_bw = B // nb_feats
        for i in range(cfg.N_dec):
            blk = self.dec_self[i]
            k_new = _split_heads(blk.wk(x), h)
            v_new = _split_heads(blk.wv(x), h)
            k_cache = _cache_write(state['k%d' % i], k_new)
            v_cache = _cache_write(state['v%d' % i], v_new)
            new_state['k%d' % i] = k_cache
            new_state['v%d' % i] = v_cache
            if beam_width:
                x = self._attn_anc(blk, x, k_cache, v_cache, anc, time_mask,
                                   beam_width, train)
            else:
                x = self._attn(blk, x, k_cache, v_cache, self_mask, train)
            cblk = self.dec_cross[i]
            y = _lazy_cross_attend(
                cblk, x, feats['memory'], feats['att_masks'], cross_bw, h,
                lambda p: self._dropout(p, cfg.dropout, train),
                dropped=train and cfg.dropout > 0)
            x = cblk.ln(x + self._dropout(y, cfg.dropout, train))
            x = self._ffn(self.dec_ffn[i], x, train)
        logits = self.generator(x[:, 0]).astype(jnp.float32)
        state = new_state
        if logsoftmax:
            return jax.nn.log_softmax(logits, axis=-1), state
        return logits, state

    def forward_tf(self, fc_feats, att_feats, seq, att_masks,
                   train: bool = False):
        cfg = self.cfg
        h = cfg.num_att_heads
        if seq.ndim == 3:
            seq = seq.reshape(-1, seq.shape[2])
        memory = self.encode(att_feats, att_masks, train)
        # seq_per_img sequences of one image share the encoder memory;
        # cross-attention runs grouped (one K/V row per image)
        spi = seq.shape[0] // memory.shape[0]
        nb = memory.shape[0]
        T = seq.shape[1]
        seq_mask = (seq != cfg.eos_idx) & (seq != cfg.pad_idx)
        seq_mask = seq_mask.at[:, 0].set(True)
        causal = jnp.tril(jnp.ones((T, T), bool))
        tgt_mask = seq_mask[:, None, None, :] & causal[None, None]
        src_mask = (att_masks[:, None, None, :]
                    if att_masks is not None else None)
        x = self._embed_tokens(seq, 0, train)
        for i in range(cfg.N_dec):
            blk = self.dec_self[i]
            k = _split_heads(blk.wk(x), h)
            v = _split_heads(blk.wv(x), h)
            x = self._attn(blk, x, k, v, tgt_mask, train)
            cblk = self.dec_cross[i]
            mk = _split_heads(cblk.wk(memory), h)
            mv = _split_heads(cblk.wv(memory), h)
            if spi > 1:
                q = _split_heads(cblk.wq(x), h)
                y = _merge_heads(_attend_grouped(
                    q.reshape(nb, spi, h, T, -1), mk, mv, att_masks,
                    lambda p: self._dropout(p, cfg.dropout, train)))
                y = self._dropout(cblk.wo(y), cfg.dropout, train)
                x = cblk.ln(x + y)
            else:
                x = self._attn(cblk, x, mk, mv, src_mask, train)
            x = self._ffn(self.dec_ffn[i], x, train)
        logits = self.generator(x).astype(jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1)

    def __call__(self, fc_feats, att_feats, att_masks, it):
        feats = self.prepare_feature(fc_feats, att_feats, att_masks, False)
        state = self.init_state(att_feats.shape[0])
        logprobs, _ = self.step(it, feats, state, False)
        return logprobs
