"""Meshed-Memory Transformer captioner (Cornia et al., arXiv:1912.08226).

The reference wraps an external pip package
(``/root/reference/captioning/models/M2Transformer.py:25-42``); this is a
native flax implementation of the architecture exposing the engine step
protocol:

* **Memory-augmented encoder**: each self-attention layer appends ``m``
  learned memory slots to keys and values (ScaledDotProductAttentionMemory
  with m=40 in the reference wrapper; keys scaled by sqrt(d), values by
  sqrt(m) per the paper).
* **Meshed decoder**: every decoder layer cross-attends to EVERY encoder
  layer's output; the contributions are combined with learned sigmoid
  gates alpha_i = sigma(W[x; enc_att_i] + b) and summed scaled by
  1/sqrt(N_enc).
* Post-LN residual blocks with relu FFN, learned+sinusoidal position
  handling per the original code (sinusoidal PE like the base
  transformer).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .harness import ModelConfig
from .layers import Dense, MaskedBatchNorm
from .transformer import (_attend, _attend_beam, _lazy_cross_attend,
                          _merge_heads, _split_heads)

M2_MEMORY_SLOTS = 40


class M2LayerNorm(nn.Module):
    eps: float = 1e-5

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


class M2Attn(nn.Module):
    d_model: int
    memory: int = 0   # memory slots appended to K/V (encoder self-attn)
    dtype: Any = jnp.float32

    def setup(self):
        D = self.d_model
        self.wq = Dense(D, dtype=self.dtype)
        self.wk = Dense(D, dtype=self.dtype)
        self.wv = Dense(D, dtype=self.dtype)
        self.wo = Dense(D, dtype=self.dtype)
        self.ln = M2LayerNorm()
        if self.memory > 0:
            init = nn.initializers.normal(stddev=1.0 / np.sqrt(D))
            self.mem_k = self.param('mem_k', init, (self.memory, D))
            init_v = nn.initializers.normal(
                stddev=1.0 / np.sqrt(self.memory))
            self.mem_v = self.param('mem_v', init_v, (self.memory, D))


class M2Captioner(nn.Module):
    """M2 transformer exposing the engine step protocol."""
    cfg: ModelConfig
    SUPPORTS_BEAM_ANCESTRY = True
    # step() accepts block-shared cross-attention feats (one row per beam
    # block) — see transformer._attend_shared
    SUPPORTS_SHARED_BEAM_FEATS = True

    def setup(self):
        cfg = self.cfg
        D = cfg.d_model
        self.att_bn_in = MaskedBatchNorm() if cfg.use_bn else None
        # MAEncoder's own visual embed (fc + relu + dropout + LN)
        self.vis_embed = Dense(D, dtype=cfg.dtype)
        self.vis_ln = M2LayerNorm()

        self.enc_self = tuple(M2Attn(D, M2_MEMORY_SLOTS, cfg.dtype)
                              for _ in range(cfg.N_enc))
        self.enc_ff1 = tuple(Dense(cfg.d_ff, dtype=cfg.dtype)
                             for _ in range(cfg.N_enc))
        self.enc_ff2 = tuple(Dense(D, dtype=cfg.dtype)
                             for _ in range(cfg.N_enc))
        self.enc_ffln = tuple(M2LayerNorm() for _ in range(cfg.N_enc))

        self.dec_self = tuple(M2Attn(D, 0, cfg.dtype)
                              for _ in range(cfg.N_dec))
        # one cross-attention per (decoder layer); shared over enc levels
        self.dec_cross = tuple(M2Attn(D, 0, cfg.dtype)
                               for _ in range(cfg.N_dec))
        # meshed gates: alpha_i = sigmoid(W[x; enc_att_i])
        self.dec_gates = tuple(
            tuple(Dense(D, dtype=cfg.dtype) for _ in range(cfg.N_enc))
            for _ in range(cfg.N_dec))
        self.dec_ff1 = tuple(Dense(cfg.d_ff, dtype=cfg.dtype)
                             for _ in range(cfg.N_dec))
        self.dec_ff2 = tuple(Dense(D, dtype=cfg.dtype)
                             for _ in range(cfg.N_dec))
        self.dec_ffln = tuple(M2LayerNorm() for _ in range(cfg.N_dec))

        init = nn.initializers.normal(stddev=0.02)
        self.word_embed = self.param('word_embed', init,
                                     (cfg.vocab_size + 1, D))
        max_len = max(cfg.seq_length + 4, 64)
        pe = np.zeros((max_len, D), np.float32)
        pos = np.arange(max_len)[:, None].astype(np.float32)
        div = np.exp(np.arange(0, D, 2).astype(np.float32) *
                     -(np.log(10000.0) / D))
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        self.pe = jnp.asarray(pe)
        self.generator = Dense(cfg.vocab_size + 1, dtype=cfg.dtype,
                               kernel_init=nn.initializers.xavier_uniform())

    def _dropout(self, x, rate, train: bool):
        if not train or rate == 0.0:
            return x
        rng = self.make_rng('dropout')
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    def _mha(self, blk: M2Attn, q_in, kv_in, mask, train,
             kv_cached=None):
        """post-LN residual attention; memory slots appended when set."""
        cfg = self.cfg
        h = cfg.num_att_heads
        D = cfg.d_model
        q = _split_heads(blk.wq(q_in), h)
        if kv_cached is not None:
            k, v = kv_cached
        else:
            k_lin = blk.wk(kv_in)
            v_lin = blk.wv(kv_in)
            if blk.memory > 0:
                B = kv_in.shape[0]
                mk = jnp.broadcast_to(
                    (blk.mem_k * np.sqrt(D)).astype(k_lin.dtype)[None],
                    (B, blk.memory, D))
                mv = jnp.broadcast_to(
                    (blk.mem_v * np.sqrt(blk.memory)).astype(v_lin.dtype)[None],
                    (B, blk.memory, D))
                k_lin = jnp.concatenate([k_lin, mk], axis=1)
                v_lin = jnp.concatenate([v_lin, mv], axis=1)
                if mask is not None:
                    ones = jnp.ones(mask.shape[:-1] + (blk.memory,),
                                    mask.dtype)
                    mask = jnp.concatenate([mask, ones], axis=-1)
            k = _split_heads(k_lin, h)
            v = _split_heads(v_lin, h)
        x = _merge_heads(_attend(q, k, v, mask,
                                 lambda p: self._dropout(p, cfg.dropout,
                                                         train)))
        x = self._dropout(blk.wo(x), cfg.dropout, train)
        return blk.ln(q_in + x)

    def _ffn(self, i_ff1, i_ff2, i_ln, x, train):
        y = jax.nn.relu(i_ff1(x))
        y = self._dropout(i_ff2(self._dropout(y, self.cfg.dropout, train)),
                          self.cfg.dropout, train)
        return i_ln(x + y)

    def encode(self, att_feats, att_masks, train: bool = False):
        """Memory-augmented encoder; returns ALL layer outputs
        [N_enc, B, M, D] (the meshed decoder consumes every level)."""
        cfg = self.cfg
        x = att_feats
        if self.att_bn_in is not None:
            x = self.att_bn_in(x, att_masks, train)
        x = jax.nn.relu(self.vis_embed(x))
        x = self.vis_ln(self._dropout(x, cfg.dropout, train))
        mask = att_masks[:, None, None, :] if att_masks is not None else None
        outs = []
        for i in range(cfg.N_enc):
            x = self._mha(self.enc_self[i], x, x, mask, train)
            x = self._ffn(self.enc_ff1[i], self.enc_ff2[i],
                          self.enc_ffln[i], x, train)
            outs.append(x)
        return jnp.stack(outs, axis=1)  # [B, E, M, D] (batch-first)

    # -- engine protocol ------------------------------------------------------
    def prepare_feature(self, fc_feats, att_feats, att_masks,
                        train: bool = False):
        levels = self.encode(att_feats, att_masks, train)  # [B, E, M, D]
        # Decode steps attend the raw per-level memories with the cross K/V
        # projections folded around the attention
        # (transformer._lazy_cross_attend); the [B, Nd, Ne, h, M, dk]
        # pre-projected cross tables are never materialized.  forward_tf
        # (multi-token queries, where lazy scores cost h-times the FLOPs)
        # materializes its own per-layer K/V from ``levels``.
        if self.is_initializing():
            # wk/wv are otherwise applied only by forward_tf; touch them so
            # init creates the full (checkpoint-compatible) param tree
            for i in range(self.cfg.N_dec):
                _ = self.dec_cross[i].wk(levels[:, 0, :1])
                _ = self.dec_cross[i].wv(levels[:, 0, :1])
        return {'levels': levels, 'att_masks': att_masks}

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

    def _decoder_layer(self, i, x, self_k, self_v, self_mask, feats,
                       src_mask, train, anc_ctx=None):
        cfg = self.cfg
        h = cfg.num_att_heads
        blk = self.dec_self[i]
        if anc_ctx is not None:
            # beam-ancestry self-attention (see transformer._attend_beam)
            anc, time_mask, bw = anc_ctx
            q0 = _split_heads(blk.wq(x), h)
            y = _merge_heads(_attend_beam(
                q0, self_k, self_v, anc, time_mask, bw,
                lambda p: self._dropout(p, cfg.dropout, train)))
            y = self._dropout(blk.wo(y), cfg.dropout, train)
            x = blk.ln(x + y)
        else:
            x = self._mha(blk, x, None, self_mask, train,
                          kv_cached=(self_k, self_v))
        # meshed cross attention over every encoder level; feats may carry
        # one row per beam block (shape-detected, see transformer step)
        cblk = self.dec_cross[i]
        B = x.shape[0]
        lazy = 'levels' in feats        # single-token step path
        total = jnp.zeros_like(x)
        if lazy:
            nb_feats = feats['levels'].shape[0]
            cross_bw = B // nb_feats
        else:                           # forward_tf: materialized K/V
            q = _split_heads(cblk.wq(x), h)
        for e in range(cfg.N_enc):
            if lazy:
                att = _lazy_cross_attend(
                    cblk, x, feats['levels'][:, e], feats['att_masks'],
                    cross_bw, h,
                    lambda p: self._dropout(p, cfg.dropout, train),
                    dropped=train and cfg.dropout > 0)
            else:
                k, v = feats['mem_k'][:, i, e], feats['mem_v'][:, i, e]
                att = cblk.wo(_merge_heads(_attend(
                    q, k, v, src_mask,
                    lambda p: self._dropout(p, cfg.dropout, train))))
            att = self._dropout(att, cfg.dropout, train)
            gate = jax.nn.sigmoid(self.dec_gates[i][e](
                jnp.concatenate([x, att], axis=-1)))
            total = total + gate * att
        total = total / jnp.sqrt(jnp.asarray(cfg.N_enc, total.dtype))
        x = cblk.ln(x + total)
        return self._ffn(self.dec_ff1[i], self.dec_ff2[i],
                         self.dec_ffln[i], x, train)

    def _embed_tokens(self, ids, t0, train):
        cfg = self.cfg
        x = jnp.take(self.word_embed.astype(cfg.dtype), ids, axis=0)
        x = x * jnp.sqrt(jnp.asarray(cfg.d_model, cfg.dtype))
        pe = jax.lax.dynamic_slice_in_dim(self.pe, t0, x.shape[-2])
        return x + pe[None].astype(cfg.dtype)

    def _embed_tokens_rows(self, it, t_rows, train):
        """single-token embed at per-row positions (staggered groups)."""
        cfg = self.cfg
        x = jnp.take(self.word_embed.astype(cfg.dtype), it[:, None], axis=0)
        x = x * jnp.sqrt(jnp.asarray(cfg.d_model, cfg.dtype))
        return x + self.pe[t_rows][:, None, :].astype(cfg.dtype)

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

        anc_ctx = None
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
            anc_ctx = (anc, time_mask, beam_width)

        src_mask = (feats['att_masks'][:, None, None, :]
                    if feats['att_masks'] is not None else None)
        for i in range(cfg.N_dec):
            blk = self.dec_self[i]
            k_new = _split_heads(blk.wk(x), h)
            v_new = _split_heads(blk.wv(x), h)
            k_cache = _cache_write(state['k%d' % i], k_new)
            v_cache = _cache_write(state['v%d' % i], v_new)
            new_state['k%d' % i] = k_cache
            new_state['v%d' % i] = v_cache
            x = self._decoder_layer(i, x, k_cache, v_cache, self_mask,
                                    feats, src_mask, train, anc_ctx=anc_ctx)
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
        levels = self.encode(att_feats, att_masks, train)
        # multi-token queries: pre-project cross K/V per decoder layer per
        # encoder level (lazy attention would cost h-times the score FLOPs);
        # project BEFORE the seq_per_img repeat so each image is projected
        # once
        mem_k, mem_v = [], []
        for i in range(cfg.N_dec):
            blk = self.dec_cross[i]
            mem_k.append(jnp.stack(
                [_split_heads(blk.wk(levels[:, e]), h)
                 for e in range(cfg.N_enc)], 1))     # [B, Ne, h, M, dk]
            mem_v.append(jnp.stack(
                [_split_heads(blk.wv(levels[:, e]), h)
                 for e in range(cfg.N_enc)], 1))
        feats = {'mem_k': jnp.stack(mem_k, 1),       # [B, Nd, Ne, h, M, dk]
                 'mem_v': jnp.stack(mem_v, 1),
                 'att_masks': att_masks}
        spi = seq.shape[0] // att_feats.shape[0]
        if spi > 1:  # everything in feats is batch-first
            feats = jax.tree.map(
                lambda x: None if x is None else jnp.repeat(x, spi, axis=0),
                feats)
        T = seq.shape[1]
        seq_mask = (seq != cfg.eos_idx) & (seq != cfg.pad_idx)
        seq_mask = seq_mask.at[:, 0].set(True)
        causal = jnp.tril(jnp.ones((T, T), bool))
        tgt_mask = seq_mask[:, None, None, :] & causal[None, None]
        src_mask = (feats['att_masks'][:, None, None, :]
                    if feats['att_masks'] is not None else None)
        x = self._embed_tokens(seq, 0, train)
        for i in range(cfg.N_dec):
            blk = self.dec_self[i]
            k = _split_heads(blk.wk(x), h)
            v = _split_heads(blk.wv(x), h)
            x = self._decoder_layer(i, x, k, v, tgt_mask, feats, src_mask,
                                    train)
        logits = self.generator(x).astype(jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1)

    def __call__(self, fc_feats, att_feats, att_masks, it):
        feats = self.prepare_feature(fc_feats, att_feats, att_masks, False)
        state = self.init_state(att_feats.shape[0])
        logprobs, _ = self.step(it, feats, state, False)
        return logprobs
