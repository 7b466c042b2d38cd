"""Attention-on-Attention captioner (AoANet).

TPU-native rebuild of ``/root/reference/captioning/models/AoAModel.py``:
multi-headed dot attention with a GLU AoA gate (:17-98), a 6-layer refiner
over the embedded att features (:100-126), and an LSTM+AoA decoder core
whose context vector rides in state slot 1 (:128-186).  Mean-pooled
refined features replace fc (:207-226).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .harness import ModelConfig, TorchLSTMCell
from .layers import Dense, Dropout, Embedding, MaskedBatchNorm, MLPEmbed
from .transformer import (RefLayerNorm, _attend, _attend_shared,
                          _merge_heads, _split_heads)


class MultiHeadedDotAttention(nn.Module):
    """reference AoAModel.py:17-98."""
    h: int
    d_model: int
    dropout: float = 0.1
    scale: int = 1
    project_k_v: int = 1
    use_output_layer: int = 1
    do_aoa: int = 0
    norm_q: int = 0
    dropout_aoa: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, value, key, mask, train: bool):
        d_scaled = self.d_model * self.scale
        # block-shared beam feats: one key/value row may serve
        # query_rows // kv_rows consecutive query rows (see
        # transformer._attend_shared); only the single-query decoder path
        # hits this (raw 2-D mask is consumed by the shared attend)
        shared_kv = value.shape[0] != query.shape[0]
        raw_mask = mask
        if mask is not None and not shared_kv:
            if mask.ndim == 2:
                mask = mask[:, None, :]
            mask = mask[:, None]  # head dim
        single_query = query.ndim == 2
        if single_query:
            query = query[:, None, :]

        if self.norm_q:
            query = RefLayerNorm(name='norm')(query)

        q = _split_heads(Dense(d_scaled, dtype=self.dtype, name='q')(query),
                         self.h)
        if self.project_k_v:
            k = _split_heads(Dense(d_scaled, dtype=self.dtype, name='k')(key),
                             self.h)
            v = _split_heads(Dense(d_scaled, dtype=self.dtype, name='v')(value),
                             self.h)
        else:
            k = _split_heads(key, self.h)
            v = _split_heads(value, self.h)

        drop = Dropout(self.dropout)
        if shared_kv:
            assert single_query, 'shared K/V requires single-query decode'
            nb = k.shape[0]
            bw = q.shape[0] // nb
            x = _merge_heads(_attend_shared(
                q.reshape(nb, bw, self.h, -1), k, v, raw_mask,
                lambda p: drop(p, train)))
        else:
            x = _merge_heads(_attend(q, k, v, mask, lambda p: drop(p, train)))

        if self.do_aoa:
            aoa_in = jnp.concatenate([x, query], -1)
            aoa_in = Dropout(self.dropout_aoa)(aoa_in, train)
            g = Dense(2 * self.d_model, dtype=self.dtype, name='aoa')(aoa_in)
            # GLU: first half gated by sigmoid of second half
            x = g[..., :self.d_model] * jax.nn.sigmoid(g[..., self.d_model:])
        elif self.use_output_layer:
            x = Dense(self.d_model, dtype=self.dtype, name='out')(x)

        if single_query:
            x = x[:, 0]
        return x


class AoARefiner(nn.Module):
    """6-layer self-attention refiner (reference AoAModel.py:100-126)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, mask, train: bool):
        cfg = self.cfg
        for i in range(6):
            y = RefLayerNorm(name='norm1_%d' % i)(x)
            y = MultiHeadedDotAttention(
                cfg.num_heads, cfg.rnn_size, dropout=0.1,
                scale=cfg.multi_head_scale, project_k_v=1,
                do_aoa=cfg.refine_aoa, norm_q=0, dropout_aoa=cfg.dropout_aoa,
                dtype=cfg.dtype, name='attn_%d' % i)(y, y, y, mask, train)
            x = x + Dropout(0.1)(y, train)
            if cfg.use_ff:
                y = RefLayerNorm(name='norm2_%d' % i)(x)
                y = Dense(2048, dtype=cfg.dtype, name='ff1_%d' % i)(y)
                y = Dropout(0.1)(nn.relu(y), train)
                y = Dense(cfg.rnn_size, dtype=cfg.dtype, name='ff2_%d' % i)(y)
                x = x + Dropout(0.1)(y, train)
        return RefLayerNorm(name='norm_out')(x)


class AoACaptioner(nn.Module):
    """AoANet exposing the engine step protocol."""
    cfg: ModelConfig
    # step() accepts block-shared attention feats (one att row per beam
    # block): MultiHeadedDotAttention / AttentionHead broadcast over the
    # block; fc_feats (mean feats) is expanded per row in step()
    SUPPORTS_SHARED_BEAM_FEATS = True

    def setup(self):
        cfg = self.cfg
        V1 = cfg.vocab_size + 1
        self.embed = Embedding(V1, cfg.input_encoding_size, cfg.dtype)
        self.att_bn_in = MaskedBatchNorm() if cfg.use_bn else None
        self.att_embed = MLPEmbed(cfg.rnn_size, cfg.drop_prob_lm, cfg.dtype)
        self.att_bn_out = MaskedBatchNorm() if cfg.use_bn == 2 else None
        if cfg.use_multi_head == 2:
            self.ctx2att = Dense(2 * cfg.multi_head_scale * cfg.rnn_size,
                                 dtype=cfg.dtype)
        else:
            self.ctx2att = Dense(cfg.att_hid_size, dtype=cfg.dtype)
        if not cfg.mean_feats:
            self.fc_embed = MLPEmbed(cfg.rnn_size, cfg.drop_prob_lm, cfg.dtype)
        self.refiner = AoARefiner(cfg) if cfg.refine else None
        self.logit = Dense(V1, dtype=cfg.dtype)

        self.att_lstm = TorchLSTMCell(cfg.rnn_size, cfg.dtype)
        if cfg.use_multi_head == 2:
            self.attention = MultiHeadedDotAttention(
                cfg.num_heads, cfg.rnn_size, dropout=0.1,
                scale=cfg.multi_head_scale, project_k_v=0, use_output_layer=0,
                do_aoa=0, norm_q=1, dtype=cfg.dtype)
        else:
            from .harness import AttentionHead
            self.attention = AttentionHead(cfg.rnn_size, cfg.att_hid_size,
                                           cfg.dtype)
        D = cfg.rnn_size
        if cfg.decoder_type == 'AoA':
            self.att2ctx = Dense(2 * D, dtype=cfg.dtype)
        elif cfg.decoder_type == 'LSTM':
            self.att2ctx_lstm = TorchLSTMCell(D, cfg.dtype)
        else:
            self.att2ctx = Dense(D, dtype=cfg.dtype)

    def _dropout(self, x, rate, train: bool):
        if not train or rate == 0.0:
            return x
        rng = self.make_rng('dropout')
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    def prepare_feature(self, fc_feats, att_feats, att_masks,
                        train: bool = False):
        """reference AoAModel._prepare_feature (:207-226)."""
        cfg = self.cfg
        x = att_feats
        if self.att_bn_in is not None:
            x = self.att_bn_in(x, att_masks, train)
        x = self.att_embed(x, train)
        if self.att_bn_out is not None:
            x = self.att_bn_out(x, att_masks, train)
        if self.refiner is not None:
            x = self.refiner(x, att_masks, train)
        if cfg.mean_feats:
            if att_masks is None:
                mean_feats = x.mean(axis=1)
            else:
                m = att_masks[..., None]
                mean_feats = (x * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
        else:
            mean_feats = self.fc_embed(fc_feats, train)
        p_att = self.ctx2att(x)
        return {'fc_feats': mean_feats, 'att_feats': x,
                'p_att_feats': p_att, 'att_masks': att_masks}

    def init_state(self, batch_size: int):
        cfg = self.cfg
        return {
            't': jnp.zeros((batch_size,), jnp.int32),
            'h': jnp.zeros((batch_size, 2, cfg.rnn_size), cfg.dtype),
            'c': jnp.zeros((batch_size, 2, cfg.rnn_size), cfg.dtype),
        }

    def step(self, it, feats, state, train: bool = False,
             logsoftmax: bool = True, uniform_t: bool = False,
             beam_width: int = 0):
        """AoA_Decoder_Core (reference AoAModel.py:163-186).

        ``uniform_t`` is a layout hint for KV-cached models; ignored."""
        cfg = self.cfg
        D = cfg.rnn_size
        # block-shared beam feats: expand only the per-row mean feats
        af = feats.get('att_feats')
        fcm = feats.get('fc_feats')
        if af is not None and af.shape[0] != it.shape[0] and \
                fcm is not None and fcm.shape[0] != it.shape[0]:
            feats = dict(feats, fc_feats=jnp.repeat(
                fcm, it.shape[0] // fcm.shape[0], axis=0))
        xt = self.embed(it)
        xt = nn.relu(xt)
        xt = self._dropout(xt, cfg.drop_prob_lm, train)

        prev_ctx = state['h'][:, 1]
        ctx_in = feats['fc_feats'] + (
            self._dropout(prev_ctx, cfg.drop_prob_lm, train)
            if cfg.ctx_drop else prev_ctx)
        h_att, c_att = self.att_lstm(
            jnp.concatenate([xt, ctx_in], 1), state['h'][:, 0], state['c'][:, 0])

        if cfg.use_multi_head == 2:
            p = feats['p_att_feats']
            half = cfg.multi_head_scale * D
            att = self.attention(h_att, p[..., :half], p[..., half:],
                                 feats['att_masks'], train)
        else:
            att = self.attention(h_att, feats['att_feats'],
                                 feats['p_att_feats'], feats['att_masks'])

        ctx_input = jnp.concatenate([att, h_att], 1)
        if cfg.decoder_type == 'LSTM':
            output, c_logic = self.att2ctx_lstm(ctx_input, state['h'][:, 1],
                                                state['c'][:, 1])
            new_c1 = c_logic
        elif cfg.decoder_type == 'AoA':
            g = self.att2ctx(ctx_input)
            output = g[..., :D] * jax.nn.sigmoid(g[..., D:])
            new_c1 = state['c'][:, 1]
        else:
            output = nn.relu(self.att2ctx(ctx_input))
            new_c1 = state['c'][:, 1]

        ctx_out = output  # state slot 1 stores the pre-residual context
        if cfg.out_res:
            output = output + h_att
        out_dropped = self._dropout(output, cfg.drop_prob_lm, train)
        logits = self.logit(out_dropped).astype(jnp.float32)
        state = dict(state,
                     t=state['t'] + 1,
                     h=jnp.stack([h_att, ctx_out], 1),
                     c=jnp.stack([c_att, new_c1], 1))
        if logsoftmax:
            return jax.nn.log_softmax(logits, axis=-1), state
        return logits, state

    def __call__(self, fc_feats, att_feats, att_masks, it):
        feats = self.prepare_feature(fc_feats, att_feats, att_masks, False)
        state = self.init_state(fc_feats.shape[0])
        logprobs, _ = self.step(it, feats, state, False)
        return logprobs
