"""The AttModel harness: shared embeds + pluggable per-step cores.

TPU-native redesign of the reference AttModel family
(``/root/reference/captioning/models/AttModel.py:51-968``).  Instead of a
python time loop over ``core()``, every model exposes a pure step protocol
consumed by the batched ``lax.scan`` decoding engine:

* ``prepare_feature(fc, att, att_masks, train) -> feats`` pytree
* ``init_state(batch) -> state`` pytree (all leaves lead with batch so
  beam reordering is a single ``take`` over every leaf)
* ``step(it, feats, state, train, logsoftmax) -> (logprobs, state)``

The per-element first-step handling of NewFC/LM (reference
AttModel.py:915-940) is expressed with a ``t`` field in the state and a
vectorized select, which also covers diverse-beam staggering.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (Dense, Dropout, Embedding, MLPEmbed, MaskedBatchNorm,
                     additive_attention)

# words banned from preceding EOS (reference AttModel.py:29-30)
BAD_ENDINGS = ['a', 'an', 'the', 'in', 'for', 'at', 'of', 'with', 'before',
               'after', 'on', 'upon', 'near', 'to', 'is', 'are', 'am']


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    caption_model: str
    vocab_size: int
    input_encoding_size: int = 512
    rnn_size: int = 512
    num_layers: int = 1
    drop_prob_lm: float = 0.5
    seq_length: int = 20           # max sample length (max_length opt)
    fc_feat_size: int = 2048
    att_feat_size: int = 2048
    att_hid_size: int = 512
    logit_layers: int = 1
    use_bn: int = 0
    bos_idx: int = 0
    eos_idx: int = 0
    pad_idx: int = 0
    unk_idx: Optional[int] = None
    # transformer family
    N_enc: int = 6
    N_dec: int = 6
    d_model: int = 512
    d_ff: int = 2048
    num_att_heads: int = 8
    dropout: float = 0.1
    # aoa
    refine: int = 1
    refine_aoa: int = 1
    use_ff: int = 0
    mean_feats: int = 1
    use_multi_head: int = 2
    multi_head_scale: int = 1
    ctx_drop: int = 1
    num_heads: int = 8
    dropout_aoa: float = 0.3
    decoder_type: str = 'AoA'
    out_res: int = 0
    # show_tell
    rnn_type: str = 'lstm'
    # TPU kernels
    use_pallas: int = 0
    dtype: Any = jnp.float32


def _resolve_use_pallas(flag) -> int:
    """-1/None = auto: fused kernels on when the backend is TPU (they are
    parity-tested there); off on CPU/GPU, where the jnp twins run."""
    if flag is None or int(flag) < 0:
        import jax
        return int(jax.default_backend() == 'tpu')
    return int(flag)


def config_from_opt(opt, vocab_size: int) -> ModelConfig:
    """Build a ModelConfig from an opts namespace / infos opt."""
    g = lambda k, d: getattr(opt, k, d)
    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[
        g('compute_dtype', 'float32')]
    seq_length = g('max_length', 20) or g('seq_length', 20)
    return ModelConfig(
        caption_model=opt.caption_model,
        vocab_size=vocab_size,
        input_encoding_size=opt.input_encoding_size,
        rnn_size=opt.rnn_size,
        num_layers=opt.num_layers,
        drop_prob_lm=opt.drop_prob_lm,
        seq_length=seq_length,
        fc_feat_size=opt.fc_feat_size,
        att_feat_size=opt.att_feat_size,
        att_hid_size=opt.att_hid_size,
        logit_layers=g('logit_layers', 1),
        use_bn=g('use_bn', 0),
        bos_idx=g('bos_idx', 0), eos_idx=g('eos_idx', 0),
        pad_idx=g('pad_idx', 0), unk_idx=g('unk_idx', None),
        N_enc=g('N_enc', opt.num_layers), N_dec=g('N_dec', opt.num_layers),
        d_model=g('d_model', opt.input_encoding_size),
        d_ff=g('d_ff', opt.rnn_size),
        num_att_heads=g('num_att_heads', 8),
        dropout=g('dropout', 0.1),
        refine=g('refine', 1), refine_aoa=g('refine_aoa', 1),
        use_ff=g('use_ff', 0), mean_feats=g('mean_feats', 1),
        use_multi_head=g('use_multi_head', 2),
        multi_head_scale=g('multi_head_scale', 1),
        ctx_drop=g('ctx_drop', 1),
        num_heads=g('num_heads', 8),
        dropout_aoa=g('dropout_aoa', 0.3),
        decoder_type=g('decoder_type', 'AoA'),
        out_res=g('out_res', 0),
        rnn_type=g('rnn_type', 'lstm'),
        use_pallas=_resolve_use_pallas(g('use_pallas', None)),
        dtype=dtype,
    )


def _uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


# ---------------------------------------------------------------------------
# LSTM cells / cores
# ---------------------------------------------------------------------------

class MaxoutLSTMCell(nn.Module):
    """The custom 5-gate maxout LSTM (reference FCModel.py:13-42)."""
    rnn_size: int
    drop: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt, h, c, train: bool):
        H = self.rnn_size
        s = Dense(5 * H, dtype=self.dtype, name='i2h')(xt) + \
            Dense(5 * H, dtype=self.dtype, name='h2h')(h)
        gates = jax.nn.sigmoid(s[:, :3 * H])
        in_gate, forget_gate, out_gate = (gates[:, :H], gates[:, H:2 * H],
                                          gates[:, 2 * H:3 * H])
        in_transform = jnp.maximum(s[:, 3 * H:4 * H], s[:, 4 * H:5 * H])
        next_c = forget_gate * c + in_gate * in_transform
        next_h = out_gate * jnp.tanh(next_c)
        output = Dropout(self.drop)(next_h, train)
        return output, next_h, next_c


class TorchLSTMCell(nn.Module):
    """Standard torch nn.LSTMCell (gate order i, f, g, o)."""
    rnn_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt, h, c):
        H = self.rnn_size
        init = _uniform_init(1.0 / float(H) ** 0.5)
        s = Dense(4 * H, dtype=self.dtype, name='ih', kernel_init=init,
                  bias_init=init)(xt) + \
            Dense(4 * H, dtype=self.dtype, name='hh', kernel_init=init,
                  bias_init=init)(h)
        i = jax.nn.sigmoid(s[:, :H])
        f = jax.nn.sigmoid(s[:, H:2 * H])
        g = jnp.tanh(s[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(s[:, 3 * H:4 * H])
        next_c = f * c + i * g
        next_h = o * jnp.tanh(next_c)
        return next_h, next_c


class AttentionHead(nn.Module):
    """Additive attention head (reference AttModel.py:719-748).

    With use_pallas the tanh+score+softmax+weighted-sum chain runs as one
    fused VMEM kernel (ops/attention.py); the h2att projection stays an
    MXU matmul either way.
    """
    rnn_size: int
    att_hid_size: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h, att_feats, p_att_feats, att_masks):
        h2att = Dense(self.att_hid_size, dtype=self.dtype, name='h2att')
        alpha_net = Dense(1, dtype=self.dtype, name='alpha_net')
        # the fused kernel expects lane-replicated feats; block-shared beam
        # feats (att rows != h rows) take the jnp path, which handles both
        if self.use_pallas and att_feats.shape[0] == h.shape[0]:
            from ..ops.attention import additive_attention_fused, auto_interpret
            att_h = h2att(h)
            # materialize alpha_net params (same tree as the jnp path, so
            # checkpoints are interchangeable across use_pallas settings)
            _ = alpha_net(jnp.zeros((1, self.att_hid_size), self.dtype))
            p = alpha_net.variables['params']
            w_alpha = p['kernel'][:, 0]
            b_alpha = p['bias'][0]
            mask = att_masks if att_masks is not None else \
                jnp.ones(att_feats.shape[:2], self.dtype)
            return additive_attention_fused(
                att_h, att_feats, p_att_feats, mask,
                w_alpha.astype(self.dtype), b_alpha.astype(self.dtype),
                8, auto_interpret())
        return additive_attention(h, att_feats, p_att_feats, att_masks,
                                  h2att, alpha_net)


class Att2in2Core(nn.Module):
    """SCST att2in cell: attention feeds only the input transform via a2c
    (reference AttModel.py:750-796)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, xt, feats, state, train: bool):
        cfg = self.cfg
        H = cfg.rnn_size
        h_prev = state['h'][:, -1]
        c_prev = state['c'][:, -1]
        att_res = AttentionHead(H, cfg.att_hid_size, cfg.dtype, bool(cfg.use_pallas), name='attention')(
            h_prev, feats['att_feats'], feats['p_att_feats'], feats['att_masks'])
        s = Dense(5 * H, dtype=cfg.dtype, name='i2h')(xt) + \
            Dense(5 * H, dtype=cfg.dtype, name='h2h')(h_prev)
        gates = jax.nn.sigmoid(s[:, :3 * H])
        in_gate, forget_gate, out_gate = (gates[:, :H], gates[:, H:2 * H],
                                          gates[:, 2 * H:3 * H])
        a = Dense(2 * H, dtype=cfg.dtype, name='a2c')(att_res)
        in_transform = s[:, 3 * H:5 * H] + a
        in_transform = jnp.maximum(in_transform[:, :H], in_transform[:, H:])
        next_c = forget_gate * c_prev + in_gate * in_transform
        next_h = out_gate * jnp.tanh(next_c)
        output = Dropout(cfg.drop_prob_lm)(next_h, train)
        state = dict(state, h=next_h[:, None], c=next_c[:, None])
        return output, state


class Att2all2Core(nn.Module):
    """att2all cell: attention feeds all 5H gate inputs via a2h
    (reference AttModel.py:802-841)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, xt, feats, state, train: bool):
        cfg = self.cfg
        H = cfg.rnn_size
        h_prev = state['h'][:, -1]
        c_prev = state['c'][:, -1]
        att_res = AttentionHead(H, cfg.att_hid_size, cfg.dtype, bool(cfg.use_pallas), name='attention')(
            h_prev, feats['att_feats'], feats['p_att_feats'], feats['att_masks'])
        s = Dense(5 * H, dtype=cfg.dtype, name='i2h')(xt) + \
            Dense(5 * H, dtype=cfg.dtype, name='h2h')(h_prev) + \
            Dense(5 * H, dtype=cfg.dtype, name='a2h')(att_res)
        gates = jax.nn.sigmoid(s[:, :3 * H])
        in_gate, forget_gate, out_gate = (gates[:, :H], gates[:, H:2 * H],
                                          gates[:, 2 * H:3 * H])
        in_transform = jnp.maximum(s[:, 3 * H:4 * H], s[:, 4 * H:5 * H])
        next_c = forget_gate * c_prev + in_gate * in_transform
        next_h = out_gate * jnp.tanh(next_c)
        output = Dropout(cfg.drop_prob_lm)(next_h, train)
        state = dict(state, h=next_h[:, None], c=next_c[:, None])
        return output, state


class UpDownCore(nn.Module):
    """Two-layer top-down attention LSTM (reference AttModel.py:615-640)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, xt, feats, state, train: bool):
        cfg = self.cfg
        prev_h_lang = state['h'][:, -1]
        att_in = jnp.concatenate([prev_h_lang, feats['fc_feats'], xt], axis=1)
        h_att, c_att = TorchLSTMCell(cfg.rnn_size, cfg.dtype, name='att_lstm')(
            att_in, state['h'][:, 0], state['c'][:, 0])
        att = AttentionHead(cfg.rnn_size, cfg.att_hid_size, cfg.dtype,
                            bool(cfg.use_pallas), name='attention')(
            h_att, feats['att_feats'], feats['p_att_feats'], feats['att_masks'])
        lang_in = jnp.concatenate([att, h_att], axis=1)
        h_lang, c_lang = TorchLSTMCell(cfg.rnn_size, cfg.dtype, name='lang_lstm')(
            lang_in, state['h'][:, 1], state['c'][:, 1])
        output = Dropout(cfg.drop_prob_lm)(h_lang, train)
        state = dict(state,
                     h=jnp.stack([h_att, h_lang], axis=1),
                     c=jnp.stack([c_att, c_lang], axis=1))
        return output, state


class StackAttCore(nn.Module):
    """3-stack LSTM+attention chain; dense variant adds fusion MLPs
    (reference AttModel.py:650-717)."""
    cfg: ModelConfig
    dense_fusion: bool = False

    @nn.compact
    def __call__(self, xt, feats, state, train: bool):
        cfg = self.cfg
        H = cfg.rnn_size
        att1 = AttentionHead(H, cfg.att_hid_size, cfg.dtype, bool(cfg.use_pallas), name='att1')
        att2 = AttentionHead(H, cfg.att_hid_size, cfg.dtype, bool(cfg.use_pallas), name='att2')

        h0_out, h0, c0 = MaxoutLSTMCell(H, cfg.drop_prob_lm, cfg.dtype,
                                        name='lstm0')(
            jnp.concatenate([xt, feats['fc_feats']], 1),
            state['h'][:, 0], state['c'][:, 0], train)
        att_res_1 = att1(h0_out, feats['att_feats'], feats['p_att_feats'],
                         feats['att_masks'])
        h1_out, h1, c1 = MaxoutLSTMCell(H, cfg.drop_prob_lm, cfg.dtype,
                                        name='lstm1')(
            jnp.concatenate([h0_out, att_res_1], 1),
            state['h'][:, 1], state['c'][:, 1], train)
        att_res_2 = att2(h1_out + Dense(H, dtype=cfg.dtype, name='emb2')(att_res_1),
                         feats['att_feats'], feats['p_att_feats'],
                         feats['att_masks'])
        if self.dense_fusion:
            fused01 = MLPEmbed(H, cfg.drop_prob_lm, cfg.dtype, name='fusion1')(
                jnp.concatenate([h0_out, h1_out], 1), train)
            h2_in = jnp.concatenate([fused01, att_res_2], 1)
        else:
            h2_in = jnp.concatenate([h1_out, att_res_2], 1)
        h2_out, h2, c2 = MaxoutLSTMCell(H, cfg.drop_prob_lm, cfg.dtype,
                                        name='lstm2')(
            h2_in, state['h'][:, 2], state['c'][:, 2], train)
        if self.dense_fusion:
            output = MLPEmbed(H, cfg.drop_prob_lm, cfg.dtype, name='fusion2')(
                jnp.concatenate([h0_out, h1_out, h2_out], 1), train)
        else:
            output = h2_out
        state = dict(state,
                     h=jnp.stack([h0, h1, h2], axis=1),
                     c=jnp.stack([c0, c1, c2], axis=1))
        return output, state


class AdaAttCore(nn.Module):
    """Adaptive attention with visual sentinel (reference AttModel.py:451-613)."""
    cfg: ModelConfig
    use_maxout: bool = False

    @nn.compact
    def __call__(self, xt, feats, state, train: bool):
        cfg = self.cfg
        H, E, A = cfg.rnn_size, cfg.input_encoding_size, cfg.att_hid_size
        L = cfg.num_layers
        n_gate = 5 if self.use_maxout else 4
        img_fc = feats['fc_feats']

        hs, cs = [], []
        fake_region = None
        x = xt
        for layer in range(L):
            prev_h = state['h'][:, layer]
            prev_c = state['c'][:, layer]
            if layer == 0:
                i2h = Dense(n_gate * H, dtype=cfg.dtype, name='w2h')(x) + \
                      Dense(n_gate * H, dtype=cfg.dtype, name='v2h')(img_fc)
            else:
                x = Dropout(cfg.drop_prob_lm)(hs[-1], train)
                i2h = Dense(n_gate * H, dtype=cfg.dtype,
                            name='i2h_%d' % (layer - 1))(x)
            all_sums = i2h + Dense(n_gate * H, dtype=cfg.dtype,
                                   name='h2h_%d' % layer)(prev_h)
            gates = jax.nn.sigmoid(all_sums[:, :3 * H])
            in_gate, forget_gate, out_gate = (gates[:, :H], gates[:, H:2 * H],
                                              gates[:, 2 * H:3 * H])
            if not self.use_maxout:
                in_transform = jnp.tanh(all_sums[:, 3 * H:4 * H])
            else:
                in_transform = jnp.maximum(all_sums[:, 3 * H:4 * H],
                                           all_sums[:, 4 * H:5 * H])
            next_c = forget_gate * prev_c + in_gate * in_transform
            tanh_next_c = jnp.tanh(next_c)
            next_h = out_gate * tanh_next_c
            if layer == L - 1:
                if layer == 0:
                    r_i2h = Dense(H, dtype=cfg.dtype, name='r_w2h')(x) + \
                            Dense(H, dtype=cfg.dtype, name='r_v2h')(img_fc)
                else:
                    r_i2h = Dense(H, dtype=cfg.dtype, name='r_i2h')(x)
                n5 = r_i2h + Dense(H, dtype=cfg.dtype, name='r_h2h')(prev_h)
                fake_region = jax.nn.sigmoid(n5) * tanh_next_c
            cs.append(next_c)
            hs.append(next_h)

        top_h = Dropout(cfg.drop_prob_lm)(hs[-1], train)
        fake_region = Dropout(cfg.drop_prob_lm)(fake_region, train)

        # AdaAtt_attention (reference AttModel.py:539-602)
        conv_feat = feats['att_feats']          # [B, M, H]
        conv_feat_embed = feats['p_att_feats']  # [B, M, A]
        fr = Dense(E, dtype=cfg.dtype, name='fr_linear')(fake_region)
        fr = Dropout(cfg.drop_prob_lm)(nn.relu(fr), train)
        fr_embed = Dense(A, dtype=cfg.dtype, name='fr_embed')(fr)
        h_out_linear = jnp.tanh(Dense(E, dtype=cfg.dtype, name='ho_linear')(top_h))
        h_out_linear = Dropout(cfg.drop_prob_lm)(h_out_linear, train)
        h_out_embed = Dense(A, dtype=cfg.dtype, name='ho_embed')(h_out_linear)

        img_all = jnp.concatenate([fr[:, None, :], conv_feat], 1)
        img_all_embed = jnp.concatenate([fr_embed[:, None, :], conv_feat_embed], 1)
        hA = jnp.tanh(img_all_embed + h_out_embed[:, None, :])
        hA = Dropout(cfg.drop_prob_lm)(hA, train)
        e = Dense(1, dtype=cfg.dtype, name='alpha_net')(hA)[..., 0]
        PI = jax.nn.softmax(e, axis=-1)
        att_masks = feats['att_masks']
        if att_masks is not None:
            m = jnp.concatenate([att_masks[:, :1], att_masks], 1)
            PI = PI * m
            PI = PI / jnp.maximum(PI.sum(-1, keepdims=True), 1e-9)
        visAtt = jnp.einsum('bm,bmh->bh', PI, img_all)
        atten_out = visAtt + h_out_linear
        h = jnp.tanh(Dense(H, dtype=cfg.dtype, name='att2h')(atten_out))
        h = Dropout(cfg.drop_prob_lm)(h, train)
        state = dict(state, h=jnp.stack(hs, axis=1), c=jnp.stack(cs, axis=1))
        return h, state


class ShowTellCore(nn.Module):
    """Stacked torch nn.LSTM/GRU (bias=False) with img-embed first-step
    seeding (reference ShowTellModel.py:13-94).  The reference feeds the
    image embedding as an extra step before <bos>; here the state is
    seeded on the fly like FCCore, which is the same computation."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, xt, feats, state, train: bool):
        cfg = self.cfg
        H = cfg.rnn_size
        L = cfg.num_layers
        n_gate = 4 if cfg.rnn_type == 'lstm' else 3
        init = _uniform_init(1.0 / float(H) ** 0.5)
        ih = [Dense(n_gate * H, use_bias=False, dtype=cfg.dtype,
                    kernel_init=init, name='ih_%d' % l) for l in range(L)]
        hh = [Dense(n_gate * H, use_bias=False, dtype=cfg.dtype,
                    kernel_init=init, name='hh_%d' % l) for l in range(L)]
        inter_drop = [Dropout(cfg.drop_prob_lm) for _ in range(max(L - 1, 0))]
        out_drop = Dropout(cfg.drop_prob_lm)

        def rnn_stack(x0, h_in, c_in, use_dropout):
            hs, cs = [], []
            x = x0
            for layer in range(L):
                s_x = ih[layer](x)
                if cfg.rnn_type == 'lstm':
                    s = s_x + hh[layer](h_in[:, layer])
                    i = jax.nn.sigmoid(s[:, :H])
                    f = jax.nn.sigmoid(s[:, H:2 * H])
                    g = jnp.tanh(s[:, 2 * H:3 * H])
                    o = jax.nn.sigmoid(s[:, 3 * H:])
                    c = f * c_in[:, layer] + i * g
                    hy = o * jnp.tanh(c)
                else:  # gru
                    s_h = hh[layer](h_in[:, layer])
                    r = jax.nn.sigmoid(s_x[:, :H] + s_h[:, :H])
                    z = jax.nn.sigmoid(s_x[:, H:2 * H] + s_h[:, H:2 * H])
                    n = jnp.tanh(s_x[:, 2 * H:] + r * s_h[:, 2 * H:])
                    hy = (1 - z) * n + z * h_in[:, layer]
                    c = c_in[:, layer]
                hs.append(hy)
                cs.append(c)
                x = hy
                if layer < L - 1:
                    x = inter_drop[layer](x, use_dropout)
            return x, jnp.stack(hs, 1), jnp.stack(cs, 1)

        # first-step seeding with the image embedding
        _, h_fc, c_fc = rnn_stack(feats['fc_feats'],
                                  jnp.zeros_like(state['h']),
                                  jnp.zeros_like(state['c']), train)
        is_first = (state['t'] == 0)[:, None, None]
        h_in = jnp.where(is_first, h_fc, state['h'])
        c_in = jnp.where(is_first, c_fc, state['c'])
        top, next_h, next_c = rnn_stack(xt, h_in, c_in, train)
        output = out_drop(top, train)
        state = dict(state, h=next_h, c=next_c)
        return output, state


class FCCore(nn.Module):
    """newfc / fc / language_model core: MaxoutLSTMCell whose state is seeded
    with the image embedding at the first step (reference AttModel.py:904-968,
    FCModel.py:79-115 — feeding the image as a pre-<bos> step is the same
    computation as state seeding)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, xt, feats, state, train: bool):
        cfg = self.cfg
        cell = MaxoutLSTMCell(cfg.rnn_size, cfg.drop_prob_lm, cfg.dtype,
                              name='lstm')
        zeros_h = jnp.zeros_like(state['h'][:, -1])
        zeros_c = jnp.zeros_like(state['c'][:, -1])
        _, h_fc, c_fc = cell(feats['fc_feats'], zeros_h, zeros_c, train)
        is_first = (state['t'] == 0)[:, None]
        h_in = jnp.where(is_first, h_fc, state['h'][:, -1])
        c_in = jnp.where(is_first, c_fc, state['c'][:, -1])
        output, next_h, next_c = cell(xt, h_in, c_in, train)
        state = dict(state, h=next_h[:, None], c=next_c[:, None])
        return output, state


# ---------------------------------------------------------------------------
# The harness
# ---------------------------------------------------------------------------

def state_num_layers(cfg: ModelConfig) -> int:
    if cfg.caption_model in ('updown', 'topdown', 'aoa'):
        return 2
    if cfg.caption_model in ('stackatt', 'denseatt'):
        return 3
    if cfg.caption_model in ('adaatt', 'adaattmo', 'show_tell'):
        return cfg.num_layers
    return 1


def make_core(cfg: ModelConfig, name: str = 'core') -> nn.Module:
    m = cfg.caption_model
    if m == 'att2in' or m == 'att2in2':
        return Att2in2Core(cfg, name=name)
    if m == 'att2all2':
        return Att2all2Core(cfg, name=name)
    if m in ('updown', 'topdown'):
        return UpDownCore(cfg, name=name)
    if m == 'stackatt':
        return StackAttCore(cfg, name=name)
    if m == 'denseatt':
        return StackAttCore(cfg, dense_fusion=True, name=name)
    if m == 'adaatt':
        return AdaAttCore(cfg, name=name)
    if m == 'adaattmo':
        return AdaAttCore(cfg, use_maxout=True, name=name)
    if m in ('newfc', 'language_model', 'fc'):
        return FCCore(cfg, name=name)
    if m == 'show_tell':
        return ShowTellCore(cfg, name=name)
    raise KeyError(m)


class AttCaptioner(nn.Module):
    """Generic attention captioner harness (reference AttModel.py:51-176)."""
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        m = cfg.caption_model
        V1 = cfg.vocab_size + 1
        legacy = m in ('fc', 'show_tell')  # U(+-0.1) embed/logit inits
        # word embedding
        if m == 'att2in' or legacy:
            self.embed = Embedding(V1, cfg.input_encoding_size, cfg.dtype,
                                   embedding_init=_uniform_init(0.1))
            self._embed_plain = True
        elif m in ('newfc', 'language_model'):
            self.embed = Embedding(V1, cfg.input_encoding_size, cfg.dtype)
            self._embed_plain = True
        else:
            self.embed = Embedding(V1, cfg.input_encoding_size, cfg.dtype)
            self._embed_plain = False
        # fc embedding
        if m in ('att2in', 'att2in2', 'att2all2', 'language_model'):
            self.fc_embed = None
        elif m in ('newfc', 'fc', 'show_tell'):
            self.fc_embed = Dense(cfg.input_encoding_size, dtype=cfg.dtype)
        else:
            self.fc_embed = MLPEmbed(cfg.rnn_size, cfg.drop_prob_lm, cfg.dtype)
        # att embedding
        if m in ('att2in', 'newfc', 'language_model', 'fc', 'show_tell'):
            self.att_embed = None
            self.att_bn_in = self.att_bn_out = None
        else:
            self.att_bn_in = MaskedBatchNorm() if cfg.use_bn else None
            self.att_embed = MLPEmbed(cfg.rnn_size, cfg.drop_prob_lm, cfg.dtype)
            self.att_bn_out = MaskedBatchNorm() if cfg.use_bn == 2 else None
        # ctx2att key projection
        if m in ('newfc', 'language_model', 'fc', 'show_tell'):
            self.ctx2att = None
        else:
            self.ctx2att = Dense(cfg.att_hid_size, dtype=cfg.dtype)
        # logit
        if m == 'att2in' or legacy:
            self.logit = Dense(V1, dtype=cfg.dtype,
                               kernel_init=_uniform_init(0.1),
                               bias_init=nn.initializers.zeros)
            self.logit_hidden = ()
        else:
            self.logit_hidden = tuple(
                Dense(cfg.rnn_size, dtype=cfg.dtype)
                for _ in range(cfg.logit_layers - 1))
            self.logit = Dense(V1, dtype=cfg.dtype)
        self.core = make_core(cfg)

    # -- helpers ---------------------------------------------------------
    def _dropout(self, x, rate, train: bool):
        if not train or rate == 0.0:
            return x
        rng = self.make_rng('dropout')
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    def embed_word(self, it, train: bool):
        x = self.embed(it)
        if not self._embed_plain:
            x = nn.relu(x)
            x = self._dropout(x, self.cfg.drop_prob_lm, train)
        return x

    def apply_logit(self, h, train: bool = False):
        # reference builds Linear->ReLU->Dropout(0.5) per hidden logit layer
        # (AttModel.py:86-92); the dropout fires in train mode
        x = h
        for lin in self.logit_hidden:
            x = nn.relu(lin(x))
            x = self._dropout(x, 0.5, train)
        return self.logit(x)

    # -- public protocol ---------------------------------------------------
    def prepare_feature(self, fc_feats, att_feats, att_masks,
                        train: bool = False):
        """reference AttModel.py:114-124 (+NewFC/LM overrides :942-968)."""
        cfg = self.cfg
        m = cfg.caption_model
        if m == 'language_model':
            p_fc = jnp.zeros((fc_feats.shape[0], cfg.input_encoding_size),
                             cfg.dtype)
            return {'fc_feats': p_fc, 'att_feats': None,
                    'p_att_feats': None, 'att_masks': None}
        p_fc = self.fc_embed(fc_feats, train) if isinstance(self.fc_embed, MLPEmbed) \
            else (self.fc_embed(fc_feats) if self.fc_embed is not None else fc_feats)
        if self.att_embed is None:
            p_att = att_feats
        else:
            x = att_feats
            if self.att_bn_in is not None:
                x = self.att_bn_in(x, att_masks, train)
            x = self.att_embed(x, train)
            if self.att_bn_out is not None:
                x = self.att_bn_out(x, att_masks, train)
            p_att = x
        pp_att = self.ctx2att(p_att) if self.ctx2att is not None else p_att
        return {'fc_feats': p_fc, 'att_feats': p_att,
                'p_att_feats': pp_att, 'att_masks': att_masks}

    def init_state(self, batch_size: int):
        cfg = self.cfg
        L = state_num_layers(cfg)
        return {
            't': jnp.zeros((batch_size,), jnp.int32),
            'h': jnp.zeros((batch_size, L, cfg.rnn_size), cfg.dtype),
            'c': jnp.zeros((batch_size, L, cfg.rnn_size), cfg.dtype),
        }

    def step(self, it, feats, state, train: bool = False,
             logsoftmax: bool = True, uniform_t: bool = False,
             beam_width: int = 0):
        """get_logprobs_state (reference AttModel.py:166-176).

        ``uniform_t`` is a layout hint for KV-cached models; RNN state is
        positionless so it is ignored here.

        Beam search may pass block-shared feats (one att row per beam
        block, engine shared_beam_feats): the attention head broadcasts
        over the block; only fc_feats — consumed per row by the cores — is
        expanded here (it is small)."""
        af = feats.get('att_feats')
        fc = feats.get('fc_feats')
        N = it.shape[0]
        if af is not None and af.shape[0] != N and fc is not None \
                and fc.shape[0] != N:
            feats = dict(feats, fc_feats=jnp.repeat(fc, N // fc.shape[0],
                                                    axis=0))
        xt = self.embed_word(it, train)
        output, state = self.core(xt, feats, state, train)
        logits = self.apply_logit(output, train)
        state = dict(state, t=state['t'] + 1)
        if logsoftmax:
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), state
        return logits.astype(jnp.float32), state

    def __call__(self, fc_feats, att_feats, att_masks, it):
        """Init-only entry: touches every parameter once."""
        feats = self.prepare_feature(fc_feats, att_feats, att_masks, False)
        state = self.init_state(fc_feats.shape[0])
        logprobs, state = self.step(it, feats, state, False)
        return logprobs
