"""Shared building blocks with PyTorch-default initializers.

The reference relies on torch's default inits (Linear: kaiming-uniform with
a=sqrt(5) == U(+-1/sqrt(fan_in)) for both kernel and bias; Embedding:
N(0,1)); matching them keeps training dynamics comparable.  All blocks are
flax.linen modules; compute dtype is configurable for bf16 MXU execution
while params stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_linear_init(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)) — torch nn.Linear default for the WEIGHT (2-D
    kernels only; a 1-D bias cannot know its layer's fan_in from its own
    shape — use ``_bias_init_for(in_features)`` for biases)."""
    assert len(shape) > 1, 'bias init needs _bias_init_for(fan_in)'
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Dense(nn.Module):
    """nn.Linear equivalent with torch default init."""
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_linear_init
        kernel = self.param('kernel', kinit, (in_features, self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            binit = self.bias_init or _bias_init_for(in_features)
            bias = self.param('bias', binit, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Embedding(nn.Module):
    """nn.Embedding equivalent (default N(0,1) init like torch)."""
    num_embeddings: int
    features: int
    dtype: Dtype = jnp.float32
    embedding_init: Callable = nn.initializers.normal(stddev=1.0)

    @nn.compact
    def __call__(self, ids):
        table = self.param('embedding', self.embedding_init,
                           (self.num_embeddings, self.features))
        return jnp.take(table.astype(self.dtype), ids, axis=0)


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng('dropout')
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class MLPEmbed(nn.Module):
    """Linear -> ReLU -> Dropout (embed/fc_embed/att_embed pattern,
    reference AttModel.py:74-85)."""
    features: int
    drop: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Dense(self.features, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Dropout(self.drop)(x, train)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over ragged att features (use_bn path).

    Statistics are computed only over valid (mask==1) positions, matching
    the reference's pack_padded_sequence + BatchNorm1d composition
    (AttModel.py:44-49,80-85).  Running stats live in the 'batch_stats'
    collection.
    """
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # x: [B, M, C]; mask: [B, M] or None
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            if mask is None:
                n = jnp.float32(x.shape[0] * x.shape[1])
                mean = x.mean(axis=(0, 1))
                var = x.var(axis=(0, 1))
            else:
                m = mask[..., None]
                n = jnp.maximum(m.sum(), 1.0)
                mean = (x * m).sum(axis=(0, 1)) / n
                var = (((x - mean) ** 2) * m).sum(axis=(0, 1)) / n
            if not self.is_initializing():
                # torch BatchNorm1d normalizes the batch with the BIASED
                # variance but accumulates the Bessel-corrected UNBIASED
                # variance into running stats
                var_unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * var_unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


def additive_attention(h, att_feats, p_att_feats, att_masks,
                       h2att: Dense, alpha_net: Dense):
    """The reference Attention module's math (AttModel.py:719-748).

    h:            [B, H] query hidden state
    att_feats:    [B, M, H] embedded attention features (values)
    p_att_feats:  [B, M, A] pre-projected keys (ctx2att output)
    att_masks:    [B, M] or None
    """
    N = h.shape[0]
    nb = att_feats.shape[0]
    if nb != N:
        # block-shared beam lanes: one key/value row serves N//nb
        # consecutive query rows (beam search leaves the att features
        # un-replicated; this cuts the dominant per-step HBM read by the
        # beam width — same math, different broadcast)
        bw = N // nb
        att_h = h2att(h).reshape(nb, bw, 1, -1)          # [nb, bw, 1, A]
        dot = jnp.tanh(p_att_feats[:, None] + att_h)     # [nb, bw, M, A]
        e = alpha_net(dot)[..., 0]                       # [nb, bw, M]
        weight = jax.nn.softmax(e, axis=-1)
        if att_masks is not None:
            weight = weight * att_masks[:, None]
            weight = weight / jnp.maximum(
                weight.sum(-1, keepdims=True), 1e-9)
        att_res = jnp.einsum('bqm,bmh->bqh', weight, att_feats)
        return att_res.reshape(N, att_feats.shape[-1])
    att_h = h2att(h)                            # [B, A]
    dot = jnp.tanh(p_att_feats + att_h[:, None, :])
    e = alpha_net(dot)[..., 0]                  # [B, M]
    weight = jax.nn.softmax(e, axis=-1)
    if att_masks is not None:
        weight = weight * att_masks
        weight = weight / jnp.maximum(weight.sum(-1, keepdims=True), 1e-9)
    att_res = jnp.einsum('bm,bmh->bh', weight, att_feats)
    return att_res
