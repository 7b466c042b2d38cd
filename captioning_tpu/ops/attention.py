"""Pallas fused additive-attention kernel.

The per-token hot loop of every RNN-attention captioner evaluates
``tanh(p_att + h2att(h)) @ w_alpha`` -> masked softmax -> weighted feature
sum (reference AttModel.py:728-748).  XLA materializes the [B, M, A] tanh
intermediate in HBM between fusions; this kernel keeps it in VMEM,
computing scores + softmax + the weighted sum in one pass per batch tile.

The query projection h2att(h) and the ctx2att key projection stay outside
(pure MXU matmuls, already optimal in XLA).  Backward is a recompute-based
custom VJP (the decode loop — the perf-critical consumer — never
differentiates through this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# TPU-backed pallas namespace; interpret mode is used on CPU tests.
try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def auto_interpret() -> bool:
    """Pallas interpret mode off TPU (CPU tests / debugging)."""
    return jax.default_backend() != 'tpu'


def additive_attention_ref(att_h, att_feats, p_att_feats, att_masks,
                           w_alpha, b_alpha):
    """Pure-jnp reference (identical math to layers.additive_attention).

    att_h:       [B, A] projected query (h2att output)
    att_feats:   [B, M, H] values
    p_att_feats: [B, M, A] projected keys
    att_masks:   [B, M] or None
    w_alpha:     [A], b_alpha: scalar — the alpha_net Dense(1)
    """
    dot = jnp.tanh(p_att_feats + att_h[:, None, :])
    e = jnp.einsum('bma,a->bm', dot, w_alpha) + b_alpha
    weight = jax.nn.softmax(e, axis=-1)
    if att_masks is not None:
        weight = weight * att_masks
        weight = weight / jnp.maximum(weight.sum(-1, keepdims=True), 1e-9)
    return jnp.einsum('bm,bmh->bh', weight, att_feats)


def _attn_kernel(att_h_ref, att_ref, p_att_ref, mask_ref, w_ref, b_ref,
                 out_ref):
    att_h = att_h_ref[:]                      # [TB, A]
    p_att = p_att_ref[:]                      # [TB, M, A]
    att = att_ref[:]                          # [TB, M, H]
    mask = mask_ref[:]                        # [TB, M]
    w = w_ref[:]                              # [1, A]
    b = b_ref[0, 0]

    dot = jnp.tanh(p_att + att_h[:, None, :])                 # [TB, M, A]
    # 3-D contractions don't lower in Mosaic; mul+reduce over A on the VPU
    e = jnp.sum(dot * w[0][None, None, :], axis=-1,
                dtype=jnp.float32) + b                        # [TB, M]
    e = e - jnp.max(e, axis=-1, keepdims=True)
    ex = jnp.exp(e)
    weight = ex / jnp.sum(ex, axis=-1, keepdims=True)
    weight = weight * mask
    weight = weight / jnp.maximum(
        jnp.sum(weight, axis=-1, keepdims=True), 1e-9)
    # batched-dot einsum does not lower in Mosaic; mul+reduce on the VPU
    # (M is small: <= ~100 regions)
    out_ref[:] = jnp.sum(att * weight[..., None].astype(att.dtype), axis=1)


def _forward_pallas(att_h, att_feats, p_att_feats, att_masks, w_alpha,
                    b_alpha, block_b: int, interpret: bool):
    B, M, H = att_feats.shape
    A = att_h.shape[-1]
    TB = min(block_b, B)
    n_b = -(-B // TB)
    pad_b = n_b * TB - B
    if pad_b:
        pad = lambda x: jnp.pad(x, [(0, pad_b)] + [(0, 0)] * (x.ndim - 1))
        att_h, att_feats, p_att_feats, att_masks = map(
            pad, (att_h, att_feats, p_att_feats, att_masks))

    w2 = w_alpha.reshape(1, A)
    b2 = jnp.asarray(b_alpha, jnp.float32).reshape(1, 1)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs['compiler_params'] = pltpu.CompilerParams()

    out = pl.pallas_call(
        _attn_kernel,
        grid=(n_b,),
        in_specs=[
            pl.BlockSpec((TB, A), lambda i: (i, 0)),
            pl.BlockSpec((TB, M, H), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, M, A), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, M), lambda i: (i, 0)),
            pl.BlockSpec((1, A), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_b * TB, H), att_feats.dtype),
        interpret=interpret,
        **kwargs,
    )(att_h, att_feats, p_att_feats, att_masks, w2, b2)
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def additive_attention_fused(att_h, att_feats, p_att_feats, att_masks,
                             w_alpha, b_alpha, block_b: int = 8,
                             interpret: bool = False):
    return _forward_pallas(att_h, att_feats, p_att_feats, att_masks,
                           w_alpha, b_alpha, block_b, interpret)


def _fwd(att_h, att_feats, p_att_feats, att_masks, w_alpha, b_alpha,
         block_b, interpret):
    out = _forward_pallas(att_h, att_feats, p_att_feats, att_masks,
                          w_alpha, b_alpha, block_b, interpret)
    return out, (att_h, att_feats, p_att_feats, att_masks, w_alpha, b_alpha)


def _bwd(block_b, interpret, res, g):
    att_h, att_feats, p_att_feats, att_masks, w_alpha, b_alpha = res
    _, vjp = jax.vjp(
        lambda *a: additive_attention_ref(*a), att_h, att_feats,
        p_att_feats, att_masks, w_alpha, b_alpha)
    return vjp(g)


additive_attention_fused.defvjp(_fwd, _bwd)
