"""Pallas fused maxout-LSTM gate kernel.

The 5-gate maxout cell (reference FCModel.py:25-42) does, after its two
MXU matmuls, a chain of elementwise ops over [B, 5H]: sigmoid on 3H, max
of two H chunks, fma into the cell state, tanh, multiply.  This kernel
runs the whole post-matmul chain in one VMEM pass.  XLA usually fuses
this too — the kernel exists as the measured-and-tested fusion so the
decode loop's per-step cost is explicit and portable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def maxout_lstm_gates_ref(s, c_prev):
    """s: [B, 5H] pre-activations (i2h+h2h); c_prev: [B, H]."""
    H = c_prev.shape[-1]
    gates = jax.nn.sigmoid(s[:, :3 * H])
    in_gate = gates[:, :H]
    forget_gate = gates[:, H:2 * H]
    out_gate = gates[:, 2 * H:3 * H]
    in_transform = jnp.maximum(s[:, 3 * H:4 * H], s[:, 4 * H:5 * H])
    next_c = forget_gate * c_prev + in_gate * in_transform
    next_h = out_gate * jnp.tanh(next_c)
    return next_h, next_c


def _kernel(s_ref, c_ref, h_out_ref, c_out_ref):
    H = c_ref.shape[-1]
    s = s_ref[:]
    c_prev = c_ref[:]
    i = jax.nn.sigmoid(s[:, :H])
    f = jax.nn.sigmoid(s[:, H:2 * H])
    o = jax.nn.sigmoid(s[:, 2 * H:3 * H])
    g = jnp.maximum(s[:, 3 * H:4 * H], s[:, 4 * H:5 * H])
    next_c = f * c_prev + i * g
    c_out_ref[:] = next_c
    h_out_ref[:] = o * jnp.tanh(next_c)


def maxout_lstm_gates_fused(s, c_prev, block_b: int = 128,
                            interpret: bool = False):
    B, H = c_prev.shape
    TB = min(block_b, B)
    n_b = -(-B // TB)
    pad_b = n_b * TB - B
    if pad_b:
        s = jnp.pad(s, [(0, pad_b), (0, 0)])
        c_prev = jnp.pad(c_prev, [(0, pad_b), (0, 0)])
    h, c = pl.pallas_call(
        _kernel,
        grid=(n_b,),
        in_specs=[pl.BlockSpec((TB, 5 * H), lambda i: (i, 0)),
                  pl.BlockSpec((TB, H), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((TB, H), lambda i: (i, 0)),
                   pl.BlockSpec((TB, H), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_b * TB, H), s.dtype),
                   jax.ShapeDtypeStruct((n_b * TB, H), s.dtype)),
        interpret=interpret,
    )(s, c_prev)
    return h[:B], c[:B]
