"""Pallas fused decode-step multi-head attention over a KV cache.

The transformer-family decode step (reference cachedTransformer.py:398-420)
spends its time in: write new K/V at position ``t`` -> scores = q.K ->
masked softmax -> out = p.V, per layer per token.  This kernel performs
the update and the attention in one VMEM pass per batch tile.

**Measured result (v5e, N=5120, h=8, T=21, dk=64, bf16): the XLA path is
3.5x FASTER than this kernel (3.45 vs 11.98 ms per 6-layer step)** — the
block pipeline still streams the full cache blocks back to HBM (the write
we hoped to avoid), and the q.K / p.V contractions run as VPU mul+reduce
(Mosaic does not lower batched einsums) instead of fused MXU dots.  XLA's
dynamic-update-slice + attend is already near the HBM roofline here, so
the production step (models/transformer.py) keeps the jnp path.  The
kernel is retained as a validated reference for decode-attention work:
scalar-prefetched dynamic time index, input_output_aliases on the caches,
and the Mosaic layout constraints it navigates (no mid-axis reshapes;
[..., None] only on 32-bit types; raised scoped-VMEM limit) are the
non-obvious pieces.

Shapes (decode step, query length 1):
  q, k_new, v_new: [N, h, dk]
  k_cache, v_cache: [N, h, T, dk]
  t: scalar int32 (same step for every row - the uniform_t fast path)

Returns (out [N, h, dk], k_cache', v_cache').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG_INF = -1e9


def mha_step_ref(q, k_new, v_new, k_cache, v_cache, t):
    """Pure-jnp reference (identical math to the transformer step path)."""
    T = k_cache.shape[-2]
    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, k_new[:, :, None, :], t, axis=-2)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, v_new[:, :, None, :], t, axis=-2)
    dk = q.shape[-1]
    s = jnp.einsum('nhd,nhtd->nht', q, k_cache) / jnp.sqrt(
        jnp.asarray(dk, q.dtype))
    s = jnp.where((jnp.arange(T) <= t)[None, None, :], s.astype(jnp.float32),
                  _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum('nht,nhtd->nhd', p, v_cache)
    return out, k_cache, v_cache


def _mha_kernel(t_ref, q_ref, kn_ref, vn_ref, kc_in_ref, vc_in_ref,
                out_ref, kc_ref, vc_ref):
    """q/kn/vn blocks come in as [bn, h, 1, dk]; caches [bn, h, T, dk].

    Mosaic cannot lower mid-axis reshapes (`x[:, :, None, :]`), so the
    query-length axis is materialized OUTSIDE the kernel and only
    trailing-axis broadcasts happen here.
    """
    t = t_ref[0]
    T = kc_in_ref.shape[-2]
    dk = q_ref.shape[-1]

    # merge the new K/V at position t while copying cache -> output
    # (aliased buffers keep this in VMEM; nothing extra moves in HBM)
    tpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T, 1), 2)
    is_t = tpos == t
    k = jnp.where(is_t, kn_ref[:], kc_in_ref[:])
    v = jnp.where(is_t, vn_ref[:], vc_in_ref[:])
    kc_ref[:] = k
    vc_ref[:] = v

    q = q_ref[:]                                   # [bn, h, 1, dk]
    # scores: mul+reduce over dk (batched einsum does not lower in Mosaic)
    s = jnp.sum(q.astype(jnp.float32) * k.astype(jnp.float32),
                axis=-1) / jnp.sqrt(
        jnp.asarray(dk, jnp.float32))                      # [bn, h, T] f32
    s = jnp.where((jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) <= t),
                  s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    # keep p in f32: Mosaic only lowers non-no-op minor-dim inserts
    # ([..., None]) for 32-bit types
    p = e / jnp.sum(e, axis=-1, keepdims=True)             # [bn, h, T] f32
    out_ref[:] = jnp.sum(p[..., None] * v.astype(jnp.float32),
                         axis=-2).astype(q.dtype)          # [bn, h, dk]


@functools.partial(jax.jit, static_argnames=('block_n', 'interpret'))
def mha_step_fused(q, k_new, v_new, k_cache, v_cache, t,
                   block_n: int = 64, interpret: bool = False):
    """Fused cache-update + attention for one decode step (uniform t).

    t: scalar int32 (traced ok).  Returns (out, k_cache, v_cache).
    """
    N, h, T, dk = k_cache.shape
    bn = min(block_n, N)
    while N % bn:
        bn //= 2
    grid = (N // bn,)
    t_arr = jnp.asarray(t, jnp.int32).reshape(1)
    q4 = q.reshape(N, h, 1, dk)
    kn4 = k_new.reshape(N, h, 1, dk)
    vn4 = v_new.reshape(N, h, 1, dk)

    # index maps receive (grid_idx, *scalar_prefetch_refs)
    row = lambda i, t_ref: (i, 0, 0)
    row4 = lambda i, t_ref: (i, 0, 0, 0)
    out, kc, vc = pl.pallas_call(
        _mha_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bn, h, 1, dk), row4),
                pl.BlockSpec((bn, h, 1, dk), row4),
                pl.BlockSpec((bn, h, 1, dk), row4),
                pl.BlockSpec((bn, h, T, dk), row4),
                pl.BlockSpec((bn, h, T, dk), row4),
            ],
            out_specs=[
                pl.BlockSpec((bn, h, dk), row),
                pl.BlockSpec((bn, h, T, dk), row4),
                pl.BlockSpec((bn, h, T, dk), row4),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, h, dk), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # scalar-prefetch arg occupies input slot 0
        input_output_aliases={4: 1, 5: 2},
        # XLA stages custom-call operands in scoped VMEM; the default 16M
        # limit trips at production N — raise it (v5e has 128M VMEM)
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
            if _HAS_PLTPU and not interpret else None),
        interpret=interpret,
    )(t_arr, q4, kn4, vn4, k_cache, v_cache)
    return out, kc, vc
