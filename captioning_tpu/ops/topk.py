"""Pallas streaming top-k over the last dimension (beam-search candidates).

NEGATIVE RESULT, kept for the record (like ops/mha_step.py).  Hypothesis:
``jax.lax.top_k`` on TPU is sort-based and measures ~2.6 ms for the beam
step's [B=1024, bdash*V1=47440] candidate rows on a v5e — ~10x the
HBM-bandwidth bound of reading the rows once — so a streaming kernel that
folds each [TB, C] chunk into a carried [TB, k] state with k
max/min-index selection sweeps should win for tiny k (beam width <= 8).
Measured: **3.09 ms vs 2.63 ms** (tools/bench_topk.py) — the k exact
selection sweeps cost ~7 VPU passes per winner over the full chunk
(max, tie mask, index min, pick, retire), and Mosaic has no per-row lane
gather that would let the sweeps run on anything smaller than the full
chunk width.  XLA's sort wins; the engine keeps ``jax.lax.top_k``.

Correctness is exact nonetheless and pinned by tests/test_ops.py: values
AND indices identical to ``jax.lax.top_k`` (values descending, ties by
ascending index — the selection sweep breaks value ties by smallest
global index; carried entries come from earlier chunks, so they win ties
automatically, and picked entries are retired to (-inf, INT_MAX) so even
all--inf rows match).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .attention import auto_interpret

_LANES = 128
_INT_MAX = 2 ** 31 - 1  # python int: jnp constants can't be captured by kernels


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, block_n: int):
    j = pl.program_id(1)
    tile = x_ref[:]                                       # [TB, C] f32
    tb, c = tile.shape
    base = j * block_n
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + base

    @pl.when(j == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        idx_ref[:] = jnp.full(idx_ref.shape, _INT_MAX, jnp.int32)

    allv = jnp.concatenate([vals_ref[:], tile], axis=1)   # [TB, LANES+C]
    alli = jnp.concatenate([idx_ref[:], col], axis=1)

    out_v, out_i = [], []
    work = allv
    for _ in range(k):
        m = jnp.max(work, axis=1, keepdims=True)          # [TB, 1]
        is_m = work == m
        cand = jnp.where(is_m, alli, _INT_MAX)
        sel = jnp.min(cand, axis=1, keepdims=True)        # smallest index
        pick = is_m & (alli == sel)                       # unique position
        # retire the pick: -inf value AND max index, so a picked -inf entry
        # can't win the min-index tie-break again (all--inf rows stay
        # lax.top_k-identical)
        work = jnp.where(pick, -jnp.inf, work)
        alli = jnp.where(pick, _INT_MAX, alli)
        out_v.append(m)
        out_i.append(sel)

    pad = _LANES - k
    vals_ref[:] = jnp.concatenate(
        out_v + [jnp.full((tb, pad), -jnp.inf, allv.dtype)], axis=1)
    idx_ref[:] = jnp.concatenate(
        out_i + [jnp.full((tb, pad), _INT_MAX, jnp.int32)], axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def topk_lastdim(x, k: int, block_b: int = 256, block_n: int = 1024,
                 interpret: bool | None = None):
    """Exact (lax.top_k-identical) top-k over the last dim of [B, N] f32.

    Returns (values [B, k] f32 desc-sorted, indices [B, k] int32)."""
    if interpret is None:
        interpret = auto_interpret()
    B, N = x.shape
    x = x.astype(jnp.float32)
    TB = min(block_b, B)
    n_b = -(-B // TB)
    n_j = -(-N // block_n)
    pad_b = n_b * TB - B
    pad_n = n_j * block_n - N
    if pad_b or pad_n:
        x = jnp.pad(x, ((0, pad_b), (0, pad_n)),
                    constant_values=-jnp.inf)

    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, block_n=block_n),
        grid=(n_b, n_j),
        in_specs=[pl.BlockSpec((TB, block_n), lambda i, j: (i, j))],
        out_specs=[pl.BlockSpec((TB, _LANES), lambda i, j: (i, 0)),
                   pl.BlockSpec((TB, _LANES), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_b * TB, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((n_b * TB, _LANES), jnp.int32)],
        interpret=interpret,
    )(x)
    return vals[:B, :k], idx[:B, :k]
