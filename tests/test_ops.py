"""Pallas kernel correctness (interpret mode on CPU) vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


def test_fused_additive_attention_matches_ref():
    from captioning_tpu.ops.attention import (additive_attention_fused,
                                              additive_attention_ref)
    rng = np.random.RandomState(0)
    B, M, H, A = 6, 12, 16, 8
    att_h = jnp.asarray(rng.randn(B, A).astype('float32'))
    att = jnp.asarray(rng.randn(B, M, H).astype('float32'))
    p_att = jnp.asarray(rng.randn(B, M, A).astype('float32'))
    mask = jnp.asarray((rng.rand(B, M) > 0.3).astype('float32'))
    mask = mask.at[:, 0].set(1.0)
    w = jnp.asarray(rng.randn(A).astype('float32'))
    b = jnp.float32(0.3)

    ref = additive_attention_ref(att_h, att, p_att, mask, w, b)
    got = additive_attention_fused(att_h, att, p_att, mask, w, b,
                                   4, True)
    assert np.allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_fused_additive_attention_grads():
    from captioning_tpu.ops.attention import (additive_attention_fused,
                                              additive_attention_ref)
    rng = np.random.RandomState(1)
    B, M, H, A = 4, 7, 8, 8
    args = (
        jnp.asarray(rng.randn(B, A).astype('float32')),
        jnp.asarray(rng.randn(B, M, H).astype('float32')),
        jnp.asarray(rng.randn(B, M, A).astype('float32')),
        jnp.ones((B, M), jnp.float32),
        jnp.asarray(rng.randn(A).astype('float32')),
        jnp.float32(0.1),
    )
    g_ref = jax.grad(lambda *a: additive_attention_ref(*a).sum(),
                     argnums=(0, 1, 2, 4))(*args)
    g_fused = jax.grad(
        lambda *a: additive_attention_fused(*a, 4, True).sum(),
        argnums=(0, 1, 2, 4))(*args)
    for a, b in zip(g_ref, g_fused):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_lstm_gates_matches_ref():
    from captioning_tpu.ops.lstm import (maxout_lstm_gates_fused,
                                         maxout_lstm_gates_ref)
    rng = np.random.RandomState(2)
    B, H = 8, 16
    s = jnp.asarray(rng.randn(B, 5 * H).astype('float32'))
    c = jnp.asarray(rng.randn(B, H).astype('float32'))
    h_ref, c_ref = maxout_lstm_gates_ref(s, c)
    h_got, c_got = maxout_lstm_gates_fused(s, c, interpret=True)
    assert np.allclose(np.asarray(h_ref), np.asarray(h_got), atol=1e-6)
    assert np.allclose(np.asarray(c_ref), np.asarray(c_got), atol=1e-6)


def test_pallas_attention_in_model():
    """A use_pallas model must produce the same captions as the jnp path."""
    import jax
    from types import SimpleNamespace
    from captioning_tpu.models import setup

    def mk(pallas):
        return SimpleNamespace(
            caption_model='updown', vocab_size=20, input_encoding_size=16,
            rnn_size=24, num_layers=2, drop_prob_lm=0.5, fc_feat_size=10,
            att_feat_size=12, att_hid_size=8, seq_per_img=2, max_length=7,
            compute_dtype='float32', use_pallas=pallas)

    vocab = {str(i): 'w%d' % i for i in range(1, 21)}
    cap0 = setup(mk(0), vocab)
    cap1 = setup(mk(1), vocab)
    variables = cap0.init_params(jax.random.PRNGKey(0), att_len=5)
    B = 3
    fc = jnp.ones((B, 10))
    att = jnp.asarray(np.random.RandomState(0).randn(B, 5, 12), jnp.float32)
    am = jnp.ones((B, 5))
    s0, lp0 = cap0.sample_jit(variables, fc, att, am, jax.random.PRNGKey(1),
                              {'sample_method': 'greedy'})
    s1, lp1 = cap1.sample_jit(variables, fc, att, am, jax.random.PRNGKey(1),
                              {'sample_method': 'greedy'})
    assert (np.asarray(s0) == np.asarray(s1)).all()
    assert np.allclose(np.asarray(lp0), np.asarray(lp1), atol=1e-4)


def test_mha_step_fused_matches_ref():
    """Fused decode-step MHA kernel (interpret mode) vs the jnp path."""
    from captioning_tpu.ops.mha_step import mha_step_fused, mha_step_ref
    rng = np.random.RandomState(0)
    N, h, T, dk = 16, 4, 9, 8
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype('float32'))
    q, kn, vn = mk(N, h, dk), mk(N, h, dk), mk(N, h, dk)
    kc, vc = mk(N, h, T, dk), mk(N, h, T, dk)
    for t in (0, 4, T - 1):
        o1, k1, v1 = mha_step_ref(q, kn, vn, kc, vc, t)
        o2, k2, v2 = mha_step_fused(q, kn, vn, kc, vc, t, interpret=True)
        assert float(jnp.abs(o1 - o2).max()) < 1e-5, t
        assert float(jnp.abs(k1 - k2).max()) < 1e-6, t
        assert float(jnp.abs(v1 - v2).max()) < 1e-6, t


def test_pallas_topk_matches_lax_top_k():
    """Streaming top-k (interpret mode): values AND indices identical to
    jax.lax.top_k, including tie runs, -inf entries, all--inf rows, and
    non-multiple-of-block shapes."""
    import jax
    from captioning_tpu.ops.topk import topk_lastdim

    rng = np.random.RandomState(3)
    cases = [(5, 300, 5), (3, 2048, 5), (2, 4750, 8), (1, 96, 3)]
    for B, N, k in cases:
        x = rng.randn(B, N).astype('float32')
        x[:, :7] = 2.5                      # tie run at the head
        x[0, N // 2:N // 2 + 9] = 2.5       # tie run crossing chunks
        x[-1, -5:] = -np.inf
        v0, i0 = jax.lax.top_k(jnp.asarray(x), k)
        v1, i1 = topk_lastdim(jnp.asarray(x), k, block_n=256,
                              interpret=True)
        assert np.array_equal(np.asarray(v0), np.asarray(v1)), (B, N, k)
        assert np.array_equal(np.asarray(i0), np.asarray(i1)), (B, N, k)

    x = np.full((2, 200), -np.inf, np.float32)
    v0, i0 = jax.lax.top_k(jnp.asarray(x), 4)
    v1, i1 = topk_lastdim(jnp.asarray(x), 4, block_n=128, interpret=True)
    assert np.array_equal(np.asarray(v0), np.asarray(v1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))


def test_anc_attend_fused_matches_ref():
    """Fused beam ancestry-attention over the stacked KV cache (interpret
    mode) vs the jnp slice+attend reference, across layer/time scalars."""
    from captioning_tpu.ops.anc_attend import anc_attend, anc_attend_ref
    rng = np.random.RandomState(7)
    N, L, h, T, dk, bw = 20, 3, 4, 9, 8, 5
    K = jnp.asarray(rng.randn(N, L, h, T, dk).astype('float32'))
    V = jnp.asarray(rng.randn(N, L, h, T, dk).astype('float32'))
    q = jnp.asarray(rng.randn(N, h * dk).astype('float32'))
    anc = jnp.asarray(rng.randint(0, bw, (N, T)).astype('int32'))
    for l in (0, L - 1):
        for t in (0, 3, T - 1):
            a = anc_attend_ref(K, V, q, anc, jnp.int32(l), jnp.int32(t), bw)
            b = anc_attend(K, V, q, anc, jnp.int32(l), jnp.int32(t), bw,
                           interpret=True)
            assert float(jnp.abs(a - b).max()) < 1e-5, (l, t)
