"""Quick-tier reference-fidelity sentinel.

The full torch-parity matrix (tests/test_reference_parity.py) is slow-tier;
this module keeps ONE cheap representative of each parity family in the
quick gate so a fidelity regression is caught by `pytest -m "not slow"`
(seconds) instead of 18 minutes later:

* att2in2 teacher-forced forward vs the reference torch model
  (/root/reference/captioning/models/Att2inModel.py) — pins the recurrent
  harness + weight conversion;
* transformer greedy captions vs the reference — pins the scanned decode
  step incl. the stacked-layer lax.scan and the lazy cross-attention
  reformulation (/root/reference/captioning/models/TransformerModel.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from tests.test_reference_parity import _data, _jax_captioner, mkopt, \
    ref_model


def test_att2in2_tf_forward_sentinel():
    opt = mkopt('att2in2')
    ref = ref_model(opt)
    cap, variables = _jax_captioner(opt, ref)
    fc, att, seq = _data(opt)
    with torch.no_grad():
        ref_out = ref(torch.tensor(fc), torch.tensor(att),
                      torch.tensor(seq), None).numpy()
    jx_out = np.asarray(cap.forward_tf(
        variables, jnp.asarray(fc), jnp.asarray(att), jnp.asarray(seq),
        None, 0.0, jax.random.PRNGKey(0), False))
    T = ref_out.shape[1]
    nz = np.abs(ref_out).sum(-1) > 0
    assert np.abs(ref_out - jx_out[:, :T])[nz].max() < 2e-4


def test_transformer_greedy_sentinel():
    opt = mkopt('transformer')
    ref = ref_model(opt)
    cap, variables = _jax_captioner(opt, ref)
    fc, att, _ = _data(opt)
    with torch.no_grad():
        ref_seq, ref_lp = ref(torch.tensor(fc), torch.tensor(att), None,
                              opt={'sample_method': 'greedy',
                                   'beam_size': 1},
                              mode='sample')
    jx_seq, jx_lp = cap.sample_jit(variables, jnp.asarray(fc),
                                   jnp.asarray(att), None,
                                   jax.random.PRNGKey(0),
                                   {'sample_method': 'greedy'})
    assert (ref_seq.numpy() == np.asarray(jx_seq)).all()
    nz = ref_seq.numpy() != 0
    assert np.abs(ref_lp.numpy() - np.asarray(jx_lp))[nz].max() < 2e-4
