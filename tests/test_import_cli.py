"""tools/import_torch_checkpoint.py end-to-end: a reference torch
checkpoint becomes a working npz whose greedy captions match."""

import os
import pickle
import subprocess
import sys
from types import SimpleNamespace

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini

torch = pytest.importorskip('torch')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = {str(i): 'w%d' % i for i in range(1, 21)}


# updown + the MODEL_ZOO RL headliners (transformer + SC/NSC at
# MODEL_ZOO.md:105-116, att2in + SC/NSC at :57-68): the import path must
# work for every family someone would actually download.
@pytest.mark.parametrize('model,extra', [
    ('updown', {}),
    ('att2in2', {}),
    ('transformer', dict(N_enc=2, N_dec=2, d_model=16, d_ff=32,
                         num_att_heads=4, dropout=0.1)),
])
def test_import_cli_roundtrip(tmp_path, model, extra):
    sys.path.append('/root/reference')
    from captioning import models as ref_models

    opt = SimpleNamespace(
        caption_model=model, vocab_size=20, input_encoding_size=16,
        rnn_size=24, num_layers=2, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=7, max_length=7,
        rnn_type='lstm', logit_layers=1, use_bn=0, vocab=VOCAB,
        seq_per_img=1, compute_dtype='float32', **extra)
    torch.manual_seed(0)
    ref = ref_models.setup(opt)
    ref.eval()

    ckpt_dir = tmp_path / 'log_ref'
    ckpt_dir.mkdir()
    torch.save(ref.state_dict(), str(ckpt_dir / 'model.pth'))
    opt_nov = SimpleNamespace(**{k: v for k, v in vars(opt).items()
                                 if k != 'vocab'})
    with open(ckpt_dir / 'infos_ref.pkl', 'wb') as f:
        pickle.dump({'opt': opt_nov, 'vocab': VOCAB, 'iter': 0, 'epoch': 0},
                    f, protocol=2)

    out_dir = tmp_path / 'log_tpu'
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'tools', 'import_torch_checkpoint.py'),
         '--infos_path', str(ckpt_dir / 'infos_ref.pkl'),
         '--model', str(ckpt_dir / 'model.pth'),
         '--output_dir', str(out_dir), '--id', 'ref'],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isfile(out_dir / 'model.npz')
    assert os.path.isfile(out_dir / 'infos_ref.pkl')

    # converted model reproduces reference greedy captions
    import jax
    import jax.numpy as jnp
    from captioning_tpu.models import setup as jx_setup
    from captioning_tpu.utils.misc import load_pytree
    cap = jx_setup(opt_nov, VOCAB)
    variables = load_pytree(str(out_dir / 'model.npz'))
    rng = np.random.RandomState(0)
    fc = rng.randn(3, 10).astype('float32')
    att = rng.randn(3, 5, 12).astype('float32')
    with torch.no_grad():
        ref_seq, _ = ref(torch.tensor(fc), torch.tensor(att), None,
                         opt={'sample_method': 'greedy', 'beam_size': 1},
                         mode='sample')
    jx_seq, _ = cap.sample_jit(variables, jnp.asarray(fc), jnp.asarray(att),
                               None, jax.random.PRNGKey(0),
                               {'sample_method': 'greedy'})
    assert (ref_seq.numpy() == np.asarray(jx_seq)).all()
