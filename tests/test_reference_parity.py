"""EXACT numerical parity against the reference PyTorch implementation.

Builds each reference model (torch CPU, /root/reference mounted read-only),
converts its weights with utils.torch_convert, and checks that:

* teacher-forced logprobs match to float tolerance (eval mode);
* greedy captions are IDENTICAL (the BASELINE.md fidelity bar);
* beam-search captions are identical.

This substitutes for MODEL_ZOO score-matching (SURVEY.md section 4) without
needing trained checkpoints or data.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

# append (not insert) so the reference's `tools/` package cannot shadow
# this repo's tools/ for tests that run later in the session
sys.path.append('/root/reference')

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from captioning_tpu.models import setup as jx_setup
from captioning_tpu.models.harness import config_from_opt
from captioning_tpu.utils.torch_convert import convert_state_dict

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini

VOCAB = {str(i): 'w%d' % i for i in range(1, 21)}
VOCAB[str(20)] = 'UNK'


def mkopt(model, **kw):
    opt = SimpleNamespace(
        caption_model=model, vocab_size=20, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=7, max_length=7,
        rnn_type='lstm', logit_layers=1, use_bn=0, vocab=VOCAB,
        seq_per_img=1, compute_dtype='float32',
        N_enc=2, N_dec=2, d_model=16, d_ff=32, num_att_heads=4, dropout=0.1,
        num_heads=4, multi_head_scale=1, refine=1, refine_aoa=1, use_ff=0,
        mean_feats=1, use_multi_head=2, ctx_drop=1, dropout_aoa=0.3,
        decoder_type='AoA', out_res=0, label_smoothing=0)
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


def ref_model(opt):
    from captioning import models as ref_models
    torch.manual_seed(0)
    m = ref_models.setup(opt)
    m.eval()
    return m


def _data(opt, B=3, M=5, seed=0):
    rng = np.random.RandomState(seed)
    fc = rng.randn(B, opt.fc_feat_size).astype('float32')
    att = rng.randn(B, M, opt.att_feat_size).astype('float32')
    seq = rng.randint(1, 20, (B, 8))
    seq[:, 0] = 0
    seq[:, -1] = 0
    seq[0, 5:] = 0
    return fc, att, seq


MODELS = ['newfc', 'language_model', 'fc', 'show_tell', 'att2in', 'att2in2',
          'att2all2', 'updown', 'stackatt', 'denseatt', 'adaatt',
          'adaattmo', 'transformer', 'aoa']


def _jax_captioner(opt, ref):
    cfg = config_from_opt(opt, opt.vocab_size)
    cap = jx_setup(opt, VOCAB)
    variables = convert_state_dict(ref.state_dict(), cfg)
    # structural check against a freshly-initialized tree
    init_vars = jax.device_get(cap.init_params(jax.random.PRNGKey(0),
                                               att_len=5))
    flat_conv = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_init = jax.tree_util.tree_flatten_with_path(init_vars)[0]
    paths_conv = {tuple(str(p) for p in path) for path, _ in flat_conv}
    paths_init = {tuple(str(p) for p in path) for path, _ in flat_init}
    assert paths_conv == paths_init, (
        'converted tree mismatch:\nmissing: %s\nextra: %s' % (
            sorted(paths_init - paths_conv), sorted(paths_conv - paths_init)))
    for (p1, a), (p2, b) in zip(sorted(flat_conv, key=lambda x: str(x[0])),
                                sorted(flat_init, key=lambda x: str(x[0]))):
        assert a.shape == b.shape, (p1, a.shape, b.shape)
    return cap, variables


@pytest.mark.parametrize('model', MODELS)
def test_teacher_forced_and_greedy_parity(model):
    kw = {}
    if model in ('adaatt', 'adaattmo'):
        kw = dict(input_encoding_size=24, att_hid_size=24)
    if model == 'updown':
        kw = dict(num_layers=2)
    if model == 'aoa':
        kw = dict(num_layers=2, input_encoding_size=24, rnn_size=24)
    if model == 'show_tell':
        kw = dict(num_layers=2)
    opt = mkopt(model, **kw)
    ref = ref_model(opt)
    cap, variables = _jax_captioner(opt, ref)

    fc, att, seq = _data(opt)
    fc_t = torch.tensor(fc)
    att_t = torch.tensor(att)
    seq_t = torch.tensor(seq)

    # ---- teacher forced ----
    with torch.no_grad():
        ref_out = ref(fc_t, att_t, seq_t, None).numpy()
    jx_out = np.asarray(cap.forward_tf(
        variables, jnp.asarray(fc), jnp.asarray(att), jnp.asarray(seq),
        None, 0.0, jax.random.PRNGKey(0), False))
    T = ref_out.shape[1]
    # reference breaks early when remaining gt tokens are all zero; compare
    # the steps it computed and only where its rows are nonzero
    nz = np.abs(ref_out).sum(-1) > 0
    diff = np.abs(ref_out - jx_out[:, :T])[nz].max()
    assert diff < 2e-4, (model, diff)

    # ---- greedy sample ----
    if model == 'fc':
        # the reference FCModel._sample crashes on modern torch
        # (FCModel.py:200 broadcasts [B] into [B, V+1]); TF parity above
        # already pins the weights/conversion.
        return
    with torch.no_grad():
        ref_seq, _ = ref(fc_t, att_t, None, opt={'sample_method': 'greedy',
                                                 'beam_size': 1},
                         mode='sample')
    jx_seq, _ = cap.sample_jit(variables, jnp.asarray(fc), jnp.asarray(att),
                               None, jax.random.PRNGKey(0),
                               {'sample_method': 'greedy'})
    assert (ref_seq.numpy() == np.asarray(jx_seq)).all(), model

    # ---- beam search (batched models only; fc/show_tell use the legacy
    # per-image path in the reference with different output shapes) ----
    if model not in ('fc', 'show_tell'):
        with torch.no_grad():
            ref_bseq, _ = ref(fc_t, att_t, None,
                              opt={'sample_method': 'greedy',
                                   'beam_size': 3, 'group_size': 1,
                                   'sample_n': 1, 'suppress_UNK': 0},
                              mode='sample')
        jx_bseq, _, _ = cap.sample_beam_jit(
            variables, jnp.asarray(fc), jnp.asarray(att), None,
            jax.random.PRNGKey(0),
            {'beam_size': 3, 'sample_n': 1, 'group_size': 1,
             'suppress_UNK': 0})
        assert (ref_bseq.numpy() == np.asarray(jx_bseq)).all(), model


@pytest.mark.parametrize('model', ['updown', 'transformer'])
def test_diverse_sample_parity(model):
    """Greedy diverse sampling (group_size>1, beam_size=1) must match the
    reference AttModel._diverse_sample (AttModel.py:354) exactly —
    including its column-indexing diversity penalty quirk."""
    kw = dict(num_layers=2) if model == 'updown' else {}
    opt = mkopt(model, **kw)
    ref = ref_model(opt)
    cap, variables = _jax_captioner(opt, ref)
    fc, att, _ = _data(opt, B=3)

    sopt = {'sample_method': 'greedy', 'beam_size': 1, 'group_size': 3,
            'diversity_lambda': 0.5, 'decoding_constraint': 1}
    with torch.no_grad():
        ref_seq, ref_lp = ref(torch.tensor(fc), torch.tensor(att), None,
                              opt=dict(sopt), mode='sample')
    jx_seq, jx_lp = cap.sample_jit(variables, jnp.asarray(fc),
                                   jnp.asarray(att), None,
                                   jax.random.PRNGKey(0), sopt)
    assert (ref_seq.numpy() == np.asarray(jx_seq)).all(), model
    nz = ref_seq.numpy() != 0
    lp_diff = np.abs(ref_lp.numpy() - np.asarray(jx_lp))[nz].max()
    assert lp_diff < 2e-4, (model, lp_diff)


@pytest.mark.parametrize('model', ['updown', 'transformer', 'att2in2'])
def test_diverse_beam_parity(model):
    """Diverse beam search (group_size=2) must match the reference."""
    kw = dict(num_layers=2) if model == 'updown' else {}
    opt = mkopt(model, **kw)
    ref = ref_model(opt)
    # The reference's batched diverse beam crashes upstream: add_diversity
    # calls self.repeat_tensor (CaptionModel.py:53) which exists nowhere;
    # the evident intent is models/utils.repeat_tensors. Patch it in.
    from captioning.models.utils import repeat_tensors as _rt
    type(ref).repeat_tensor = staticmethod(lambda n, x: _rt(n, x))
    cap, variables = _jax_captioner(opt, ref)
    fc, att, _ = _data(opt, B=2)

    with torch.no_grad():
        ref_seq, _ = ref(torch.tensor(fc), torch.tensor(att), None,
                         opt={'sample_method': 'greedy', 'beam_size': 4,
                              'group_size': 2, 'diversity_lambda': 0.5,
                              'sample_n': 1, 'suppress_UNK': 0},
                         mode='sample')
    import jax
    import jax.numpy as jnp
    jx_seq, _, done = cap.sample_beam_jit(
        variables, jnp.asarray(fc), jnp.asarray(att), None,
        jax.random.PRNGKey(0),
        {'beam_size': 4, 'group_size': 2, 'diversity_lambda': 0.5,
         'sample_n': 1, 'suppress_UNK': 0})
    assert (ref_seq.numpy() == np.asarray(jx_seq)).all(), model
    # and the full done-beam pool of group 0 matches the reference's
    # done_beams ordering for the best beams of each group
    ref_done = ref.done_beams
    pool_seq = np.asarray(done['seq'])
    for b in range(2):
        for g in range(2):
            ref_best = ref_done[b][g * 2]['seq'].numpy()
            got = pool_seq[b, g, 0][:len(ref_best)]
            assert (got == ref_best).all(), (model, b, g)
