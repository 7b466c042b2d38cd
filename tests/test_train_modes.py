"""E2e smokes for the remaining training modes: PPO, noam transformer,
drop-worst, warmup, plateau, struc with XE mix."""

import os

import numpy as np
import pytest

from tests.util_synth import build_synthetic_dataset, make_opt

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    return build_synthetic_dataset(str(tmp_path_factory.mktemp('modes')))


def _reset_scorers():
    import captioning_tpu.utils.rewards as rewards
    rewards.CiderD_scorer = None
    rewards.Cider_scorer = None
    rewards.Bleu_scorer = None


def test_ppo_train(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _reset_scorers()
    from tools.train import train
    # stage 1: make an "old model" checkpoint via a short XE run
    ck1 = str(tmp_path / 'log_old')
    opt = make_opt(ds, 'newfc', max_epochs=1, checkpoint_path=ck1,
                   save_checkpoint_every=3, language_eval=0,
                   val_images_use=4, id='old', losses_log_every=1)
    opt.start_from = None
    train(opt)
    assert os.path.isfile(os.path.join(ck1, 'model.npz'))

    # stage 2: PPO from the old policy
    ck2 = str(tmp_path / 'log_ppo')
    opt = make_opt(ds, 'newfc', max_epochs=2, checkpoint_path=ck2,
                   save_checkpoint_every=100, language_eval=0,
                   val_images_use=4, id='ppo', structure_after=0,
                   use_ppo=1, losses_log_every=1,
                   ppo_old_model_path=os.path.join(ck1, 'model.npz'))
    opt.start_from = ck1.replace('log_old', 'log_nonexistent')
    train(opt)


def test_noam_transformer_train(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from tools.train import train
    ck = str(tmp_path / 'log_noam')
    opt = make_opt(ds, 'transformer', max_epochs=1, checkpoint_path=ck,
                   save_checkpoint_every=100, language_eval=0,
                   val_images_use=4, id='noam', losses_log_every=1)
    opt.noamopt = True
    opt.noamopt_warmup = 10
    opt.noamopt_factor = 1.0
    opt.N_enc = opt.N_dec = 2
    opt.d_model = 16
    opt.d_ff = 32
    opt.num_att_heads = 4
    opt.start_from = None
    train(opt)


def test_drop_worst_and_warmup(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from tools.train import train
    ck = str(tmp_path / 'log_dw')
    opt = make_opt(ds, 'newfc', max_epochs=1, checkpoint_path=ck,
                   save_checkpoint_every=100, language_eval=0,
                   val_images_use=4, id='dw', drop_worst_after=0,
                   drop_worst_rate=0.25, losses_log_every=1)
    opt.use_warmup = True
    opt.noamopt_warmup = 5
    opt.start_from = None
    train(opt)


def test_plateau_schedule(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from tools.train import train
    ck = str(tmp_path / 'log_plat')
    opt = make_opt(ds, 'newfc', max_epochs=1, checkpoint_path=ck,
                   save_checkpoint_every=3, language_eval=0,
                   val_images_use=4, id='plat', losses_log_every=1)
    opt.reduce_on_plateau = True
    opt.start_from = None
    train(opt)
    import pickle
    with open(os.path.join(ck, 'infos_plat.pkl'), 'rb') as f:
        infos = pickle.load(f, encoding='latin-1')
    assert 'plateau_state_dict' in infos


def test_struc_with_xe_mix(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _reset_scorers()
    from tools.train import train
    ck = str(tmp_path / 'log_mix')
    opt = make_opt(ds, 'att2in2', max_epochs=1, checkpoint_path=ck,
                   save_checkpoint_every=100, language_eval=0,
                   val_images_use=4, id='mix', structure_after=0,
                   structure_loss_type='softmax_margin',
                   structure_loss_weight=0.5, losses_log_every=1)
    opt.start_from = None
    train(opt)


def test_struc_weight_zero_host_path(ds, tmp_path, monkeypatch):
    """structure_loss_weight 0 (pure XE through the struc path, a supported
    config — train.py passes zero scores) must not crash the metrics
    consumer: the host-reward struc step emits 'reward' unconditionally."""
    monkeypatch.chdir(tmp_path)
    _reset_scorers()
    from tools.train import train
    ck = str(tmp_path / 'log_w0')
    opt = make_opt(ds, 'att2in2', max_epochs=1, checkpoint_path=ck,
                   save_checkpoint_every=100, language_eval=0,
                   val_images_use=4, id='w0', structure_after=0,
                   structure_loss_type='softmax_margin',
                   structure_loss_weight=0.0, losses_log_every=1,
                   on_device_cider=0)
    opt.start_from = None
    train(opt)
