"""tools/train_pl.py compatibility shim (reference tools/train_pl.py).

The Lightning entry point maps onto the mesh data-parallel loop in
tools/train.py; EVALUATE=1 switches to test-split evaluation (reference
train_pl.py:494-497)."""

import os
import sys

import pytest

from tests.util_synth import build_synthetic_dataset, make_opt

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    return build_synthetic_dataset(str(tmp_path_factory.mktemp('synth_pl')))


def _argv_from_opt(ds, ckpt):
    return ['train_pl.py',
            '--caption_model', 'newfc',
            '--input_json', ds.input_json,
            '--input_label_h5', ds.input_label_h5,
            '--input_fc_dir', ds.input_fc_dir,
            '--input_att_dir', ds.input_att_dir,
            '--batch_size', '4',
            '--rnn_size', '16',
            '--input_encoding_size', '12',
            '--fc_feat_size', str(ds.fc_dim),
            '--att_feat_size', str(ds.att_dim),
            '--att_hid_size', '8',
            '--seq_per_img', '2',
            '--max_length', '6',
            '--cached_tokens', ds.cached_tokens,
            '--num_data_threads', '2',
            '--num_prefetch', '2',
            '--max_epochs', '1',
            '--save_checkpoint_every', '3',
            '--language_eval', '0',
            '--val_images_use', '4',
            '--losses_log_every', '1',
            '--checkpoint_path', ckpt,
            '--id', 'pl']


def test_train_pl_trains_and_evaluates(ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import tools.train_pl as train_pl
    ckpt = str(tmp_path / 'log_pl')

    monkeypatch.setattr(sys, 'argv', _argv_from_opt(ds, ckpt))
    monkeypatch.delenv('EVALUATE', raising=False)
    train_pl.main()
    assert os.path.isfile(os.path.join(ckpt, 'model.npz'))
    assert os.path.isfile(os.path.join(ckpt, 'infos_pl.pkl'))

    # EVALUATE=1 evaluates the saved checkpoint on the test split
    monkeypatch.setattr(sys, 'argv', _argv_from_opt(ds, ckpt))
    monkeypatch.setenv('EVALUATE', '1')
    train_pl.main()
    # with language_eval=0 the artifact is the saved-predictions pickle
    # (eval_results/<id>_<split>.json additionally appears when
    # language_eval=1, written by language_eval itself)
    out = os.path.join('eval_results', '.saved_pred_pl_test.pkl')
    assert os.path.isfile(out)
