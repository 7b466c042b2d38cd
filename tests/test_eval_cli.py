"""End-to-end eval: language_eval over the native scorers, eval CLI flow,
multi-sample diversity evaluation."""

import json
import os
import sys

import numpy as np
import pytest

from tests.util_synth import build_synthetic_dataset, make_opt

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    """Train a tiny model for a few steps and return (ds, ckpt dir)."""
    root = tmp_path_factory.mktemp('evalcli')
    ds = build_synthetic_dataset(str(root / 'synth'))
    cwd = os.getcwd()
    os.chdir(root)
    try:
        from tools.train import train
        ckpt = str(root / 'log_ev')
        opt = make_opt(ds, 'newfc', max_epochs=1, checkpoint_path=ckpt,
                       save_checkpoint_every=3, language_eval=0,
                       val_images_use=4, id='ev', losses_log_every=1)
        opt.start_from = None
        train(opt)
    finally:
        os.chdir(cwd)
    return ds, str(root / 'log_ev'), str(root)


def test_language_eval_native(trained, monkeypatch):
    ds, ckpt, root = trained
    monkeypatch.chdir(root)
    from captioning_tpu.utils import eval_utils
    preds = [
        {'image_id': 1012, 'caption': 'w1 w2 w3', 'perplexity': 1.0,
         'entropy': 1.0},
        {'image_id': 1013, 'caption': 'w4 w5', 'perplexity': 1.2,
         'entropy': 1.1},
    ]
    out = eval_utils.language_eval(
        ds.annotations, preds, [], {'id': 'lv', 'eval_oracle': 0}, 'val')
    for k in ('Bleu_1', 'Bleu_4', 'ROUGE_L', 'METEOR_approx', 'CIDEr',
              'bad_count_rate', 'perplexity', 'entropy'):
        assert k in out, k
    assert os.path.isfile('eval_results/lv_val.json')


def test_eval_split_with_language_eval(trained, monkeypatch):
    ds, ckpt, root = trained
    monkeypatch.chdir(root)
    import jax
    from captioning_tpu.data.dataset import DataLoader
    from captioning_tpu.models import setup
    from captioning_tpu.utils import eval_utils, misc

    opt = make_opt(ds, 'newfc')
    loader = DataLoader(opt)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    cap = setup(opt, loader.get_vocab())
    variables = misc.load_pytree(os.path.join(ckpt, 'model.npz'))
    eval_kwargs = {'split': 'val', 'num_images': 4, 'language_eval': 1,
                   'verbose': False, 'id': 'ev2',
                   'dataset': ds.annotations, 'max_length': 6,
                   'beam_size': 1}
    loss, preds, lang = eval_utils.eval_split(cap, variables, loader,
                                              eval_kwargs)
    assert lang is not None and 'CIDEr' in lang


def test_eval_split_n_diversity(trained, monkeypatch):
    ds, ckpt, root = trained
    monkeypatch.chdir(root)
    import jax
    from captioning_tpu.data.dataset import DataLoader
    from captioning_tpu.models import setup
    from captioning_tpu.utils import eval_utils, misc

    opt = make_opt(ds, 'newfc')
    loader = DataLoader(opt)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    cap = setup(opt, loader.get_vocab())
    variables = misc.load_pytree(os.path.join(ckpt, 'model.npz'))

    for method in ('sample', 'bs', 'dbs', 'dgreedy'):
        eval_kwargs = {'split': 'val', 'num_images': 4, 'language_eval': 1,
                       'verbose': False, 'id': 'evn_' + method,
                       'dataset': ds.annotations, 'max_length': 6,
                       'sample_n': 2, 'sample_n_method': method,
                       'beam_size': 1, 'eval_oracle': 1}
        loss, preds, lang = eval_utils.eval_split(cap, variables, loader,
                                                  eval_kwargs)
        assert lang is not None
        assert 'Div1' in lang and 'mBLeu_4' in lang, (method, lang.keys())
        assert 'self_cider' in lang
        assert any(k.startswith('oracle_') for k in lang), method


def test_eval_cli_and_ensemble(trained, monkeypatch):
    ds, ckpt, root = trained
    monkeypatch.chdir(root)
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, 'tools', 'eval.py'),
         '--model', os.path.join(ckpt, 'model.npz'),
         '--infos_path', os.path.join(ckpt, 'infos_ev.pkl'),
         '--split', 'val', '--num_images', '4', '--language_eval', '0',
         '--force', '1', '--dump_images', '0', '--max_length', '6',
         '--id', 'cli'],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isfile('vis/vis.json')
    preds = json.load(open('vis/vis.json'))
    assert len(preds) == 4


def test_eval_cli_annfile_and_only_lang_eval(trained, monkeypatch):
    """--annfile points language eval at a custom annotations json;
    --only_lang_eval re-scores the saved predictions without decoding."""
    ds, ckpt, root = trained
    monkeypatch.chdir(root)
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=repo)
    base = [sys.executable, os.path.join(repo, 'tools', 'eval.py'),
            '--model', os.path.join(ckpt, 'model.npz'),
            '--infos_path', os.path.join(ckpt, 'infos_ev.pkl'),
            '--split', 'val', '--num_images', '4', '--language_eval', '1',
            '--annfile', ds.annotations, '--dump_images', '0',
            '--max_length', '6', '--id', 'cli_ann']
    r = subprocess.run(base + ['--force', '1'], capture_output=True,
                       text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isfile('eval_results/cli_ann_val.json')
    scores1 = json.load(open('eval_results/cli_ann_val.json'))

    r2 = subprocess.run(base + ['--only_lang_eval', '1', '--force', '1'],
                        capture_output=True, text=True, env=env, timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    scores2 = json.load(open('eval_results/cli_ann_val.json'))
    assert scores1['overall']['CIDEr'] == scores2['overall']['CIDEr']


def test_dump_images_copies_to_vis(trained, monkeypatch):
    """--dump_images copies source images to vis/imgs for the HTML viewer
    (reference eval_utils.py:188-191)."""
    ds, ckpt, root = trained
    monkeypatch.chdir(root)
    from captioning_tpu.data.dataset import DataLoader
    from captioning_tpu.models import setup
    from captioning_tpu.utils import eval_utils, misc

    img_root = os.path.join(str(root), 'raw_imgs')
    os.makedirs(img_root, exist_ok=True)
    info = json.load(open(ds.input_json))
    for img in info['images']:
        with open(os.path.join(img_root, img['file_path']), 'wb') as f:
            f.write(b'\xff\xd8fakejpg')

    opt = make_opt(ds, 'newfc')
    loader = DataLoader(opt)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    cap = setup(opt, loader.get_vocab())
    variables = misc.load_pytree(os.path.join(ckpt, 'model.npz'))
    eval_kwargs = {'split': 'val', 'num_images': 2, 'language_eval': 0,
                   'verbose': False, 'id': 'dmp', 'dataset': ds.annotations,
                   'max_length': 6, 'beam_size': 1,
                   'dump_images': 1, 'image_root': img_root}
    eval_utils.eval_split(cap, variables, loader, eval_kwargs)
    assert os.path.isfile('vis/imgs/img1.jpg')
    assert os.path.isfile('vis/imgs/img2.jpg')
