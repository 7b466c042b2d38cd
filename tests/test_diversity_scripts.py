"""Miniature Diversity-project sweep, end-to-end through the ACTUAL sweep
scripts (projects/Diversity/scripts/) against a synthetic checkpoint:
train a tiny model, generate sample_n captions with the gen driver, then
language-eval the cached predictions with the eval driver (eval_split_n ->
eval_multi: diversity stats, self-CIDEr, oracle scores).

Reference equivalents: projects/Diversity/scripts/{train,eval}_scripts/.
"""

import json
import os
import subprocess
import sys

import pytest

from tests.util_synth import build_synthetic_dataset, make_opt

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, 'projects', 'Diversity', 'scripts')


def test_diversity_sweep_scripts(tmp_path, monkeypatch):
    ds = build_synthetic_dataset(str(tmp_path / 'synth'))
    monkeypatch.chdir(tmp_path)

    # tiny checkpoint with a model-best artifact (the drivers' contract)
    from tools.train import train
    ckpt = str(tmp_path / 'log_dv')
    opt = make_opt(ds, 'newfc', max_epochs=1, checkpoint_path=ckpt,
                   save_checkpoint_every=3, language_eval=0,
                   val_images_use=4, id='dv', losses_log_every=1)
    opt.start_from = None
    train(opt)
    assert os.path.isfile(os.path.join(ckpt, 'model-best.npz'))

    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO,
               EXTRA_EVAL_ARGS='--annfile %s --batch_size 4 --num_images 4 '
                               '--max_length 6 --force 1' % ds.annotations)
    # tools/ paths inside the scripts resolve against the repo; data paths
    # resolve from the checkpoint's infos — run from the experiment dir
    # with the repo's tools on PATH via a symlink (the drivers' cwd layout)
    os.symlink(os.path.join(REPO, 'tools'), 'tools')

    def run(script, *args):
        r = subprocess.run(
            ['sh', os.path.join(SCRIPTS, 'eval_scripts', script)] +
            list(args), env=env, capture_output=True, text=True,
            timeout=900)
        assert r.returncode == 0, '%s failed:\n%s\n%s' % (
            script, r.stdout[-2000:], r.stderr[-2000:])
        return r

    # gen: decode sample_n=2 per image on the test split, cache predictions
    run('only_gen_test_n_sp.sh', 'dv', '1.0', '2')
    cache = 'eval_results/.saved_pred_dv_sp_1.0_2_test.pkl'
    assert os.path.isfile(cache), os.listdir('eval_results')

    # eval: language-eval the cached predictions (eval_split_n output ->
    # eval_multi diversity metrics) without re-decoding
    run('only_eval_test_n_sp.sh', 'dv', '1.0', '2')
    out = json.load(open('eval_results/dv_sp_1.0_2_test.json'))
    stats = out['overall']
    for k in ('Div1', 'mBLeu_4', 'self_cider', 'CIDEr'):
        assert k in stats, (k, sorted(stats))
    assert any(k.startswith('oracle_') for k in stats), sorted(stats)
