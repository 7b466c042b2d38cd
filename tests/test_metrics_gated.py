"""Jar-gated metric plumbing (SPICE / AllSPICE / METEOR) with mocked jars.

No Java lives in this image, so the subprocess plumbing is exercised with
Python scripts standing in for the jars (a ``.py`` "jar" path runs under
the current interpreter — see utils/spice.py / utils/meteor.py). With the
jars absent the metrics must skip cleanly and METEOR must be reported
under the honest ``METEOR_approx`` key.
"""

import json
import os

import numpy as np
import pytest

FAKE_SPICE = r'''
import json, sys
args = sys.argv[1:]
inp = args[0]
out = args[args.index('-out') + 1]
data = json.load(open(inp))
results = []
for item in data:
    n = len(item['test'].split())
    f = min(1.0, n / 10.0)
    cat = lambda v: {'f': v, 'pr': v, 're': v, 'numImages': 1}
    results.append({'image_id': item['image_id'],
                    'scores': {'All': cat(f), 'Object': cat(f * 0.9),
                               'Relation': cat(float('nan'))}})
json.dump(results, open(out, 'w'))
'''

FAKE_METEOR = r'''
import sys
for line in sys.stdin:
    line = line.strip()
    if line.startswith('SCORE'):
        # stats vector derived from the test length
        n = len(line.split('|||')[-1].split())
        print('%d 1 1 1' % n)
        sys.stdout.flush()
    elif line.startswith('EVAL'):
        stats = line.split(' ||| ')[1:]
        for s in stats:
            print('%.4f' % (min(1.0, int(s.split()[0]) / 10.0)))
        print('0.5')
        sys.stdout.flush()
        break
'''


@pytest.fixture
def fake_jars(tmp_path, monkeypatch):
    spice = tmp_path / 'spice-1.0.py'
    spice.write_text(FAKE_SPICE)
    meteor = tmp_path / 'meteor-1.5.py'
    meteor.write_text(FAKE_METEOR)
    monkeypatch.setenv('SPICE_JAR', str(spice))
    monkeypatch.setenv('METEOR_JAR', str(meteor))
    return spice, meteor


@pytest.fixture
def no_jars(monkeypatch):
    monkeypatch.delenv('SPICE_JAR', raising=False)
    monkeypatch.delenv('METEOR_JAR', raising=False)


GTS = {1: ['a man riding a horse', 'a person on a horse'],
       2: ['a cat sitting on a couch', 'a cat on the sofa']}
RES = {1: ['a man riding a horse'], 2: ['a dog on a couch']}


def test_spice_scorer_plumbing(fake_jars):
    from captioning_tpu.utils.spice import SpiceScorer, find_spice_jar
    assert find_spice_jar() is not None
    mean, scores = SpiceScorer().compute_score(GTS, RES)
    assert len(scores) == 2
    assert set(scores[0].keys()) == {'All', 'Object', 'Relation'}
    assert 0 <= mean <= 1
    assert scores[0]['All']['f'] == 0.5  # 5 words / 10


def test_meteor_scorer_plumbing(fake_jars):
    from captioning_tpu.utils.meteor import MeteorScorer, find_meteor_jar
    assert find_meteor_jar() is not None
    scorer = MeteorScorer()
    mean, scores = scorer.compute_score(GTS, RES)
    scorer.close()
    assert mean == 0.5
    assert len(scores) == 2
    assert scores[0] == 0.5  # 5-word test


def test_evaluate_captions_with_jars(fake_jars):
    from captioning_tpu.utils.coco_eval import evaluate_captions
    overall, img = evaluate_captions(GTS, RES)
    assert 'SPICE' in overall and 'METEOR' in overall
    assert 'METEOR_approx' not in overall
    assert 'SPICE' in img[1] and isinstance(img[1]['SPICE'], dict)


def test_evaluate_captions_without_jars(no_jars):
    from captioning_tpu.utils.coco_eval import evaluate_captions
    overall, img = evaluate_captions(GTS, RES)
    assert 'METEOR_approx' in overall
    assert 'METEOR' not in overall
    assert 'SPICE' not in overall
    # exact hypothesis scores higher than a partial match
    assert img[1]['METEOR_approx'] > img[2]['METEOR_approx'] > 0


def _annotations(tmp_path):
    ann = {'annotations': [
        {'image_id': 1, 'caption': 'a man riding a horse'},
        {'image_id': 1, 'caption': 'a person on a horse'},
        {'image_id': 2, 'caption': 'a cat sitting on a couch'},
        {'image_id': 2, 'caption': 'a cat on the sofa'}]}
    p = tmp_path / 'ann.json'
    p.write_text(json.dumps(ann))
    return str(p)


def test_language_eval_spice_breakdown(fake_jars, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from captioning_tpu.utils.eval_utils import language_eval
    preds = [{'image_id': 1, 'caption': 'a man riding a horse',
              'perplexity': 1.0, 'entropy': 1.0},
             {'image_id': 2, 'caption': 'a dog on a couch',
              'perplexity': 1.0, 'entropy': 1.0}]
    out = language_eval(_annotations(tmp_path), preds, [],
                        {'id': 'jt', 'eval_oracle': 0}, 'val')
    assert 'SPICE' in out and 'METEOR' in out
    # per-category breakdown, nan categories averaged over non-nan only;
    # all-NaN categories become explicit None (no empty-slice warning)
    assert 'SPICE_Object' in out and np.isfinite(out['SPICE_Object'])
    assert out.get('SPICE_Relation', None) is None


def test_allspice_with_jar(fake_jars, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from captioning_tpu.utils.eval_multi import eval_allspice
    preds_n = [{'image_id': 1, 'caption': 'a man riding a horse'},
               {'image_id': 1, 'caption': 'a person rides'},
               {'image_id': 2, 'caption': 'a dog on a couch'},
               {'image_id': 2, 'caption': 'a cat sits'}]
    import warnings
    with warnings.catch_warnings():
        # the all-NaN 'Relation' category must not warn (empty-slice mean)
        warnings.simplefilter('error', RuntimeWarning)
        out = eval_allspice(_annotations(tmp_path), preds_n, 'jt', 'val')
    assert out is not None
    assert 'AllSPICE' in out['overall']
    assert 'AllSPICE_Object' in out['overall']
    # fake jar reports Relation as NaN for every image -> explicit None +
    # skip record instead of a nan mean
    assert out['overall']['AllSPICE_Relation'] is None
    assert out['overall']['AllSPICE_skipped_categories'] == ['Relation']
    assert 1 in out['imgToEvalAllSPICE']
    # two captions joined -> 7 words (incl. ' . ') -> f = 0.9 on 'a man
    # riding a horse . a person rides' (11 tokens -> capped at 1.0)
    assert 0 < out['overall']['AllSPICE'] <= 1.0


def test_allspice_without_jar(no_jars):
    from captioning_tpu.utils.eval_multi import eval_allspice
    assert eval_allspice('x.json', [], 'jt', 'val') is None


def test_porter_stemmer_caption_vocab():
    from captioning_tpu.utils.stemmer import porter_stem
    # final outputs of the original Porter algorithm
    assert porter_stem('riding') == 'ride'
    assert porter_stem('skiing') == 'ski'
    assert porter_stem('horses') == 'hors'
    assert porter_stem('sitting') == 'sit'
    assert porter_stem('covered') == 'cover'
    assert porter_stem('happiness') == 'happi'


def test_meteor_approx_stem_match(no_jars):
    from captioning_tpu.utils.coco_eval import meteor_like
    # 'riding' vs 'rides' only match through the stem stage
    s_stem = meteor_like('a man riding', ['a man rides'])
    s_none = meteor_like('a man jumping', ['a man rides'])
    s_exact = meteor_like('a man rides', ['a man rides'])
    assert s_exact > s_stem > s_none
