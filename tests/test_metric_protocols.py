"""Replay tests for the real METEOR/SPICE wire formats (VERDICT item 7).

The fake jars in test_metrics_gated.py exercise the subprocess plumbing
with simplified responses.  These tests validate the protocol code against
the REAL formats: METEOR 1.5's ``-stdio`` session (``SCORE ||| refs... |||
hyp`` → 23-float stats vector; ``EVAL ||| stats...`` → per-segment scores
+ final aggregate, in that order) and SPICE's JSON contract (input list of
``{image_id, test, refs}``, argv ``<input> -cache <dir> -out <file>
-subset -silent``, output list of ``{image_id, scores: {All/Object/...:
{pr, re, f}}}`` where Java serializes NaN as the string ``"NaN"``).

The emulated jars VALIDATE every incoming byte against the real grammar
(exit non-zero on deviation) and reply with transcript lines shaped
exactly like real METEOR 1.5 / SPICE 1.0 output, so a parser or writer
drift fails loudly without Java in the image.
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier (subprocesses): see pytest.ini

# --- METEOR -----------------------------------------------------------------
# A strict emulation of meteor-1.5.jar in -stdio mode.  Replies use the
# real shapes: 23 space-delimited floats per stats line (the en parameter
# file's feature count), '%.*f'-style segment scores, final aggregate.
STRICT_METEOR = r'''
import re, sys, hashlib

def fail(msg):
    sys.stderr.write('protocol violation: %s\n' % msg)
    sys.exit(3)

# real invocation: meteor-1.5.jar - - -stdio -l en -norm
if sys.argv[1:] != ['-', '-', '-stdio', '-l', 'en', '-norm']:
    fail('argv %r' % (sys.argv[1:],))

def stats_for(line):
    # deterministic 23-float stats vector, like MeteorStats.toString()
    h = int(hashlib.md5(line.encode()).hexdigest(), 16)
    vals = [((h >> (4 * i)) & 0xF) + 1.0 for i in range(23)]
    return ' '.join('%.1f' % v for v in vals)

issued = []
for raw in sys.stdin:
    line = raw.rstrip('\n')
    if line.startswith('SCORE ||| '):
        if '\r' in line:
            fail('carriage return in SCORE line')
        parts = line.split(' ||| ')
        if len(parts) < 3:
            fail('SCORE needs >=1 ref + hyp: %r' % line)
        for seg in parts[1:]:
            if '|||' in seg or '  ' in seg:
                fail('unsanitized segment %r' % seg)
        st = stats_for(line)
        issued.append(st)
        print(st)
        sys.stdout.flush()
    elif line.startswith('EVAL ||| '):
        stats = line[len('EVAL ||| '):].split(' ||| ')
        if stats != issued:
            fail('EVAL must echo the issued stats verbatim and in order:'
                 ' got %r want %r' % (stats, issued))
        segs = []
        for st in stats:
            vals = [float(x) for x in st.split()]
            segs.append(sum(vals) / (100.0 * len(vals)))
        for s in segs:
            print('%.10f' % s)
        print('%.10f' % (sum(segs) / len(segs)))
        sys.stdout.flush()
        break
    else:
        fail('unknown line %r' % line)
'''


@pytest.fixture
def strict_meteor_jar(tmp_path, monkeypatch):
    jar = tmp_path / 'meteor-1.5.py'
    jar.write_text(STRICT_METEOR)
    monkeypatch.setenv('METEOR_JAR', str(jar))
    return str(jar)


def test_meteor_stdio_protocol_replay(strict_meteor_jar):
    from captioning_tpu.utils.meteor import MeteorScorer
    gts = {7: ['a man riding a horse', 'a person on a horse'],
           3: ['a cat sitting on a couch', 'a cat on the sofa'],
           9: ['three ||| pipes', 'double  spaces  here']}
    res = {7: ['a man rides a horse'],
           3: ['a dog on a couch'],
           9: ['a ||| weird  hypothesis']}
    scorer = MeteorScorer()
    try:
        mean, scores = scorer.compute_score(gts, res)
    finally:
        scorer.close()
    assert len(scores) == 3
    # per-segment scores come back in res-key order, final line last
    assert mean == pytest.approx(float(np.mean(scores)), abs=1e-9)
    assert all(0 < s < 1 for s in scores)


def test_meteor_sanitizes_separator_and_double_spaces(strict_meteor_jar):
    # '|||' and double spaces inside captions must be stripped before they
    # reach the jar (the strict jar exits 3 otherwise and readline returns
    # '', so any leak surfaces as a crash here)
    from captioning_tpu.utils.meteor import MeteorScorer
    gts = {1: ['bad ||| ref', 'ok ref']}
    res = {1: ['bad ||| hyp  with  spaces']}
    scorer = MeteorScorer()
    try:
        mean, scores = scorer.compute_score(gts, res)
    finally:
        scorer.close()
    assert len(scores) == 1 and 0 < mean < 1


# --- SPICE ------------------------------------------------------------------
# Emulates spice-1.0.jar: validates argv + input schema, writes output in
# the real shape (7 categories; Java Gson serializes NaN as string "NaN").
STRICT_SPICE = r'''
import json, sys

def fail(msg):
    sys.stderr.write('protocol violation: %s\n' % msg)
    sys.exit(3)

args = sys.argv[1:]
if len(args) != 7:
    fail('argv len %d: %r' % (len(args), args))
inp = args[0]
if args[1] != '-cache' or args[3] != '-out' or args[5:] != ['-subset', '-silent']:
    fail('argv shape %r' % args)
out = args[4]

data = json.load(open(inp))
if not isinstance(data, list):
    fail('input must be a list')
CATS = ['All', 'Relation', 'Cardinality', 'Attribute', 'Size', 'Color',
        'Object']
results = []
for item in data:
    if set(item.keys()) != {'image_id', 'test', 'refs'}:
        fail('item keys %r' % sorted(item.keys()))
    if not isinstance(item['test'], str) or not isinstance(item['refs'], list):
        fail('bad field types')
    if len(item['refs']) < 1:
        fail('empty refs')
    n = len(item['test'].split())
    scores = {}
    for ci, cat in enumerate(CATS):
        f = min(1.0, (n + ci) / 20.0)
        if cat in ('Size', 'Color'):
            scores[cat] = {'pr': 'NaN', 're': 'NaN', 'f': 'NaN',
                           'numImages': 1}
        else:
            scores[cat] = {'pr': f, 're': f, 'f': f, 'numImages': 1}
    results.append({'image_id': item['image_id'], 'scores': scores})
json.dump(results, open(out, 'w'))
'''


@pytest.fixture
def strict_spice_jar(tmp_path, monkeypatch):
    jar = tmp_path / 'spice-1.0.py'
    jar.write_text(STRICT_SPICE)
    monkeypatch.setenv('SPICE_JAR', str(jar))
    return str(jar)


def test_spice_json_contract_replay(strict_spice_jar):
    from captioning_tpu.utils.spice import SpiceScorer
    gts = {11: ['a man riding a horse', 'a person on a horse'],
           22: ['a cat sitting on a couch']}
    res = {11: ['a man rides a brown horse'], 22: ['a dog on a couch']}
    mean, scores = SpiceScorer().compute_score(gts, res)
    assert len(scores) == 2
    cats = {'All', 'Relation', 'Cardinality', 'Attribute', 'Size', 'Color',
            'Object'}
    assert set(scores[0].keys()) == cats
    # "NaN" strings from Java must parse to float nan, not crash
    assert np.isnan(scores[0]['Size']['f'])
    assert np.isfinite(scores[0]['All']['f'])
    assert mean == pytest.approx(
        float(np.mean([s['All']['f'] for s in scores])))


def test_spice_multi_sentence_allspice_input(strict_spice_jar):
    # AllSPICE semantics: n captions joined ' . ' into ONE test string
    from captioning_tpu.utils.spice import SpiceScorer
    gts = {5: ['a man riding a horse']}
    res = {5: ['a man on a horse', 'a person rides']}
    mean, scores = SpiceScorer().compute_score(gts, res)
    # 'a man on a horse . a person rides' = 9 words -> All f = 9/20
    assert scores[0]['All']['f'] == pytest.approx(0.45)
