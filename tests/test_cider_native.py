"""Native C++ CIDEr-D must match the Python scorer exactly."""

import numpy as np
import pytest

from tests.util_synth import build_synthetic_dataset


@pytest.fixture(scope='module')
def native():
    mod = pytest.importorskip('captioning_tpu.utils.cider_native')
    if mod._load_lib() is None:
        pytest.skip('native cider library could not be built')
    return mod


def test_native_matches_python(native, tmp_path):
    ds = build_synthetic_dataset(str(tmp_path / 'synth'))
    from captioning_tpu.utils.cider_scorer import CiderD
    from captioning_tpu.utils.rewards import array_to_str

    py = CiderD(df=ds.cached_tokens)
    nat = native.NativeCiderD(ds.cached_tokens)

    rng = np.random.RandomState(0)
    B, n, L = 4, 3, 7
    gen = rng.randint(0, ds.vocab_size + 1, (B * n, L)).astype(np.int32)
    gts = [rng.randint(1, ds.vocab_size + 1, (rng.randint(2, 5), 6))
           for _ in range(B)]
    for g in gts:
        g[:, -1] = 0  # eos-terminated refs

    # python path
    res = [{'image_id': i, 'caption': [array_to_str(gen[i])]}
           for i in range(B * n)]
    gts_map = {i: [array_to_str(g[j]) for j in range(len(g))]
               for i, g in enumerate(gts)}
    gts_for = {i: gts_map[i // n] for i in range(B * n)}
    _, py_scores = py.compute_score(gts_for, res)

    # native path
    ref_rows, offsets = [], [0]
    for g in gts:
        ref_rows.extend(list(g))
        offsets.append(offsets[-1] + len(g))
    refs = np.stack(ref_rows).astype(np.int32)
    groups = np.repeat(np.arange(B, dtype=np.int32), n)
    nat_scores = nat.score(gen, refs, np.asarray(offsets, np.int64), groups)

    assert np.allclose(py_scores, nat_scores, atol=1e-8), \
        np.abs(py_scores - nat_scores).max()


def test_native_self_critical_reward(native, tmp_path):
    ds = build_synthetic_dataset(str(tmp_path / 'synth2'), seed=1)
    from captioning_tpu.utils import rewards
    from captioning_tpu.utils.cider_scorer import CiderD

    rewards.CiderD_scorer = CiderD(df=ds.cached_tokens)
    nat = native.NativeCiderD(ds.cached_tokens)

    class Opt:
        cider_reward_weight = 1
        bleu_reward_weight = 0

    rng = np.random.RandomState(1)
    B, n, L = 3, 2, 7
    greedy = rng.randint(0, ds.vocab_size + 1, (B, L))
    gen = rng.randint(0, ds.vocab_size + 1, (B * n, L))
    gts = [rng.randint(1, ds.vocab_size + 1, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0

    ref_reward = rewards.get_self_critical_reward(greedy, gts, gen, Opt())
    nat_reward = native.native_self_critical_reward(nat, greedy, gts, gen)
    assert np.allclose(ref_reward, nat_reward, atol=1e-6)
    rewards.CiderD_scorer = None
