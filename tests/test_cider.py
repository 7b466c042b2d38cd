"""Scorer tests: CIDEr-D against hand-derivable cases + format contracts."""

import math
import pickle

import numpy as np
import pytest

from captioning_tpu.utils.cider_scorer import Bleu, Cider, CiderD, precook
from captioning_tpu.utils import rewards


def test_precook_counts():
    length, counts = precook('1 2 1 0')
    assert length == 4
    assert counts[('1',)] == 2
    assert counts[('2',)] == 1
    assert counts[('1', '2')] == 1
    assert counts[('2', '1')] == 1
    assert counts[('1', '2', '1', '0')] == 1


def test_ciderd_identical_sentence_scores_10():
    """A candidate identical to the only ref scores 10*exp(0)=10 per the
    CIDEr-D formula when df comes from a corpus where it's unique."""
    gts = {0: ['1 2 3 0'], 1: ['4 5 6 0']}
    res = [{'image_id': 0, 'caption': ['1 2 3 0']},
           {'image_id': 1, 'caption': ['9 9 9 0']}]
    scorer = CiderD(df='corpus')
    mean, scores = scorer.compute_score(gts, res)
    assert abs(scores[0] - 10.0) < 1e-6
    assert scores[1] < 2.0  # only shares the eos unigram (df=2 -> idf=0)


def test_ciderd_cached_df(tmp_path):
    # cache with ref_len=4 and some doc frequencies
    df = {('1',): 2.0, ('2',): 1.0, ('1', '2'): 1.0, ('0',): 4.0,
          ('2', '0'): 1.0, ('1', '2', '0'): 1.0}
    p = tmp_path / 'toy-idxs.p'
    with open(p, 'wb') as f:
        pickle.dump({'document_frequency': df, 'ref_len': 4}, f, protocol=2)
    scorer = CiderD(df=str(p))
    gts = {0: ['1 2 0']}
    res = [{'image_id': 0, 'caption': ['1 2 0']}]
    _, scores = scorer.compute_score(gts, res)
    # identical candidate, same df vector -> cosine 1 per n with any nonzero
    # norm; n=4 has zero norm on both sides -> contributes 0
    # tfidf weights: log(4/2), log(4/1), log(4/4)=0 ...
    # unigram norm > 0, bigram norm > 0, trigram norm > 0, 4gram = 0
    assert abs(scores[0] - 10.0 * 3 / 4) < 1e-6


def test_get_self_critical_reward_structure():
    rewards.CiderD_scorer = CiderD(df='corpus')
    rewards.Bleu_scorer = Bleu(4)

    class Opt:
        cider_reward_weight = 1
        bleu_reward_weight = 0

    greedy = np.array([[1, 2, 0, 0], [3, 4, 0, 0]])
    gen = np.array([[1, 2, 0, 0], [1, 2, 3, 0],
                    [3, 4, 0, 0], [9, 9, 9, 9]])
    gts = [np.array([[1, 2, 0, 0]]), np.array([[3, 4, 5, 0]])]
    r = rewards.get_self_critical_reward(greedy, gts, gen, Opt())
    assert r.shape == (4, 4)
    # reward broadcast over time
    assert (r == r[:, :1]).all()
    # exact-match sample should beat its greedy baseline sibling (= itself)
    assert abs(r[0, 0]) < 1e-6  # sample 0 == greedy 0 -> reward 0
    rewards.CiderD_scorer = None
    rewards.Bleu_scorer = None


def test_bleu_perfect_match():
    b = Bleu(4)
    gts = {0: ['a b c d e']}
    res = {0: ['a b c d e']}
    corpus, per_n = b.compute_score(gts, res)
    for n in range(4):
        assert abs(corpus[n] - 1.0) < 1e-6


def test_self_cider_gram_matrix():
    scorer = Cider(df='corpus')
    # build df from refs first
    gts = {0: ['1 2 3 0', '4 5 6 0']}
    res = [{'image_id': 0, 'caption': ['1 2 3 0']}]
    scorer.compute_score(gts, res)  # populates df
    scorer.df_mode = 'cached'
    G = scorer.my_self_cider([['1 2 3 0', '1 2 3 0', '7 8 9 0']])[0]
    assert G.shape == (3, 3)
    assert abs(G[0, 1] - G[0, 0]) < 1e-6  # identical sentences
    assert G[0, 2] <= G[0, 0] + 1e-6
