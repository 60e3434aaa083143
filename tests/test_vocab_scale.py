"""Shipped offline vocabulary at scale: retrieval quality over hundreds of
distinct views and BoW-index growth past its initial capacity (VERDICT
round-1 gaps: 512-word toy vocab aliases; index capacity fixed at init)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.backend.bow import (BowIndex, load_vocabulary,
                                 default_vocabulary_path)
from ygz_tpu.frontend.extractor import OrbExtractor
from ygz_tpu.ops.image import build_pyramid
from ygz_tpu.geometry import lie

from synthetic import SmoothScene, StepScene

VOCAB = default_vocabulary_path()


def _view_desc(extractor, scene, R, t):
    pyr = build_pyramid(jnp.asarray(scene.render(R, t), jnp.float32), 4, 2.0)
    f = extractor(pyr)
    return np.asarray(f.desc), np.asarray(f.valid)


def test_shipped_vocab_loads():
    assert os.path.exists(VOCAB), "run tools/train_vocab.py"
    v = load_vocabulary(VOCAB)
    assert v.n_words > 5000, v.n_words
    assert v.words.shape[1] == 256
    assert np.isfinite(v.idf).all()


@pytest.mark.slow
def test_loop_retrieval_over_300_views():
    """300+ views along a long sweep across two scenes: a revisit query must
    retrieve its true neighborhood, and the index must grow past its initial
    capacity without OOB."""
    vocab = load_vocabulary(VOCAB)
    index = BowIndex(vocab, max_kf=64)   # forces growth at 64, 128, 256
    extractor = OrbExtractor(n_features=512, n_levels=4, scale_factor=2.0,
                             fast_th=20.0, fast_th_min=7.0, mode="grid")

    scenes = [SmoothScene(seed=41, tex_size=2400),
              StepScene(seed=42, tex_size=2400)]
    N = 320
    views = []
    for i in range(N):
        scene = scenes[(i // 40) % 2]
        yaw = 0.02 * np.sin(i * 0.3)
        R = np.asarray(lie.so3_exp(jnp.asarray(
            np.array([0.0, yaw, 0.0], np.float32))))
        c = np.array([0.035 * (i % 160), 0.1 * np.sin(i * 0.17), 0.0],
                     np.float32)
        t = (-R @ c).astype(np.float32)
        views.append((scene, R, t))
        desc, valid = _view_desc(extractor, scene, R, t)
        _, bow = index.quantize(desc, valid)
        index.add_keyframe(i, bow)

    assert len(index.kf_valid) >= N         # grew, no OOB
    assert index.kf_valid[:N].all()

    # queries: re-render near early views with small pose offsets; the top
    # retrieval (excluding trivially-adjacent ids) must land within +-40/160
    # of the true revisit location (the sweep repeats every 160 ids)
    hits = 0
    for qi in (10, 50, 90, 130):
        scene, R, t = views[qi]
        t2 = t + np.array([0.01, 0.005, 0.0], np.float32)
        desc, valid = _view_desc(extractor, scene, R, t2)
        _, bow = index.quantize(desc, valid)
        exclude = set(range(max(0, qi - 12), qi + 13))
        cands = index.loop_candidates(bow, min_score=0.0, exclude=exclude,
                                      max_candidates=3)
        good = [c for c in cands
                if abs((c % 160) - (qi % 160)) <= 40
                and (c // 40) % 2 == (qi // 40) % 2]
        hits += bool(good)
    assert hits >= 3, f"only {hits}/4 revisit queries retrieved correctly"


@pytest.mark.slow
def test_retrieval_precision_recall_1000_kfs():
    """1000-keyframe database (VERDICT r2 #5): 500 distinct places inserted
    twice (revisit pass with a perturbed pose), then perturbed queries of
    sampled places. Top-1 retrieval must land on the queried place (either
    pass) with high precision, and the true place must appear in the top-3
    candidate set (recall)."""
    vocab = load_vocabulary(VOCAB)
    index = BowIndex(vocab, max_kf=256)      # growth to 1024 exercised
    extractor = OrbExtractor(n_features=512, n_levels=4, scale_factor=2.0,
                             fast_th=20.0, fast_th_min=7.0, mode="grid")

    n_places = 500
    scenes = [SmoothScene(seed=70 + s, tex_size=2400) for s in range(2)] + \
             [StepScene(seed=80 + s, tex_size=2400) for s in range(2)]

    def place_pose(p, jitter):
        rng = np.random.default_rng(9000 + p * 7 + jitter)
        yaw = 0.03 * np.sin(p * 0.11) + (0.004 * rng.standard_normal()
                                         if jitter else 0.0)
        R = np.asarray(lie.so3_exp(jnp.asarray(
            np.array([0.0, yaw, 0.0], np.float32))))
        c = np.array([0.05 * (p % 125), 0.25 * np.sin(p * 0.23), 0.0],
                     np.float32)
        if jitter:
            c = c + rng.normal(0.0, 0.008, 3).astype(np.float32)
        return scenes[p // 125], R, (-R @ c).astype(np.float32)

    bows = {}
    for ins in range(2):                       # two passes -> 1000 KFs
        for p in range(n_places):
            scene, R, t = place_pose(p, jitter=ins)
            desc, valid = _view_desc(extractor, scene, R, t)
            _, bow = index.quantize(desc, valid)
            index.add_keyframe(ins * n_places + p, bow)
    assert index.kf_valid[: 2 * n_places].all()

    queries = range(3, n_places, 29)           # ~18 sampled places
    top1_hits = top3_hits = n_q = 0
    for p in queries:
        scene, R, t = place_pose(p, jitter=2)
        desc, valid = _view_desc(extractor, scene, R, t)
        _, bow = index.quantize(desc, valid)
        cands = index.reloc_candidates(bow, max_candidates=3)
        n_q += 1
        # same scene strip, within +-3 positions (~15 cm), either pass
        def is_true(c):
            cp = c % n_places
            return (cp // 125 == p // 125) and abs(cp - p) <= 3
        if cands and is_true(cands[0]):
            top1_hits += 1
        if any(is_true(c) for c in cands):
            top3_hits += 1
    assert top1_hits >= 0.8 * n_q, \
        f"top-1 precision {top1_hits}/{n_q} at 1000 KFs"
    assert top3_hits >= 0.9 * n_q, \
        f"top-3 recall {top3_hits}/{n_q} at 1000 KFs"


@pytest.mark.slow
def test_retrieval_precision_10000_kfs():
    """10,000-keyframe database (VERDICT r5 #6): does the shipped k=10 L=5
    vocabulary (99,478 words — one tree level below the reference ORBvoc's
    ~10^6) still discriminate at the multi-thousand-KF scale where a
    10^5-word vocabulary starts to saturate?

    Protocol: 250 rendered places inserted twice (500 real entries with
    place identity) + 9,500 DISTRACTOR keyframes whose descriptor sets are
    bootstrap-resampled mixtures of the real views' descriptors — the same
    word-frequency statistics as real imagery (a far harder distractor
    than random bits, which quantize to rare words) but no coherent place.
    Perturbed-pose queries of sampled places must still retrieve the true
    place through the 9,500-entry haystack."""
    vocab = load_vocabulary(VOCAB)
    index = BowIndex(vocab, max_kf=256)        # growth to 16384 exercised
    extractor = OrbExtractor(n_features=512, n_levels=4, scale_factor=2.0,
                             fast_th=20.0, fast_th_min=7.0, mode="grid")

    n_places = 250
    n_distractors = 9500
    scenes = [SmoothScene(seed=70, tex_size=2400),
              StepScene(seed=80, tex_size=2400)]

    def place_pose(p, jitter):
        rng = np.random.default_rng(9000 + p * 7 + jitter)
        yaw = 0.03 * np.sin(p * 0.11) + (0.004 * rng.standard_normal()
                                         if jitter else 0.0)
        R = np.asarray(lie.so3_exp(jnp.asarray(
            np.array([0.0, yaw, 0.0], np.float32))))
        c = np.array([0.05 * (p % 125), 0.25 * np.sin(p * 0.23), 0.0],
                     np.float32)
        if jitter:
            c = c + rng.normal(0.0, 0.008, 3).astype(np.float32)
        return scenes[p // 125], R, (-R @ c).astype(np.float32)

    pool = []
    for ins in range(2):                       # 500 real entries
        for p in range(n_places):
            scene, R, t = place_pose(p, jitter=ins)
            desc, valid = _view_desc(extractor, scene, R, t)
            _, bow = index.quantize(desc, valid)
            index.add_keyframe(ins * n_places + p, bow)
            if ins == 0:
                pool.append(desc[valid])
    pool = np.concatenate(pool)                # ~100k real descriptors

    rng = np.random.default_rng(4)
    for d in range(n_distractors):
        sel = rng.integers(0, len(pool), 512)
        desc = pool[sel]
        _, bow = index.quantize(desc, np.ones(512, bool))
        index.add_keyframe(2 * n_places + d, bow)
    n_total = 2 * n_places + n_distractors
    assert index.kf_valid[:n_total].all()

    queries = range(3, n_places, 13)           # ~19 sampled places
    top1_hits = top3_hits = n_q = 0
    for p in queries:
        scene, R, t = place_pose(p, jitter=2)
        desc, valid = _view_desc(extractor, scene, R, t)
        _, bow = index.quantize(desc, valid)
        cands = index.reloc_candidates(bow, max_candidates=3)
        n_q += 1

        def is_true(c):
            if c >= 2 * n_places:
                return False                   # a distractor won
            cp = c % n_places
            return (cp // 125 == p // 125) and abs(cp - p) <= 3
        if cands and is_true(cands[0]):
            top1_hits += 1
        if any(is_true(c) for c in cands):
            top3_hits += 1
    assert top1_hits >= 0.8 * n_q, \
        f"top-1 precision {top1_hits}/{n_q} at {n_total} KFs"
    assert top3_hits >= 0.9 * n_q, \
        f"top-3 recall {top3_hits}/{n_q} at {n_total} KFs"
