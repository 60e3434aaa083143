"""Binary bag-of-words place recognition, TPU-native.

Replaces the vendored DBoW2 stack (/root/reference/Thirdparty/DBoW2 —
TemplatedVocabulary tree + BowVector/FeatureVector, used via
ORBVocabulary::transform src/Frame.cc:495-507 and the KeyFrameDatabase
inverted file src/KeyFrameDatabase.cc:67-270).

Design differences, deliberate:
  * The vocabulary is trained in-system on the engine's own BRIEF pattern
    (the reference ships a 1M-word offline ORBvoc binary, absent from the
    mirror); hierarchical k-medians (bit-majority medians) builds the tree.
  * Lookup is FLAT on device: descriptor-to-word assignment is one
    [N,256]x[256,W] ±1 matmul + argmin over all leaf words — on the MXU this
    beats walking a 6-level tree, so the hierarchy is kept only for training
    and for the FeatureVector grouping (ancestor at `levelsup`,
    SearchByBoW's candidate-gating semantics).
  * BoW vectors are dense [W] tf-idf, L1-normalized; similarity is the DBoW2
    L1 score s(v,w) = 1 - 0.5*|v-w|_1, computed for a query against ALL
    keyframes as one broadcasted reduction.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.matching import hamming_matrix


class Vocabulary(NamedTuple):
    words: np.ndarray      # [W,256] uint8 leaf centers (bits)
    groups: np.ndarray     # [W] int32 ancestor id at the grouping level
    idf: np.ndarray        # [W] float32
    branching: int
    depth: int

    @property
    def n_words(self):
        return len(self.words)


def _kmedians(desc, k, rng, iters=8):
    """Binary k-medians (majority-bit medians). desc [M,256] uint8 0/1."""
    M = len(desc)
    if M <= k:
        return desc.copy(), np.arange(M) % max(len(desc), 1)
    centers = desc[rng.choice(M, k, replace=False)].astype(np.uint8)
    assign = np.zeros(M, np.int64)
    for _ in range(iters):
        d = np.asarray(hamming_matrix(jnp.asarray(desc), jnp.asarray(centers)))
        assign = d.argmin(axis=1)
        for c in range(k):
            sel = desc[assign == c]
            if len(sel):
                centers[c] = (sel.mean(axis=0) > 0.5).astype(np.uint8)
    return centers, assign


def train_vocabulary(desc, branching: int = 10, depth: int = 3,
                     seed: int = 0, doc_ids=None) -> Vocabulary:
    """Hierarchical k-medians over training descriptors [M,256] (0/1).

    doc_ids: optional [M] image ids for idf statistics (uniform otherwise).
    """
    rng = np.random.default_rng(seed)
    desc = np.asarray(desc, np.uint8)
    leaves = []
    group_of_leaf = []

    def split(idx, level, group):
        if level == depth or len(idx) <= branching:
            leaves.append((desc[idx].mean(axis=0) > 0.5).astype(np.uint8)
                          if len(idx) else np.zeros(256, np.uint8))
            group_of_leaf.append(group)
            return
        centers, assign = _kmedians(desc[idx], branching, rng)
        for c in range(len(centers)):
            sub = idx[assign == c]
            # group id = top-level child index (levelsup grouping analog)
            g = c if level == 0 else group
            if len(sub) == 0:
                leaves.append(centers[c])
                group_of_leaf.append(g)
            else:
                split(sub, level + 1, g)

    split(np.arange(len(desc)), 0, 0)
    words = np.stack(leaves)
    groups = np.array(group_of_leaf, np.int32)

    # idf from training assignment (chunked: M x W would not fit for the
    # offline 10^4-word vocabulary trained on 10^5+ descriptors)
    W = len(words)
    words_dev = jnp.asarray(words)
    wa = np.empty(len(desc), np.int64)
    B = 4096
    for i in range(0, len(desc), B):
        d = np.asarray(hamming_matrix(jnp.asarray(desc[i: i + B]), words_dev))
        wa[i: i + B] = d.argmin(axis=1)
    if doc_ids is None:
        doc_ids = np.zeros(len(desc), np.int64)
    n_docs = max(int(doc_ids.max()) + 1, 1)
    seen = np.zeros((n_docs, W), bool)
    seen[doc_ids, wa] = True
    df = seen.sum(axis=0)
    idf = np.log(n_docs / np.maximum(df, 1)).astype(np.float32) + 1.0
    return Vocabulary(words=words, groups=groups, idf=idf,
                      branching=branching, depth=depth)


# ------------------------------------------------------------- persistence
def save_vocabulary(vocab: Vocabulary, path: str):
    """Persist a trained vocabulary (bits packed: a 10^4-word tree is
    ~0.4 MB — the reference ships the 1M-word ORBvoc.bin the same way,
    src/System.cc:186-191)."""
    np.savez_compressed(
        path, words_packed=np.packbits(vocab.words, axis=1),
        groups=vocab.groups, idf=vocab.idf,
        meta=np.array([vocab.branching, vocab.depth], np.int64))


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    words = np.unpackbits(z["words_packed"], axis=1)[:, :256].astype(np.uint8)
    return Vocabulary(words=words, groups=np.array(z["groups"]),
                      idf=np.array(z["idf"]), branching=int(z["meta"][0]),
                      depth=int(z["meta"][1]))


def default_vocabulary_path() -> str:
    import os
    return os.path.join(os.path.dirname(__file__), "..", "data",
                        "orb_vocab.npz")


@functools.partial(jax.jit, static_argnames=())
def _assign_words(desc_bits, valid, words_bits):
    d = hamming_matrix(desc_bits, words_bits, valid1=valid)
    wid = jnp.argmin(d, axis=1).astype(jnp.int32)
    return jnp.where(valid, wid, -1)


class BowIndex:
    """Quantization + dense tf-idf vectors + the keyframe database
    (reference KeyFrameDatabase: DetectLoop/RelocalizationCandidates)."""

    def __init__(self, vocab: Vocabulary, max_kf: int = 256):
        self.vocab = vocab
        self._words_dev = jnp.asarray(vocab.words)
        W = vocab.n_words
        self.kf_vec = np.zeros((max_kf, W), np.float32)
        self.kf_words = np.zeros((max_kf, W), bool)
        self.kf_valid = np.zeros(max_kf, bool)

    def quantize(self, desc_bits, valid):
        """desc [N,256] 0/1 -> (word_ids [N], bow [W] L1-normalized tfidf)."""
        wid = np.asarray(_assign_words(jnp.asarray(desc_bits),
                                       jnp.asarray(valid), self._words_dev))
        W = self.vocab.n_words
        bow = np.zeros(W, np.float32)
        ids = wid[wid >= 0]
        np.add.at(bow, ids, 1.0)
        bow *= self.vocab.idf
        n = bow.sum()
        if n > 0:
            bow /= n
        return wid, bow

    def add_keyframe(self, kf_id: int, bow, word_mask=None):
        while kf_id >= len(self.kf_valid):   # grow with the map
            n, W = self.kf_vec.shape
            self.kf_vec = np.concatenate(
                [self.kf_vec, np.zeros((n, W), np.float32)])
            self.kf_words = np.concatenate(
                [self.kf_words, np.zeros((n, W), bool)])
            self.kf_valid = np.concatenate(
                [self.kf_valid, np.zeros(n, bool)])
        self.kf_vec[kf_id] = bow
        self.kf_words[kf_id] = bow > 0 if word_mask is None else word_mask
        self.kf_valid[kf_id] = True

    def scores(self, bow):
        """L1 similarity of a query against all stored KFs: [max_kf]."""
        diff = np.abs(self.kf_vec - bow[None, :]).sum(axis=1)
        s = 1.0 - 0.5 * diff
        s[~self.kf_valid] = 0.0
        return s

    def common_words(self, bow):
        q = bow > 0
        return (self.kf_words & q[None, :]).sum(axis=1)

    def reloc_candidates(self, bow, max_candidates: int = 5):
        """DetectRelocalizationCandidates semantics (0.5*maxCommonWords gate
        then score ranking, src/KeyFrameDatabase.cc:180-270)."""
        cw = self.common_words(bow)
        if cw.max() == 0:
            return []
        th = 0.5 * cw.max()
        s = self.scores(bow)
        cand = np.nonzero((cw >= th) & self.kf_valid)[0]
        cand = cand[np.argsort(-s[cand])]
        return [int(c) for c in cand[:max_candidates]]

    def loop_candidates(self, bow, min_score: float, exclude,
                        max_candidates: int = 5):
        """DetectLoopCandidates: common words >= 0.8*max, score >= minScore,
        excluding the query's covisible set (src/KeyFrameDatabase.cc:67-178)."""
        cw = self.common_words(bow)
        mask = self.kf_valid.copy()
        mask[list(exclude)] = False
        cw = np.where(mask, cw, 0)
        if cw.max() == 0:
            return []
        s = self.scores(bow)
        ok = (cw >= 0.8 * cw.max()) & (s >= min_score) & mask
        cand = np.nonzero(ok)[0]
        cand = cand[np.argsort(-s[cand])]
        return [int(c) for c in cand[:max_candidates]]
