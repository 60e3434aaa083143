"""Binary bag-of-words place recognition, TPU-native.

Replaces the vendored DBoW2 stack (/root/reference/Thirdparty/DBoW2 —
TemplatedVocabulary tree + BowVector/FeatureVector, used via
ORBVocabulary::transform src/Frame.cc:495-507 and the KeyFrameDatabase
inverted file src/KeyFrameDatabase.cc:67-270).

Design differences, deliberate:
  * The vocabulary is trained in-system on the engine's own BRIEF pattern
    (the reference ships a 1M-word offline ORBvoc binary, absent from the
    mirror); hierarchical k-medians (bit-majority medians) builds the tree.
  * Lookup walks the hierarchy (greedy per-level Hamming argmin, DBoW2
    semantics) in packed-bit numpy: depth x k comparisons per descriptor,
    so cost is independent of the vocabulary size — required at the
    reference's 10^5..10^6-word scale. It runs at keyframe rate only. A
    flat chunked device argmin (WordLookup) remains for legacy
    vocabularies saved without the tree.
  * Keyframe BoW vectors are stored SPARSE (per-KF word ids + tf-idf
    weights, `BowIndex.add_keyframe`): at 10^5-word vocabularies a dense
    [max_kf, W] table would be ~GBs. Similarity is the DBoW2 L1 score
    s(v,w) = 1 - 0.5*|v-w|_1, evaluated for a dense query vector against
    all keyframes' sparse rows as one gather + segment reduction.
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
    # hierarchical lookup tree (DBoW2 semantics: greedy per-level argmin,
    # depth x k comparisons per descriptor instead of W — required at the
    # reference's 10^5..10^6-word scale where a flat argmin is O(N*W)).
    # tree_centers [I,k,32]: packed child centers of internal node i;
    # tree_child [I,k]: >=0 internal child index, <0 encodes leaf word
    # -(w+1). tree_root: root code. None = legacy flat-lookup vocabulary.
    tree_centers: Optional[np.ndarray] = None
    tree_child: Optional[np.ndarray] = None
    tree_root: int = 0

    @property
    def n_words(self):
        return len(self.words)


_POPCOUNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                          axis=1).sum(axis=1).astype(np.uint8)


def _hamming_np(packed_a, packed_b, block=131072):
    """[M,32] x [K,32] packed-bit Hamming distances in pure numpy — the
    tree build calls k-medians on thousands of node sizes; a jitted
    distance kernel would compile per distinct shape (measured: the L=5
    train ran out of a 2-hour budget on exactly that). Row-blocked to
    bound the [block,K,32] intermediate."""
    M = len(packed_a)
    out = np.empty((M, len(packed_b)), np.int32)
    for i in range(0, M, block):
        x = np.bitwise_xor(packed_a[i: i + block, None, :],
                           packed_b[None, :, :])
        out[i: i + block] = _POPCOUNT[x].sum(axis=2, dtype=np.int32)
    return out


def _kmedians(desc, k, rng, iters=8):
    """Binary k-medians (majority-bit medians). desc [M,256] uint8 0/1."""
    M = len(desc)
    if M <= k:
        return desc.copy(), np.arange(M) % max(len(desc), 1)
    centers = desc[rng.choice(M, k, replace=False)].astype(np.uint8)
    assign = np.zeros(M, np.int64)
    packed = np.packbits(desc, axis=1)
    for _ in range(iters):
        d = _hamming_np(packed, np.packbits(centers, axis=1))
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
    tree_centers = []   # [k,32] packed child centers per internal node
    tree_child = []     # [k] child codes per internal node

    # FeatureVector grouping depth: ancestor node at depth 2 (<=k^2 groups)
    # — the analog of DBoW2's transform(..., levelsup=4) for the k=10 L=6
    # ORBvoc, where grouping nodes also sit at depth L-levelsup=2
    # (Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:423-438,
    # src/Frame.cc:498)
    gd = min(2, depth - 1) if depth > 1 else 0

    def add_leaf(bits, group):
        leaves.append(bits)
        group_of_leaf.append(group)
        return -(len(leaves) - 1) - 1   # leaf code

    def split(idx, level, group):
        """Returns the node's code: >=0 internal index, <0 leaf."""
        if level == depth or len(idx) <= branching:
            bits = ((desc[idx].mean(axis=0) > 0.5).astype(np.uint8)
                    if len(idx) else np.zeros(256, np.uint8))
            return add_leaf(bits, group)
        centers, assign = _kmedians(desc[idx], branching, rng)
        my = len(tree_centers)
        tree_centers.append(np.packbits(centers, axis=1))
        tree_child.append(np.zeros(branching, np.int32))
        for c in range(len(centers)):
            sub = idx[assign == c]
            g = group * branching + c if level < gd else group
            if len(sub) == 0:
                tree_child[my][c] = add_leaf(centers[c], g)
            else:
                tree_child[my][c] = split(sub, level + 1, g)
        return my

    tree_root = split(np.arange(len(desc)), 0, 0)
    words = np.stack(leaves)
    groups = np.array(group_of_leaf, np.int32)
    t_cent = (np.stack(tree_centers) if tree_centers
              else np.zeros((0, branching, 32), np.uint8))
    t_child = (np.stack(tree_child) if tree_child
               else np.zeros((0, branching), np.int32))

    # idf from training assignment through the TREE (numpy; the flat
    # argmin is O(M*W) — unusable at 10^5 words x 10^6 descriptors)
    W = len(words)
    pre = Vocabulary(words=words, groups=groups,
                     idf=np.ones(W, np.float32), branching=branching,
                     depth=depth, tree_centers=t_cent, tree_child=t_child,
                     tree_root=int(tree_root))
    wa = assign_words_tree(desc, np.ones(len(desc), bool), pre)
    if doc_ids is None:
        doc_ids = np.zeros(len(desc), np.int64)
    n_docs = max(int(doc_ids.max()) + 1, 1)
    seen = np.zeros((n_docs, W), bool)
    seen[doc_ids, wa] = True
    df = seen.sum(axis=0)
    idf = np.log(n_docs / np.maximum(df, 1)).astype(np.float32) + 1.0
    return pre._replace(idf=idf)


def assign_words_tree(desc01, valid, vocab: "Vocabulary"):
    """Descriptor -> word by greedy tree descent (DBoW2
    TemplatedVocabulary::transform semantics, Thirdparty/DBoW2/DBoW2/
    TemplatedVocabulary.h:423-438): depth levels of k-way Hamming argmin.
    Pure numpy (packed-bit popcount) — fast on host at any W, and only
    runs at keyframe rate."""
    desc01 = np.asarray(desc01, np.uint8)
    valid = np.asarray(valid, bool)
    packed = np.packbits(desc01, axis=1)
    N = len(packed)
    code = np.full(N, vocab.tree_root, np.int64)
    for _ in range(vocab.depth):
        active = np.nonzero(code >= 0)[0]
        if len(active) == 0:
            break
        nodes = code[active].astype(np.int64)
        cent = vocab.tree_centers[nodes]               # [n,k,32]
        x = np.bitwise_xor(packed[active][:, None, :], cent)
        d = _POPCOUNT[x].sum(axis=2, dtype=np.int32)   # [n,k]
        c = d.argmin(axis=1)
        code[active] = vocab.tree_child[nodes, c]
    wid = np.where(code < 0, -code - 1, 0)
    return np.where(valid, wid, -1).astype(np.int64)


# ------------------------------------------------------------- persistence
def save_vocabulary(vocab: Vocabulary, path: str):
    """Persist a trained vocabulary, bits packed (the reference ships the
    1M-word ORBvoc.bin the same way, src/System.cc:186-191). Vocabularies
    with a hierarchical lookup tree store it alongside; legacy flat
    vocabularies store words/idf only."""
    if vocab.tree_centers is not None and len(vocab.tree_centers):
        np.savez_compressed(
            path, words_packed=np.packbits(vocab.words, axis=1),
            groups=vocab.groups, idf=vocab.idf,
            meta=np.array([vocab.branching, vocab.depth], np.int64),
            tree_centers=vocab.tree_centers, tree_child=vocab.tree_child,
            tree_root=np.int64(vocab.tree_root))
        return
    np.savez_compressed(
        path, words_packed=np.packbits(vocab.words, axis=1),
        groups=vocab.groups, idf=vocab.idf,
        meta=np.array([vocab.branching, vocab.depth], np.int64))


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    words = np.unpackbits(z["words_packed"], axis=1)[:, :256].astype(np.uint8)
    tree = {}
    if "tree_centers" in z:
        tree = dict(tree_centers=np.array(z["tree_centers"]),
                    tree_child=np.array(z["tree_child"]),
                    tree_root=int(z["tree_root"]))
    return Vocabulary(words=words, groups=np.array(z["groups"]),
                      idf=np.array(z["idf"]), branching=int(z["meta"][0]),
                      depth=int(z["meta"][1]), **tree)


def default_vocabulary_path() -> str:
    import os
    return os.path.join(os.path.dirname(__file__), "..", "data",
                        "orb_vocab.npz")


WORD_CHUNK = 4096   # words per device chunk in the flat-argmin lookup
DESC_PAD = 2048     # descriptor batch bucket (fixed shape -> one compile)


@jax.jit
def _assign_words_chunked(desc_bits, valid, words3, n_words):
    """Nearest word over a [C, WORD_CHUNK, 256] chunked word table by a
    running-min lax.scan — never materializes the [N, W] distance matrix
    (W = 10^5 words x N = 2048 descriptors would be ~1.6 GB)."""
    N = desc_bits.shape[0]
    Wc = words3.shape[1]

    def body(carry, wc_base):
        best_d, best_i = carry
        wc, base = wc_base
        d = hamming_matrix(desc_bits, wc)                       # [N, Wc]
        # mask padding words past the true vocabulary size
        pad = (base + jnp.arange(Wc)) >= n_words
        d = d + pad[None, :] * 1e9
        i = jnp.argmin(d, axis=1)
        dm = jnp.take_along_axis(d, i[:, None], axis=1)[:, 0]
        upd = dm < best_d
        best_i = jnp.where(upd, (base + i).astype(jnp.int32), best_i)
        best_d = jnp.minimum(best_d, dm)
        return (best_d, best_i), None

    C = words3.shape[0]
    bases = jnp.arange(C, dtype=jnp.int32) * Wc
    (bd, bi), _ = jax.lax.scan(
        body, (jnp.full((N,), jnp.inf), jnp.zeros(N, jnp.int32)),
        (words3, bases))
    return jnp.where(valid, bi, -1)


class WordLookup:
    """Device-side descriptor -> word assignment for arbitrary vocabulary
    sizes (fixed-shape chunks; compiles once)."""

    def __init__(self, words: np.ndarray):
        self.n_words = len(words)
        C = (self.n_words + WORD_CHUNK - 1) // WORD_CHUNK
        padded = np.zeros((C * WORD_CHUNK, 256), np.uint8)
        padded[: self.n_words] = words
        self._words3 = jnp.asarray(padded.reshape(C, WORD_CHUNK, 256))

    def assign(self, desc_bits, valid):
        """[N,256] 0/1 -> word ids [N] (-1 where invalid)."""
        n = len(desc_bits)
        out = np.empty(n, np.int32)
        for s in range(0, n, DESC_PAD):
            m = min(DESC_PAD, n - s)
            db = np.zeros((DESC_PAD, 256), np.uint8)
            vl = np.zeros(DESC_PAD, bool)
            db[:m] = desc_bits[s: s + m]
            vl[:m] = valid[s: s + m]
            wid = _assign_words_chunked(jnp.asarray(db), jnp.asarray(vl),
                                        self._words3,
                                        jnp.int32(self.n_words))
            out[s: s + m] = np.asarray(wid)[:m]
        return out


class BowIndex:
    """Quantization + SPARSE tf-idf keyframe database (reference
    KeyFrameDatabase: DetectLoop/RelocalizationCandidates). Each keyframe
    stores only its own word ids + weights ([max_feat] padded), so memory is
    independent of the vocabulary size — required at the reference-scale
    ~10^5..10^6 words where dense [K, W] vectors would need GBs."""

    def __init__(self, vocab: Vocabulary, max_kf: int = 256,
                 max_feat: int = 1024):
        self.vocab = vocab
        # tree descent when the vocabulary carries its hierarchy (cost
        # independent of W); flat device argmin only for legacy files
        self._lookup = (None if (vocab.tree_centers is not None
                                 and len(vocab.tree_centers))
                        else WordLookup(vocab.words))
        self.F = max_feat
        self.kf_wid = np.full((max_kf, max_feat), -1, np.int32)
        self.kf_w = np.zeros((max_kf, max_feat), np.float32)
        # per-feature word ids (aligned with the KF's feature slots) for
        # FeatureVector-gated SearchByBoW
        self.kf_feat_word = np.full((max_kf, max_feat), -1, np.int32)
        self.kf_valid = np.zeros(max_kf, bool)

    def quantize(self, desc_bits, valid):
        """desc [N,256] 0/1 -> (word_ids [N], bow) where bow is the sparse
        L1-normalized tf-idf pair (uids [<=N], weights). `bow` is treated as
        opaque by callers (pass to add_keyframe/scores/candidates)."""
        if self._lookup is None:
            wid = assign_words_tree(desc_bits, valid, self.vocab)
        else:
            wid = self._lookup.assign(np.asarray(desc_bits),
                                      np.asarray(valid))
        ids = wid[wid >= 0]
        uids, counts = np.unique(ids, return_counts=True)
        w = counts.astype(np.float32) * self.vocab.idf[uids]
        n = w.sum()
        if n > 0:
            w /= n
        return wid, (uids.astype(np.int32), w)

    def add_keyframe(self, kf_id: int, bow, feat_wid=None):
        while kf_id >= len(self.kf_valid):   # grow with the map
            n = len(self.kf_valid)
            self.kf_wid = np.concatenate(
                [self.kf_wid, np.full((n, self.F), -1, np.int32)])
            self.kf_w = np.concatenate(
                [self.kf_w, np.zeros((n, self.F), np.float32)])
            self.kf_feat_word = np.concatenate(
                [self.kf_feat_word, np.full((n, self.F), -1, np.int32)])
            self.kf_valid = np.concatenate(
                [self.kf_valid, np.zeros(n, bool)])
        uids, w = bow
        m = min(len(uids), self.F)
        self.kf_wid[kf_id] = -1
        self.kf_w[kf_id] = 0.0
        self.kf_wid[kf_id, :m] = uids[:m]
        self.kf_w[kf_id, :m] = w[:m]
        if feat_wid is not None:
            fm = min(len(feat_wid), self.F)
            self.kf_feat_word[kf_id] = -1
            self.kf_feat_word[kf_id, :fm] = feat_wid[:fm]
        self.kf_valid[kf_id] = True

    def feat_groups(self, kf_id: int):
        """Per-feature-slot FeatureVector group ids for keyframe `kf_id`
        (-1 where unquantized)."""
        fw = self.kf_feat_word[kf_id]
        return np.where(fw >= 0, self.vocab.groups[np.maximum(fw, 0)], -1)

    def groups_of(self, wid):
        """Word ids [N] -> group ids [N] (-1 passthrough)."""
        wid = np.asarray(wid)
        return np.where(wid >= 0, self.vocab.groups[np.maximum(wid, 0)], -1)

    def scores(self, bow):
        """DBoW2 L1 similarity s = 1 - 0.5|v-w|_1 of a query against ALL
        stored KFs, computed over word intersections only:
        s = sum_{i in both} (v_i + w_i - |v_i - w_i|) / 2."""
        uids, w = bow
        W = self.vocab.n_words
        q = np.zeros(W + 1, np.float32)     # [+1] slot for padding gathers
        q[uids] = w
        kw = self.kf_wid
        qv = q[np.where(kw >= 0, kw, W)]
        s = 0.5 * (self.kf_w + qv - np.abs(self.kf_w - qv)).sum(axis=1)
        s[~self.kf_valid] = 0.0
        return s

    def common_words(self, bow):
        uids, _ = bow
        W = self.vocab.n_words
        qm = np.zeros(W + 1, bool)
        qm[uids] = True
        kw = self.kf_wid
        return (qm[np.where(kw >= 0, kw, W)]).sum(axis=1)

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
