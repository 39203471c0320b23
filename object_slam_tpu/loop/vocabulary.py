"""Hierarchical binary vocabulary (the DBoW2 replacement).

The reference links DBoW2's `TemplatedVocabulary` (ORBvoc.txt, ~1M-node
tree loaded at `System.cc:69`; `transform` called at `Frame.cc:640`,
`KeyFrame.cc:59`) for BoW place recognition. That vocabulary file is not
vendored (`README.md:51`), so compatibility is not required — we train our
own hierarchical k-medians tree over binary ORB descriptors.

TPU redesign:
  * Training (host/one-time): k-medians with bit-majority voting per
    cluster — numpy, seconds for 10^4 leaves.
  * The tree is stored as dense level-major center tables
    `centers[level][n_parents * k, 8]u32`, so `transform` is L rounds of
    a batched Hamming argmin over k children — pure gather/popcount,
    vmappable over all N descriptors of a frame at once (the tree descent
    of DBoW2 without pointer chasing).
  * BoW vectors are dense [W] tf (or tf-idf) rows; similarity is the
    DBoW2 L1 score  s(v, w) = 1 - 0.5 * || v/|v| - w/|w| ||_1  computed
    for ALL keyframes in one [K, W] x [W] sweep.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def _popcount_np(x):
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _hamming_np(a, b):
    """[M, 8]u32 x [C, 8]u32 -> [M, C] int."""
    x = a[:, None, :] ^ b[None, :, :]
    return _popcount_np(x.reshape(x.shape[0], x.shape[1], -1))


def _bit_majority(descs):
    """[M, 8]u32 -> [8]u32 bitwise majority."""
    bits = np.unpackbits(descs.view(np.uint8), axis=-1)   # [M, 256]
    maj = (bits.sum(0) * 2 >= bits.shape[0]).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


def _kmedians(descs, k, rng, iters=8):
    """Binary k-medians. Returns centers [k, 8]u32, assignment [M]."""
    M = descs.shape[0]
    if M <= k:
        centers = np.zeros((k, 8), np.uint32)
        centers[:M] = descs
        return centers, np.arange(M) % k
    centers = descs[rng.choice(M, k, replace=False)]
    assign = np.zeros(M, np.int64)
    for _ in range(iters):
        d = _hamming_np(descs, centers)
        assign = d.argmin(1)
        for c in range(k):
            sel = descs[assign == c]
            if len(sel):
                centers[c] = _bit_majority(sel)
            else:  # re-seed empty cluster
                centers[c] = descs[rng.randint(M)]
    return centers, assign


class Vocabulary:
    """branching^depth-word tree with level-major center tables."""

    def __init__(self, centers: List[np.ndarray], idf: np.ndarray):
        self.branching = centers[0].shape[0]
        self.depth = len(centers)
        self.n_words = self.branching ** self.depth
        # device tables: level l has branching^(l+1) centers
        self.centers = [jnp.asarray(c) for c in centers]
        self.idf = jnp.asarray(idf, jnp.float32)
        self._transform = jax.jit(self._transform_impl)

    # ------------------------------------------------------------------
    @staticmethod
    def train(descs: np.ndarray, branching: int = 10, depth: int = 3,
              seed: int = 0) -> "Vocabulary":
        """descs [M, 8]u32 training pool."""
        rng = np.random.RandomState(seed)
        k = branching
        centers = []
        # level 0
        c0, assign = _kmedians(descs, k, rng)
        centers.append(c0)
        parents = assign
        for level in range(1, depth):
            n_parent = k ** level
            cl = np.zeros((n_parent * k, 8), np.uint32)
            new_assign = np.zeros_like(parents)
            for p in range(n_parent):
                sel = np.nonzero(parents == p)[0]
                if len(sel) == 0:
                    continue
                cp, ap = _kmedians(descs[sel], k, rng)
                cl[p * k:(p + 1) * k] = cp
                new_assign[sel] = p * k + ap
            centers.append(cl)
            parents = new_assign
        # idf from training distribution
        n_words = k ** depth
        counts = np.bincount(parents, minlength=n_words).astype(np.float64)
        idf = np.log(max(len(descs), 1) / np.maximum(counts, 1.0))
        return Vocabulary(centers, idf)

    @staticmethod
    def load_dbow2_text(path: str) -> "Vocabulary":
        """Load a DBoW2 text vocabulary (the ORBvoc.txt format consumed at
        `System.cc:69` via `ORBVocabulary::loadFromTextFile`).

        Format: header line `k L scoring weighting`, then one line per
        node in creation order: `parentId isLeaf b0 .. b31 weight`.
        The tree is re-laid into this class's dense complete-k-ary
        level-major tables; missing children (clusters that split into
        fewer than k) are filled with a duplicate of their first sibling,
        which argmin-descent never prefers over the original (first
        occurrence wins ties), so descent behavior is preserved. Word ids
        are leaf positions in the complete tree — internally consistent,
        not DBoW2's leaf-order numbering (only relative scores matter).
        """
        with open(path) as f:
            header = f.readline().split()
            k, depth = int(header[0]), int(header[1])
            parent_ids, descs, weights = [], [], []
            for line in f:
                v = line.split()
                if len(v) < 35:
                    continue
                parent_ids.append(int(v[0]))
                descs.append([int(x) for x in v[2:34]])
                weights.append(float(v[34]))
        parent_ids = np.asarray(parent_ids, np.int64)
        descs = np.asarray(descs, np.uint8).view(np.uint32).reshape(-1, 8)
        weights = np.asarray(weights)

        # node ids: 0 = implicit root, file row i = node i+1
        n_nodes = len(parent_ids) + 1
        children = [[] for _ in range(n_nodes)]
        for i, p in enumerate(parent_ids):
            children[p].append(i + 1)

        centers = [np.zeros((k ** (l + 1), 8), np.uint32)
                   for l in range(depth)]
        idf = np.zeros(k ** depth)

        def place(node, level, slot, desc_row, weight):
            """Write node's center at centers[level][slot] and lay out its
            subtree. Early leaves (isLeaf before the bottom level) and
            short sibling lists pad with duplicates — argmin descent picks
            the first of equal-distance candidates, so duplicates are
            unreachable and behavior is preserved."""
            centers[level][slot] = descs[desc_row]
            if level == depth - 1:
                idf[slot] = weight
                return
            kids = children[node] if node >= 0 else []
            if not kids:          # early leaf: propagate itself downward
                place(-1, level + 1, slot * k, desc_row, weight)
                for ci in range(1, k):
                    centers[level + 1][slot * k + ci] = descs[desc_row]
                return
            for ci, c in enumerate(kids[:k]):
                place(c, level + 1, slot * k + ci,
                      c - 1, weights[c - 1])
            for ci in range(len(kids), k):   # pad with first sibling
                first = kids[0]
                centers[level + 1][slot * k + ci] = descs[first - 1]

        roots = children[0]
        for ci, c in enumerate(roots[:k]):
            place(c, 0, ci, c - 1, weights[c - 1])
        for ci in range(len(roots), k):
            if roots:
                centers[0][ci] = descs[roots[0] - 1]
        return Vocabulary(centers, idf)

    def save_dbow2_text(self, path: str):
        """Write this vocabulary in the DBoW2 text format (ORBvoc.txt):
        header `k L scoring weighting`, then `parentId isLeaf b0..b31 w`
        per node in level-major order. scoring=0 (L1), weighting=0
        (TF-IDF) — DBoW2's defaults for ORB vocabularies."""
        k, depth = self.branching, self.depth
        # node id of (level, slot): root=0, then level-major
        offset = [1]
        for l in range(depth):
            offset.append(offset[-1] + k ** (l + 1))

        def node_id(level, slot):
            return offset[level] + slot

        idf = np.asarray(self.idf)
        with open(path, "w") as f:
            f.write(f"{k} {depth} 0 0\n")
            for l in range(depth):
                c = np.asarray(self.centers[l]).view(np.uint8)
                for s in range(k ** (l + 1)):
                    parent = 0 if l == 0 else node_id(l - 1, s // k)
                    is_leaf = 1 if l == depth - 1 else 0
                    w = idf[s] if is_leaf else 0.0
                    bytes_str = " ".join(str(int(b)) for b in c[s])
                    f.write(f"{parent} {is_leaf} {bytes_str} {w}\n")

    @staticmethod
    def train_random(branching: int = 10, depth: int = 3, seed: int = 0,
                     n_train: int = 20000) -> "Vocabulary":
        """Seeded random-descriptor vocabulary — a structure-only stand-in
        until a corpus-trained vocabulary is loaded (the tree is valid for
        any binary descriptors; discriminativeness is lower)."""
        rng = np.random.RandomState(seed)
        descs = rng.randint(0, 2 ** 32, (n_train, 8), np.uint64).astype(np.uint32)
        return Vocabulary.train(descs, branching, depth, seed)

    # ------------------------------------------------------------------
    def _transform_impl(self, desc, valid):
        """desc [N, 8]u32 -> (word [N] int32, bow [W] f32 tf-idf, L1-normed)."""
        k = self.branching
        N = desc.shape[0]
        node = jnp.zeros((N,), jnp.int32)     # parent index at current level
        for level in range(self.depth):
            cl = self.centers[level]          # [n_parent*k, 8]
            cand = node[:, None] * k + jnp.arange(k)[None, :]   # [N, k]
            cd = cl[cand]                     # [N, k, 8]
            dist = jnp.sum(jax.lax.population_count(cd ^ desc[:, None, :]),
                           axis=-1)
            node = cand[jnp.arange(N), jnp.argmin(dist, axis=1)]
        word = node
        tf = jax.ops.segment_sum(valid.astype(jnp.float32),
                                 jnp.clip(word, 0, self.n_words - 1),
                                 num_segments=self.n_words)
        bow = tf * self.idf
        bow = bow / jnp.maximum(jnp.sum(jnp.abs(bow)), 1e-9)
        return jnp.where(valid, word, -1), bow

    def transform(self, desc, valid):
        return self._transform(desc, valid)

    def content_key(self) -> str:
        """Stable digest of the tree content, for jit-cache keys: id()-
        based keys are only collision-safe while the cache itself pins
        the object alive (ADVICE r3)."""
        if getattr(self, "_content_key", None) is None:
            import hashlib
            import numpy as _np
            h = hashlib.sha1()
            for c in self.centers:
                h.update(_np.asarray(c).tobytes())
            h.update(_np.asarray(self.idf).tobytes())
            self._content_key = h.hexdigest()
        return self._content_key


def l1_score(bow_a, bow_b):
    """DBoW2 L1 similarity: 1 - 0.5 * ||a - b||_1 for L1-normalized inputs.
    bow_a [..., W], bow_b [..., W] -> [...]."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(bow_a - bow_b), axis=-1)
