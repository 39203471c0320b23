"""Keyframe database: BoW place-recognition queries.

Parity with `KeyFrameDatabase` (`KeyFrameDatabase.cc`): the reference keeps
a word->keyframe inverted index and does shared-word accumulation with two
relative gates (`DetectLoopCandidates` `:76-197`: >= 0.8x max common words,
score >= minScore, covisibility-group aggregation, >= 0.75x best group
score; `DetectRelocalizationCandidates` `:199-310`: same without the
covisibility exclusion).

TPU redesign: BoW rows live as a dense [K, W] matrix inside MapState
(kf_bow); "common words" is one boolean matmul, scores one l1-score sweep —
the inverted index disappears into dense linear algebra on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from object_slam_tpu.loop.vocabulary import l1_score


def detect_loop_candidates(kf_bow, kf_valid, query_bow, query_id,
                           covis_row, min_score):
    """Returns [K] candidate mask (the reference returns a list).

    covis_row: [K] bool — keyframes covisible with the query (excluded,
    KeyFrameDatabase.cc:84-103).
    """
    K = kf_bow.shape[0]
    eligible = kf_valid & ~covis_row & (jnp.arange(K) != query_id)

    common = jnp.sum((kf_bow > 0) & (query_bow > 0)[None, :], axis=-1)
    common = jnp.where(eligible, common, 0)
    max_common = jnp.max(common)
    word_ok = common > 0.8 * max_common

    scores = l1_score(kf_bow, query_bow[None, :])
    score_ok = scores >= min_score
    return eligible & word_ok & score_ok, scores


def aggregate_group_scores(cand_mask, scores, covis, top_n: int = 10):
    """Covisibility-group score aggregation + 0.75x-best gate
    (KeyFrameDatabase.cc:130-197). covis [K, K] int32 weights."""
    neighbor = covis > 0
    # group score of candidate k: its score + scores of its covisible
    # candidates; group best member = argmax inside the group
    member = neighbor | jnp.eye(covis.shape[0], dtype=bool)
    s = jnp.where(cand_mask, scores, 0.0)
    group_score = member @ s
    group_score = jnp.where(cand_mask, group_score, 0.0)
    best = jnp.max(group_score)
    keep = cand_mask & (group_score >= 0.75 * best)
    return keep, group_score


def detect_reloc_candidates(kf_bow, kf_valid, query_bow):
    """[K] mask of relocalization candidates (no covisibility exclusion,
    no absolute min score — relative gates only)."""
    common = jnp.sum((kf_bow > 0) & (query_bow > 0)[None, :], axis=-1)
    common = jnp.where(kf_valid, common, 0)
    max_common = jnp.maximum(jnp.max(common), 1)
    word_ok = common > 0.8 * max_common
    scores = l1_score(kf_bow, query_bow[None, :])
    return kf_valid & word_ok, scores
