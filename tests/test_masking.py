"""Property tests for T5 span masking and alignment expansion
(reference semantics: espnet2/train/collate_fn.py:290-446)."""

import numpy as np
import pytest

from a3t_tpu.masking import (
    masked_positions_from_boundary,
    phones_masking,
    random_spans_noise_mask,
    segment_positions,
)
from a3t_tpu.masking.alignment import duration_reduction
from a3t_tpu.masking.spans import span_counts


def _spans_of(mask):
    """List of (start, end) runs of True."""
    spans = []
    in_span = False
    for i, v in enumerate(mask):
        if v and not in_span:
            start, in_span = i, True
        elif not v and in_span:
            spans.append((start, i))
            in_span = False
    if in_span:
        spans.append((start, len(mask)))
    return spans


def test_span_counts_match_t5():
    # num_noise = round(L * p), clamped to [1, L-1]; spans = round(noise/mean)
    assert span_counts(100, 0.8, 8) == (80, 10)
    assert span_counts(10, 0.05, 8) == (1, 1)
    assert span_counts(10, 1.0, 1) == (9, 9)


def test_random_spans_density_and_structure(rng):
    length, p, mean = 200, 0.8, 8.0
    totals, nspans = [], []
    for _ in range(50):
        m = random_spans_noise_mask(length, p, mean, rng)
        assert m.shape == (length,)
        assert not m[0]  # alternation starts with non-noise
        spans = _spans_of(m)
        totals.append(m.sum())
        nspans.append(len(spans))
    # deterministic counts per the T5 scheme
    num_noise, num_spans = span_counts(length, p, mean)
    assert set(totals) == {num_noise}
    assert set(nspans) == {num_spans}


def test_random_spans_randomises(rng):
    masks = {random_spans_noise_mask(64, 0.5, 4, rng).tobytes() for _ in range(20)}
    assert len(masks) > 1


def test_phones_masking_expands_alignments(rng):
    # 10 phones, 5 frames each -> 50 frames
    align_start = np.arange(10) * 5
    align_end = align_start + 5
    mask = phones_masking(60, align_start, align_end, 10, 0.8, 2.0, rng)
    assert mask.shape == (60,)
    # only aligned regions can be masked; frames 50..60 are unaligned
    assert not mask[50:].any()
    # masked regions align exactly with whole phones
    for s, e in _spans_of(mask):
        assert s % 5 == 0 and e % 5 == 0


def test_phones_masking_special_cases(rng):
    align_start = np.array([0, 5])
    align_end = np.array([5, 10])
    # mlm_prob == 1 masks everything
    assert phones_masking(10, align_start, align_end, 2, 1.0, 8, rng).all()
    # < 2 phones -> nothing masked
    assert not phones_masking(10, align_start, align_end, 1, 0.8, 8, rng).any()
    # speech-only (mean span 0) uses frame spans
    m = phones_masking(300, align_start, align_end, 0, 0.15, 0, rng)
    assert 0 < m.sum() <= 0.25 * 300


def test_span_boundary_override(rng):
    m = masked_positions_from_boundary(20, np.array([3, 7, 12, 15]))
    assert m.sum() == (7 - 3) + (15 - 12)
    assert m[3:7].all() and m[12:15].all()
    # boundary wins over random masking
    m2 = phones_masking(
        20, np.array([0]), np.array([20]), 1, 0.8, 8, rng,
        span_boundary=np.array([3, 7]),
    )
    assert (m2 == masked_positions_from_boundary(20, np.array([3, 7]))).all()


def test_segment_positions():
    align_start = np.array([0, 4, 9])
    align_end = np.array([4, 9, 12])
    sp, tp = segment_positions(15, 5, align_start, align_end, 3)
    assert (sp[0:4] == 1).all()
    assert (sp[4:9] == 2).all()
    assert (sp[9:12] == 3).all()
    assert (sp[12:] == 0).all()
    np.testing.assert_array_equal(tp, [1, 2, 3, 0, 0])


def test_duration_reduction_keeps_first_frames(rng):
    align_start = np.array([0, 4, 8])
    align_end = np.array([4, 8, 12])
    masked = np.zeros(12, dtype=bool)
    masked[4:8] = True  # phone 1 masked
    reordered, durations, red_len = duration_reduction(
        12, align_start, align_end, 3, masked, 12
    )
    # phone 0 and 2 keep all frames; phone 1 reduced to its first frame
    kept = reordered[:red_len]
    np.testing.assert_array_equal(kept, [0, 1, 2, 3, 4, 8, 9, 10, 11])
    assert durations[4] == 4  # masked phone's duration recorded at first frame
    assert (durations[[0, 1, 2, 3]] == 1).all()
