"""Levenshtein word/char error rates.

Equivalent of the reference metrics (reference:
parakeet/utils/error_rate.py:69-239) used to regression-test the text
frontends (G2P / textnorm accuracy, SURVEY.md §4.6).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

__all__ = ["levenshtein", "word_errors", "char_errors", "wer", "cer"]


def levenshtein(ref: Sequence, hyp: Sequence) -> int:
    """Edit distance with O(min(m,n)) memory."""
    m, n = len(ref), len(hyp)
    if m == 0:
        return n
    if n == 0:
        return m
    if m < n:
        ref, hyp = hyp, ref
        m, n = n, m
    prev = np.arange(n + 1, dtype=np.int64)
    cur = np.empty(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        cur[0] = i
        for j in range(1, n + 1):
            sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1])
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub)
        prev, cur = cur, prev
    return int(prev[n])


def word_errors(reference: str, hypothesis: str, ignore_case: bool = False,
                delimiter: str = " ") -> Tuple[int, int]:
    if ignore_case:
        reference, hypothesis = reference.lower(), hypothesis.lower()
    ref_words = [w for w in reference.split(delimiter) if w]
    hyp_words = [w for w in hypothesis.split(delimiter) if w]
    return levenshtein(ref_words, hyp_words), len(ref_words)


def char_errors(reference: str, hypothesis: str, ignore_case: bool = False,
                remove_space: bool = False) -> Tuple[int, int]:
    if ignore_case:
        reference, hypothesis = reference.lower(), hypothesis.lower()
    join = "" if remove_space else " "
    reference = join.join(reference.split())
    hypothesis = join.join(hypothesis.split())
    return levenshtein(reference, hypothesis), len(reference)


def wer(reference: str, hypothesis: str, ignore_case: bool = False,
        delimiter: str = " ") -> float:
    edits, n = word_errors(reference, hypothesis, ignore_case, delimiter)
    if n == 0:
        raise ValueError("empty reference")
    return edits / n


def cer(reference: str, hypothesis: str, ignore_case: bool = False,
        remove_space: bool = False) -> float:
    edits, n = char_errors(reference, hypothesis, ignore_case, remove_space)
    if n == 0:
        raise ValueError("empty reference")
    return edits / n
