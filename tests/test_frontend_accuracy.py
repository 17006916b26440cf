"""Frontend accuracy regression tests on labeled data.

Mirrors the reference's accuracy-harness strategy (reference:
examples/text_frontend/test_g2p.py:33-57, test_textnorm.py:31-51):
linguistic rules are regression-tested as data with corpus-level
WER/CER.  Thresholds sit slightly above the measured round-2 numbers
(zh G2P syllable WER 0.0205, zh textnorm CER 0.0102, en G2P phone WER
0.0043/0.0080 — see docs/frontend_accuracy.md) so regressions fail
loudly without flaking.
"""
import sys
from pathlib import Path

RECIPES = Path(__file__).parent.parent / "recipes" / "text_frontend"
sys.path.insert(0, str(RECIPES))


def test_textnorm_corpus_cer():
    from test_textnorm import DEFAULT_DATA, corpus_cer
    cer_val, n = corpus_cer(DEFAULT_DATA)
    assert n >= 100, f"labeled textnorm set shrank: {n}"
    assert cer_val < 0.02, f"textnorm corpus CER regressed: {cer_val:.4f}"


def test_g2p_corpus_wer():
    from test_g2p import DEFAULT_DATA, corpus_wer
    wer_val, n = corpus_wer(DEFAULT_DATA)
    assert n >= 60, f"labeled g2p set shrank: {n}"
    assert wer_val < 0.04, f"g2p corpus syllable WER regressed: {wer_val:.4f}"


def test_en_g2p_corpus_wer():
    from test_en_g2p import DEFAULT_DATA, corpus_wer
    wer_plain, n = corpus_wer(DEFAULT_DATA, stressed=False)
    assert n >= 45, f"labeled en g2p set shrank: {n}"
    assert wer_plain < 0.02, (
        f"en g2p corpus phone WER regressed: {wer_plain:.4f}")
    wer_stress, _ = corpus_wer(DEFAULT_DATA, stressed=True)
    assert wer_stress < 0.03, (
        f"en stressed g2p corpus phone WER regressed: {wer_stress:.4f}")
