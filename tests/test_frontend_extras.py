"""Pinyin frontends, zh text-normalization rules, scheduler, device util
(reference: frontend/pinyin.py, zh_normalization/*, utils/scheduler.py)."""
import pytest

from parakeet_tpu.frontend import ParakeetPinyin, ParakeetPinyinWithTone
from parakeet_tpu.frontend.zh_normalization.text_normlization import \
    TextNormalizer
from parakeet_tpu.utils.scheduler import (Constant, PieceWise, StepWise,
                                          make_scheduler)


def test_pinyin_frontend_roundtrip():
    f = ParakeetPinyin()
    phones = f.phoneticize("你好")
    assert phones == ["n", "i", "h", "au"]
    ids = f.numericalize(phones)
    assert f.reverse(ids) == phones
    assert f("你好") == ids
    assert f.vocab_size > 50


def test_pinyin_with_tone_start_end():
    f = ParakeetPinyinWithTone()
    phones = f.phoneticize("你好", add_start_end=True)
    assert phones[0] == "<s>" and phones[-1] == "</s>"
    assert any(p[-1].isdigit() for p in phones[1:-1])


@pytest.mark.parametrize("raw,expect_substr", [
    ("今天是2021年1月1日", "二零二一年"),
    ("气温-5°C", "零下五"),
    ("涨幅3.5%", "百分之三点五"),
    ("电话010-66122197", "零一零六六一二二一九七"),
])
def test_zh_textnorm_rules(raw, expect_substr):
    tn = TextNormalizer()
    out = "".join(tn.normalize(raw))
    assert expect_substr in out, f"{raw!r} -> {out!r}"


def test_schedulers():
    assert Constant(0.5)(123) == 0.5
    pw = PieceWise([(0, 0.0), (10, 1.0), (20, 3.0)])
    assert pw(0) == 0.0 and pw(5) == 0.5 and pw(15) == 2.0 and pw(99) == 3.0
    sw = StepWise([(0, 1.0), (10, 0.1), (20, 0.01)])
    assert sw(5) == 1.0 and sw(10) == 0.1 and sw(25) == 0.01
    assert isinstance(make_scheduler("constant", 2.0), Constant)


def test_timeline_import():
    from parakeet_tpu.utils import timeline
    assert callable(timeline.xplane_to_chrome_trace)


def test_erhua_merge():
    from parakeet_tpu.frontend.zh_frontend import Frontend
    f = Frontend(strict=False)
    # generic erhua: 儿 folds into the previous syllable as an r suffix
    assert f.get_phonemes("这儿")[0] == ["zh", "e4", "&r"]
    # not_erhua words keep 儿 as its own syllable (reference
    # zh_frontend.py:45-58)
    # 儿 keeps its full tone: 女儿 is not in must_neural_tone_words and
    # the neutral-suffix rule covers only 们/子 (reference
    # tone_sandhi.py:94-97)
    assert f.get_phonemes("女儿")[0] == ["n", "v3", "er2"]


def test_width_conversion_roundtrip():
    """full/half width folding (reference frontend/normalizer/width.py)."""
    from parakeet_tpu.frontend.normalizer import (full_to_half_width,
                                                  half_to_full_width)
    s = "Hello, World! 123"
    full = half_to_full_width(s)
    assert full == "Ｈｅｌｌｏ，　Ｗｏｒｌｄ！　１２３"
    assert full_to_half_width(full) == s


def test_arpabet_frontends():
    """ARPABET / ARPABETWithStress sentence frontends (reference
    arpabet.py:26-302): fixed vocab sizes (47 / 77 incl. 4 specials),
    round-trip numericalize/reverse, stress defaults."""
    from parakeet_tpu.frontend import ARPABET, ARPABETWithStress
    a = ARPABET()
    assert a.vocab_size == 47
    ph = a.phoneticize("hello, world!")
    assert "," in ph and ph[-1] == "!"
    assert a.reverse(a.numericalize(ph)) == ph
    wrapped = a.phoneticize("hi", add_start_end=True)
    assert wrapped[0] == "<s>" and wrapped[-1] == "</s>"
    assert a("hi") == a.numericalize(a.phoneticize("hi"))

    s = ARPABETWithStress()
    assert s.vocab_size == 77
    for p in s.phoneticize("hello"):
        import re as _re
        base = _re.sub(r"\d", "", p)
        from parakeet_tpu.frontend.arpabet import _VOWELS
        if base in _VOWELS:
            assert _re.search(r"[012]$", p), p
