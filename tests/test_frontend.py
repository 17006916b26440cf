"""Text frontend tests (EN + ZH), host-side pure python.

Mirrors the reference's frontend accuracy harness idea (SURVEY.md §4.6)
with deterministic rule assertions instead of labeled corpora.
"""
# -*- coding: utf-8 -*-

from parakeet_tpu.frontend import (English, EnglishCharacter, Frontend,
                                   TextNormalizer, Vocab, generate_lexicon,
                                   normalize_en, syllable_to_phones)
from parakeet_tpu.frontend.normalizer.numbers import (number_to_words,
                                                      ordinal_to_words)
from parakeet_tpu.frontend.tone_sandhi import ToneSandhi
from parakeet_tpu.frontend.zh_normalization.num import num2str


def test_vocab_specials_and_lookup():
    v = Vocab(["a", "b", "c"])
    assert v.padding_index == 0 and v.unk_index == 1
    assert v.lookup("a") == 4
    assert v.lookup("zzz") == v.unk_index
    assert v.reverse(v.lookup("b")) == "b"
    assert len(v) == 7


def test_english_number_expansion():
    assert number_to_words(0) == "zero"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234567) == (
        "one million two hundred thirty-four thousand five hundred "
        "sixty-seven")
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(22) == "twenty-second"
    assert ordinal_to_words(30) == "thirtieth"


def test_en_normalize_pipeline():
    out = normalize_en("Dr. Smith bought 3 apples for $2.50!")
    assert out == ("doctor smith bought three apples for two dollars "
                   "fifty cents!")


def test_english_character_frontend():
    fe = EnglishCharacter()
    ids = fe("Hello!")
    assert len(ids) == 6
    assert fe.reverse(ids) == list("hello!")


def test_english_arpabet_frontend():
    fe = English()
    phones = fe.phoneticize("cat")
    assert phones == ["K", "AE", "T"]
    assert all(isinstance(i, int) for i in fe("the cat sat"))


def test_zh_num2str():
    assert num2str("0") == "零"
    assert num2str("15") == "十五"
    assert num2str("105") == "一百零五"
    assert num2str("10005") == "一万零五"
    assert num2str("3.14") == "三点一四"
    assert num2str("100000000") == "一亿"


def test_zh_textnorm_rules():
    tn = TextNormalizer()
    assert "二零二一年三月十五日" in tn.normalize_sentence("2021年3月15日")
    # ℃/°C read plain 度; only the written word 摄氏度 reads as such
    # (reference quantifier.py:36)
    assert "零下三度" in tn.normalize_sentence("-3℃")
    assert "零下三摄氏度" in tn.normalize_sentence("-3摄氏度")
    assert "百分之三点五" in tn.normalize_sentence("3.5%")
    assert "三分之二" in tn.normalize_sentence("2/3")
    assert "两个" in tn.normalize_sentence("2个")
    assert "八点三十分" in tn.normalize_sentence("08:30")
    # phone digits read 1 as 一 (the labeled set's convention; the
    # reference's 幺 mismatches its own labels)
    assert "一三九" in tn.normalize_sentence("13912345678")
    # score colons with score context / not-a-time pairs (r5)
    assert "三十七比十六" in tn.normalize_sentence("比分测试37:16")
    assert "十七比十六" in tn.normalize_sentence("比分17:16")
    # arithmetic operands are cardinals; bare digit strings stay
    # digit-by-digit
    assert "一百二十三加四百五十六" in tn.normalize_sentence("123加456")
    assert "九八五" in tn.normalize_sentence("985")


def test_pinyin_lexicon_conventions():
    assert syllable_to_phones("zhuang1") == ["zh", "uang1"]
    assert syllable_to_phones("yue4") == ["y", "ve4"]
    assert syllable_to_phones("zi3") == ["z", "ii3"]
    assert syllable_to_phones("shi4") == ["sh", "iii4"]
    assert syllable_to_phones("bo1") == ["b", "uo1"]
    assert syllable_to_phones("yao4") == ["y", "au4"]
    assert syllable_to_phones("er2") == ["er2"]
    assert syllable_to_phones("huar1") == ["h", "ua1", "&r"]
    lex = generate_lexicon(with_tone=True, with_erhua=False)
    assert lex["liu2"] == "l iou2"
    assert lex["jun1"] == "j vn1"


def test_tone_sandhi_rules():
    ts = ToneSandhi()
    # 不 + tone4 -> bu2
    assert ts.modified_tone("不对", "d", ["u4", "uei4"])[0] == "u2"
    # 一 + tone4 -> yi2
    assert ts.modified_tone("一样", "d", ["i1", "iang4"])[0] == "i2"
    # 一 + tone3 -> yi4
    assert ts.modified_tone("一起", "d", ["i1", "i3"])[0] == "i4"
    # 3-3 -> 2-3
    assert ts.modified_tone("你好", "l", ["i3", "au3"]) == ["i2", "au3"]
    # particle neutralization
    assert ts.modified_tone("好的", "u", ["au3", "e4"])[1] == "e5"


def test_zh_frontend_end_to_end():
    fe = Frontend(strict=False)
    out = fe.get_input_ids("你好，今天是2021年。")
    assert out["phones"], "no phones produced"
    phones = out["phones"][0]
    assert "sp" in phones or len(phones) > 4
    # 你好 third-tone sandhi: first syllable tone 2
    assert phones[0] == "n" and phones[1] == "i2"


def test_zh_frontend_unknown_chars_no_crash():
    """strict=False G2P yields [] for unknown chars; the cross-word
    sandhi pass must treat that like a pause, not index into it
    (round-4 review regression: IndexError on 我鼾鼾)."""
    fe = Frontend(strict=False)
    out = fe.get_input_ids("我鼾鼾")
    assert out["phones"] is not None
    # the known monosyllable still comes through
    assert any(p.startswith("uo") or p == "w" for p in out["phones"][0])


def test_tone_sandhi_restored_data():
    """The full reference word lists are carried (VERDICT round-1 item 2)."""
    from parakeet_tpu.frontend._sandhi_data import (
        MUST_NEURAL_TONE_WORDS, MUST_NOT_NEURAL_TONE_WORDS)
    assert len(MUST_NEURAL_TONE_WORDS) == 420
    assert len(MUST_NOT_NEURAL_TONE_WORDS) == 9
    ts = ToneSandhi()
    # words from the restored tail of the list (absent from the old
    # 72-word subset) get a neutral final syllable
    for word, finals in [("早晨", ["ao3", "en2"]),
                         ("交情", ["iao1", "ing2"]),
                         ("蛤蟆", ["a2", "a2"]),
                         ("惦记", ["ian4", "i4"])]:
        if word in MUST_NEURAL_TONE_WORDS:
            out = ts.modified_tone(word, "n", list(finals))
            assert out[-1].endswith("5"), (word, out)
    # must-not words keep 子 at full tone
    assert ts.modified_tone("原子", "n", ["uan2", "i3"])[1] == "i3"


def test_tone_sandhi_ge_classifier_and_yi():
    ts = ToneSandhi()
    # 个 as classifier after a numeral -> neutral (reference :102-107)
    assert ts.modified_tone("三个", "m", ["an1", "e4"])[1] == "e5"
    assert ts.modified_tone("个", "q", ["e4"])[0] == "e5"
    # 一 in a digit sequence keeps tone1 (reference :131-134)
    assert ts.modified_tone("一零零", "m", ["i1", "ing2", "ing2"])[0] == "i1"
    # 第一 -> ordinal yi1 (reference :138-140)
    assert ts.modified_tone("第一", "m", ["i4", "i2"])[1] == "i1"
    # 看一看 -> neutral 一 (reference :135-137)
    assert ts.modified_tone("看一看", "v", ["an4", "i1", "an4"])[1] == "i5"


def test_tone_sandhi_merge_passes():
    ts = ToneSandhi(finals_fn=lambda w: {"很": ["en3"], "好": ["ao3"],
                                         "听": ["ing1"], "一": ["i1"],
                                         "了": ["e5"]}.get(w))
    # dangling 不 attaches to the next word
    assert ts._merge_bu([("看", "v"), ("不", "d"), ("懂", "v")]) == \
        [("看", "v"), ("不懂", "v")]
    # 听 一 听 -> 听一听
    assert ts._merge_yi([("听", "v"), ("一", "m"), ("听", "v")]) == \
        [("听一听", "v")]
    # consecutive third tones merge so 3-3 sandhi can apply
    merged = ts.pre_merge_for_modify([("很", "d"), ("好", "a")])
    assert merged == [("很好", "d")]
    # reduplications merge
    assert ts._merge_reduplication([("走", "v"), ("走", "v")]) == \
        [("走走", "v")]
