"""Mandarin tone sandhi rules.

Equivalent of the reference ToneSandhi (reference:
parakeet/frontend/tone_sandhi.py:22-343): neutral-tone (轻声) rules,
不/一 sandhi, third-tone sandhi with jieba-based word splitting, and the
word-merge preprocessing pass.

Finals are Parakeet-style toned finals (e.g. ``ia1``, ``uen5``); tones are
the last character of each final.
"""
from __future__ import annotations

from typing import List, Tuple

try:
    import jieba
    _HAS_JIEBA = True
except Exception:          # pragma: no cover - jieba is in the image
    jieba = None
    _HAS_JIEBA = False

__all__ = ["ToneSandhi"]

# words read with a neutral second syllable (subset of the reference's
# must-list, tone_sandhi.py:26-70)
_NEURAL_WORDS = {
    "麻烦", "商量", "耽误", "便宜", "东西", "玻璃", "打听", "告诉",
    "意思", "喜欢", "知识", "咳嗽", "力气", "钥匙", "衣服", "累赘",
    "招呼", "时候", "事情", "丈夫", "月亮", "脑袋", "抖擞", "风筝",
    "休息", "拾掇", "凑合", "石头", "木头", "舌头", "先生", "学生",
    "亲戚", "朋友", "规矩", "点心", "扫帚", "眉毛", "豆腐", "枕头",
    "屁股", "念叨", "别扭", "答应", "云彩", "窗户", "斗篷", "队伍",
    "暖和", "棉花", "骆驼", "葡萄", "杏儿", "柴火", "活泼", "明白",
    "师傅", "馒头", "行李", "戒指", "讲究", "机灵", "蘑菇", "磨蹭",
    "疙瘩", "结实", "漂亮", "困难", "扁担", "关系", "客气", "收拾",
}
_NEURAL_SUFFIXES = set("们子头家儿")
_PARTICLES = set("的地得着了过吧呢啊嘛吗呀哇哟哦")


def _set_tone(final: str, tone: str) -> str:
    return final[:-1] + tone


def _tone(final: str) -> str:
    return final[-1]


class ToneSandhi:
    def __init__(self):
        self.must_neural_tone_words = set(_NEURAL_WORDS)

    # ---- individual rules (reference tone_sandhi.py:74-326) -----------
    def _neural_sandhi(self, word: str, pos: str,
                       finals: List[str]) -> List[str]:
        n = len(word)
        # reduplication: 妈妈, 看看
        for i in range(1, n):
            if word[i] == word[i - 1] and pos[0] in ("n", "v", "a"):
                finals[i] = _set_tone(finals[i], "5")
        # sentence particles
        if n >= 1 and word[-1] in _PARTICLES:
            finals[-1] = _set_tone(finals[-1], "5")
        # suffixes 们/子/... on nouns/pronouns
        elif (n >= 2 and word[-1] in _NEURAL_SUFFIXES
                and pos in ("n", "r", "nr")
                and word not in ("公子", "棋子", "男子", "女子", "分子",
                                 "原子", "量子", "莲子", "石子", "瓜子",
                                 "电子")):
            finals[-1] = _set_tone(finals[-1], "5")
        # 上/下/里 as locative suffix
        elif n >= 2 and word[-1] in "上下里" and pos in ("s", "l", "f"):
            finals[-1] = _set_tone(finals[-1], "5")
        # 来/去 after verbs
        elif n >= 2 and word[-1] in "来去" and word[-2] in "上下进出回过起开":
            finals[-1] = _set_tone(finals[-1], "5")
        if word in self.must_neural_tone_words:
            finals[-1] = _set_tone(finals[-1], "5")
        elif n >= 3 and word[-2:] in self.must_neural_tone_words:
            finals[-1] = _set_tone(finals[-1], "5")
        return finals

    def _bu_sandhi(self, word: str, finals: List[str]) -> List[str]:
        # X不X: 看不懂 -> neutral 不
        if len(word) == 3 and word[1] == "不":
            finals[1] = _set_tone(finals[1], "5")
        else:
            for i, ch in enumerate(word):
                if ch == "不" and i + 1 < len(word) and \
                        _tone(finals[i + 1]) == "4":
                    finals[i] = _set_tone(finals[i], "2")
        return finals

    def _yi_sandhi(self, word: str, finals: List[str]) -> List[str]:
        # 一 between reduplicated words: 看一看 -> neutral
        if len(word) == 3 and word[1] == "一" and word[0] == word[-1]:
            finals[1] = _set_tone(finals[1], "5")
        # ordinal / part of a number: keep tone1
        elif word.startswith("第一") or all(
                ch in "零一二三四五六七八九十百千万亿两点" for ch in word):
            return finals
        else:
            for i, ch in enumerate(word):
                if ch == "一" and i + 1 < len(word):
                    if _tone(finals[i + 1]) == "4":
                        finals[i] = _set_tone(finals[i], "2")
                    else:
                        finals[i] = _set_tone(finals[i], "4")
        return finals

    def _split_word(self, word: str) -> List[str]:
        if not _HAS_JIEBA or len(word) < 2:
            return [word]
        parts = sorted(jieba.cut_for_search(word), key=len)
        if not parts or len(parts[0]) == len(word):
            return [word]
        first = parts[0]
        if word.startswith(first):
            return [first, word[len(first):]]
        return [word[:-len(first)], first]

    def _three_sandhi(self, word: str, finals: List[str]) -> List[str]:
        n = len(word)
        if n == 2 and self._all_tone_three(finals):
            finals[0] = _set_tone(finals[0], "2")
        elif n == 3:
            parts = self._split_word(word)
            if self._all_tone_three(finals):
                if len(parts[0]) == 2:        # AA B -> 2 2 3
                    finals[0] = _set_tone(finals[0], "2")
                    finals[1] = _set_tone(finals[1], "2")
                else:                          # A BB -> 3 2 3
                    finals[1] = _set_tone(finals[1], "2")
            else:
                # sub-word pairwise 3-3
                idx = 0
                for part in parts:
                    sub = finals[idx:idx + len(part)]
                    if len(sub) == 2 and self._all_tone_three(sub):
                        finals[idx] = _set_tone(finals[idx], "2")
                    idx += len(part)
        elif n == 4:                           # split 2 + 2
            for start in (0, 2):
                sub = finals[start:start + 2]
                if self._all_tone_three(sub):
                    finals[start] = _set_tone(finals[start], "2")
        return finals

    @staticmethod
    def _all_tone_three(finals: List[str]) -> bool:
        return all(_tone(f) == "3" for f in finals)

    # ---- public API ----------------------------------------------------
    def pre_merge_for_modify(
            self, seg: List[Tuple[str, str]]) -> List[Tuple[str, str]]:
        """Merge 不/一 and reduplications with neighbors so the per-word
        rules can see them (reference tone_sandhi.py:327-343)."""
        out: List[Tuple[str, str]] = []
        i = 0
        while i < len(seg):
            word, pos = seg[i]
            if word in ("不", "一") and i + 1 < len(seg):
                nxt, npos = seg[i + 1]
                out.append((word + nxt, npos))
                i += 2
                continue
            if (out and out[-1][0] == word and len(word) == 1
                    and pos[0] in ("n", "v", "a")):
                prev, ppos = out.pop()
                out.append((prev + word, ppos))
                i += 1
                continue
            out.append((word, pos))
            i += 1
        return out

    def modified_tone(self, word: str, pos: str,
                      finals: List[str]) -> List[str]:
        finals = self._bu_sandhi(word, finals)
        finals = self._yi_sandhi(word, finals)
        finals = self._neural_sandhi(word, pos, finals)
        finals = self._three_sandhi(word, finals)
        return finals
