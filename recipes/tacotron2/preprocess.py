#!/usr/bin/env python
"""Tacotron2 preprocessing: LJSpeech -> (chars/phones, log-mel).

Same pipeline as the TransformerTTS recipe's preprocess (reference
analog: examples/tacotron2/preprocess.py pairs a character frontend
with mel extraction) with the character frontend as the default; the
output schema (text tokens + speech .npy + id map) feeds the shared
normalize stage and the train CLI directly.
"""
import runpy
import sys
from pathlib import Path

if __name__ == "__main__":
    if not any(a == "--frontend" or a.startswith("--frontend=")
               for a in sys.argv):
        sys.argv += ["--frontend", "char"]
    sys.argv[0] = __file__
    runpy.run_path(str(Path(__file__).resolve().parent.parent /
                       "transformer_tts" / "preprocess.py"),
                   run_name="__main__")
