#!/usr/bin/env python
"""Z-score speech + token-id mapping — the same stage as the
TransformerTTS recipe (reference analog: each AR example normalizes its
features with train-set stats before training)."""
import runpy
import sys
from pathlib import Path

if __name__ == "__main__":
    sys.argv[0] = __file__
    runpy.run_path(str(Path(__file__).resolve().parent.parent /
                       "transformer_tts" / "normalize.py"),
                   run_name="__main__")
