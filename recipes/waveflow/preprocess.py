#!/usr/bin/env python
"""WaveFlow preprocessing — identical (wave, log-mel) dumps to the PWGAN
recipe (reference: examples/waveflow/preprocess.py extracts the same
pairs); both vocoders train from the same metadata schema."""
import runpy
import sys
from pathlib import Path

if __name__ == "__main__":
    sys.argv[0] = __file__
    runpy.run_path(str(Path(__file__).resolve().parent.parent /
                       "pwgan" / "preprocess.py"),
                   run_name="__main__")
