"""Value-level checkpoint-conversion parity against torch golden oracles.

Each test builds a paddle-layout state dict, converts it with
`parakeet_tpu.utils.convert`, runs our JAX model and the independent
torch implementation of the reference math (tools/golden/*), and
asserts the outputs agree.  This covers the layout failure classes the
shape-only tests in test_convert.py cannot: transposed LSTM gate order,
flipped ConvTranspose kernels, BatchNorm-NLC statistics, weight-norm
folding, padding conventions.  See PARITY.md for protocol and results.

Tolerances: our models run fp32 while the oracles run fp64, so the
comparison bounds fp32 accumulation error, not exactness; 1e-3 is ~10x
above the worst observed diff (1.5e-4, FastSpeech2 predictor heads).
"""
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

sys.path.insert(0, str(Path(__file__).parent.parent))

torch = pytest.importorskip("torch")

from tools.golden import run_parity  # noqa: E402

TOL = 1e-3


@pytest.mark.parametrize("family", sorted(run_parity.CHECKS))
def test_golden_parity(family):
    results = run_parity.CHECKS[family]()
    for output, (maxdiff, _mse) in results.items():
        assert maxdiff < TOL, (
            f"{family}.{output}: max abs diff {maxdiff:.3e} vs torch "
            f"golden (tolerance {TOL})")
