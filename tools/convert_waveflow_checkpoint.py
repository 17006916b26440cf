#!/usr/bin/env python
"""CLI: released Paddle ConditionalWaveFlow checkpoint -> parakeet_tpu .npz.

Usage:
  # paddle side (once): np.savez("waveflow_paddle.npz",
  #   **{k: np.asarray(v) for k, v in model.state_dict().items()})
  python tools/convert_waveflow_checkpoint.py --input waveflow_paddle.npz \
      --config recipes/waveflow/conf/default.yaml --output waveflow_tpu.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.training.checkpoint import save_pytree  # noqa: E402
from parakeet_tpu.training.config import Config  # noqa: E402
from parakeet_tpu.utils.convert import (convert_waveflow,  # noqa: E402
                                        load_paddle_state)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True,
                        help=".npz/.pkl dump of the Paddle state dict")
    parser.add_argument("--config", type=Path, required=True,
                        help="waveflow recipe yaml (model section)")
    parser.add_argument("--output", type=Path, required=True)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config).get("model", {})
    state = load_paddle_state(args.input)
    params = convert_waveflow(
        state, n_flows=cfg.get("n_flows", 8),
        n_layers=cfg.get("n_layers", 8),
        upsample_factors=tuple(cfg.get("upsample_factors", (16, 16))))
    save_pytree(args.output, {"params": params})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
