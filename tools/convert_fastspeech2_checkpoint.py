#!/usr/bin/env python
"""CLI: released Paddle FastSpeech2 checkpoint -> parakeet_tpu .npz.

Usage:
  # paddle side (once): np.savez("fs2_paddle.npz",
  #   **{k: np.asarray(v) for k, v in model.state_dict().items()})
  python tools/convert_fastspeech2_checkpoint.py --input fs2_paddle.npz \
      --config recipes/fastspeech2/conf/default.yaml --output fs2_tpu.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.training.checkpoint import save_pytree  # noqa: E402
from parakeet_tpu.training.config import Config  # noqa: E402
from parakeet_tpu.utils.convert import (convert_fastspeech2,  # noqa: E402
                                        load_paddle_state)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True,
                        help=".npz/.pkl dump of the Paddle state dict")
    parser.add_argument("--config", type=Path, required=True,
                        help="fastspeech2 recipe yaml (model section)")
    parser.add_argument("--output", type=Path, required=True)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config).get("model", {})
    state = load_paddle_state(args.input)
    if not any(k.startswith("encoder.") for k in state):
        state = {k.split(".", 1)[1]: v for k, v in state.items()
                 if "." in k}
    params, batch_stats = convert_fastspeech2(
        state,
        elayers=cfg.get("elayers", 4),
        dlayers=cfg.get("dlayers", 4),
        aheads=cfg.get("aheads", 2),
        postnet_layers=cfg.get("postnet_layers", 5),
        predictor_layers=cfg.get("duration_predictor_layers", 2),
        pitch_predictor_layers=cfg.get("pitch_predictor_layers", 5),
        energy_predictor_layers=cfg.get("energy_predictor_layers", 2))
    save_pytree(args.output, {"params": params,
                              "batch_stats": batch_stats})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
