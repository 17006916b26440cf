#!/usr/bin/env python
"""CLI: released Paddle SpeedySpeech checkpoint -> parakeet_tpu .npz.

Usage:
  # paddle side (once): np.savez("ss_paddle.npz",
  #   **{k: np.asarray(v) for k, v in model.state_dict().items()})
  python tools/convert_speedyspeech_checkpoint.py --input ss_paddle.npz \
      --config recipes/speedyspeech/conf/default.yaml --output ss_tpu.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.training.checkpoint import save_pytree  # noqa: E402
from parakeet_tpu.training.config import Config  # noqa: E402
from parakeet_tpu.utils.convert import (convert_speedyspeech,  # noqa: E402
                                        load_paddle_state)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True,
                        help=".npz/.pkl dump of the Paddle state dict")
    parser.add_argument("--config", type=Path, required=True,
                        help="speedyspeech recipe yaml (model section)")
    parser.add_argument("--output", type=Path, required=True)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config).get("model", {})
    state = load_paddle_state(args.input)
    params, batch_stats = convert_speedyspeech(
        state,
        encoder_dilations=tuple(cfg.get(
            "encoder_dilations", (1, 3, 9, 27, 1, 3, 9, 27, 1, 1))),
        decoder_dilations=tuple(cfg.get(
            "decoder_dilations",
            (1, 3, 9, 27, 1, 3, 9, 27, 1, 3, 9, 27, 1, 3, 9, 27, 1, 1))),
        tone="encoder.embedding.tone_embedding.weight" in state)
    save_pytree(args.output,
                {"params": params, "batch_stats": batch_stats})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
