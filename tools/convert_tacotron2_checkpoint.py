#!/usr/bin/env python
"""CLI: released Paddle Tacotron2 checkpoint -> parakeet_tpu .npz.

Usage:
  # paddle side (once): np.savez("taco2_paddle.npz",
  #   **{k: np.asarray(v) for k, v in model.state_dict().items()})
  python tools/convert_tacotron2_checkpoint.py --input taco2_paddle.npz \
      --config recipes/tacotron2/conf/default.yaml --output taco2_tpu.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.training.checkpoint import save_pytree  # noqa: E402
from parakeet_tpu.training.config import Config  # noqa: E402
from parakeet_tpu.utils.convert import (convert_tacotron2,  # noqa: E402
                                        load_paddle_state)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True,
                        help=".npz/.pkl dump of the Paddle state dict")
    parser.add_argument("--config", type=Path, required=True,
                        help="tacotron2 recipe yaml (model section)")
    parser.add_argument("--output", type=Path, required=True)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config).get("model", {})
    state = load_paddle_state(args.input)
    params, batch_stats = convert_tacotron2(
        state,
        encoder_conv_layers=cfg.get("encoder_conv_layers", 3),
        postnet_conv_layers=cfg.get("postnet_conv_layers", 5),
        use_stop_token=bool(cfg.get("use_stop_token", False)),
        toned="embedding_tones.weight" in state)
    save_pytree(args.output,
                {"params": params, "batch_stats": batch_stats})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
