#!/usr/bin/env python
"""CLI: released Paddle TransformerTTS checkpoint -> parakeet_tpu .npz.

Usage:
  # paddle side (once): np.savez("ttts_paddle.npz",
  #   **{k: np.asarray(v) for k, v in model.state_dict().items()})
  python tools/convert_transformer_tts_checkpoint.py --input ttts_paddle.npz \
      --config recipes/transformer_tts/conf/default.yaml --output ttts_tpu.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.training.checkpoint import save_pytree  # noqa: E402
from parakeet_tpu.training.config import Config  # noqa: E402
from parakeet_tpu.utils.convert import (convert_transformer_tts,  # noqa: E402
                                        load_paddle_state)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True,
                        help=".npz/.pkl dump of the Paddle state dict")
    parser.add_argument("--config", type=Path, required=True,
                        help="transformer_tts recipe yaml (model section)")
    parser.add_argument("--output", type=Path, required=True)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config).get("model", {})
    state = load_paddle_state(args.input)
    params, batch_stats = convert_transformer_tts(
        state,
        elayers=cfg.get("elayers", 6), dlayers=cfg.get("dlayers", 6),
        aheads=cfg.get("aheads", 8),
        dprenet_layers=cfg.get("dprenet_layers", 2),
        postnet_layers=cfg.get("postnet_layers", 5),
        reduction_factor=cfg.get("reduction_factor", 1))
    save_pytree(args.output,
                {"params": params, "batch_stats": batch_stats})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
