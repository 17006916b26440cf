#!/usr/bin/env python
"""CLI: released Paddle PWGGenerator checkpoint -> parakeet_tpu .npz.

Usage:
  # paddle side (once): np.savez("pwg_paddle.npz",
  #   **{k: np.asarray(v) for k, v in generator.state_dict().items()})
  python tools/convert_pwg_checkpoint.py --input pwg_paddle.npz \
      --config recipes/pwgan/conf/default.yaml --output pwg_tpu.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.training.checkpoint import save_pytree  # noqa: E402
from parakeet_tpu.training.config import Config  # noqa: E402
from parakeet_tpu.utils.convert import (convert_pwg_generator,  # noqa: E402
                                        load_paddle_state)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True,
                        help=".npz/.pkl dump of the Paddle state dict")
    parser.add_argument("--config", type=Path, required=True,
                        help="pwgan recipe yaml (generator_params)")
    parser.add_argument("--output", type=Path, required=True)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config).get("generator_params", {})
    state = load_paddle_state(args.input)
    # strip a leading "generator." scope if the dump is a full GAN dict
    if not any(k.startswith("first_conv") for k in state):
        state = {k.split(".", 1)[1]: v for k, v in state.items()
                 if k.startswith("generator.")}
    params = convert_pwg_generator(
        state, layers=cfg.get("layers", 30),
        upsample_scales=tuple(cfg.get("upsample_scales", (4, 5, 3, 5))),
        nonlinear_activation=bool(cfg.get("nonlinear_activation")))
    save_pytree(args.output, {"params": params})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
