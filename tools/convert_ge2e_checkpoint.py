#!/usr/bin/env python
"""CLI: released Paddle GE2E (LSTMSpeakerEncoder) checkpoint -> .npz.

Usage:
  # paddle side (once): np.savez("ge2e_paddle.npz",
  #   **{k: np.asarray(v) for k, v in model.state_dict().items()})
  python tools/convert_ge2e_checkpoint.py --input ge2e_paddle.npz \
      --output ge2e_tpu.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.training.checkpoint import save_pytree  # noqa: E402
from parakeet_tpu.utils.convert import (convert_ge2e,  # noqa: E402
                                        load_paddle_state)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True,
                        help=".npz/.pkl dump of the Paddle state dict")
    parser.add_argument("--num-layers", type=int, default=3)
    parser.add_argument("--output", type=Path, required=True)
    args = parser.parse_args()

    state = load_paddle_state(args.input)
    params = convert_ge2e(state, num_layers=args.num_layers)
    save_pytree(args.output, {"params": params})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
