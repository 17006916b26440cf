#!/usr/bin/env python
"""Convert a pipeline-parallel FastSpeech2 snapshot to the standard
per-layer layout (and back).

``train.py --pp S`` trains with the encoder/decoder layer params
depth-STACKED under one ``layers`` collection (parallel/pipeline.py);
snapshots written by that run carry the stacked layout.  Every
synthesize/export CLI and checkpoint converter consumes the standard
``layer_0 .. layer_{n-1}`` layout, so convert once after training:

  python tools/convert_pp_checkpoint.py --input exp/pp/checkpoints/\
snapshot_iter_N.npz --output exp/pp/unstacked.npz

``--to-stacked`` converts the other way (resume a standard snapshot
under --pp).  Only the params tree is converted; optimizer moments are
dropped (a resumed run re-inits them), matching what changing the
parallelism layout means for adam state anyway.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--to-stacked", action="store_true",
                        help="standard -> stacked (for --pp resume) "
                             "instead of stacked -> standard")
    parser.add_argument("--stacks", nargs="+",
                        default=["encoder", "decoder"],
                        help="param subtrees holding transformer stacks")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from parakeet_tpu.parallel import (stack_layer_params,
                                       unstack_layer_params)
    from parakeet_tpu.training.checkpoint import (load_pytree, nest_flat,
                                                  save_pytree)

    flat, meta = load_pytree(args.input)
    tree = nest_flat(flat)
    params = tree.get("params", tree)
    for name in args.stacks:
        sub = params[name]
        if args.to_stacked:
            n = sum(1 for k in sub if k.startswith("layer_"))
            params[name] = stack_layer_params(sub, n)
        else:
            if "layers" not in sub:
                raise SystemExit(
                    f"{args.input}: '{name}' has no stacked 'layers' "
                    "collection — already standard layout?")
            params[name] = unstack_layer_params(sub)

    out = {"params": params}
    if "batch_stats" in tree:
        out["batch_stats"] = tree["batch_stats"]
    save_pytree(args.output, out, metadata=meta)
    direction = "standard->stacked" if args.to_stacked \
        else "stacked->standard"
    print(f"wrote {args.output} ({direction})")


if __name__ == "__main__":
    main()
