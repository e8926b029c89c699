"""Export an in-framework demixer checkpoint to a Lightning .ckpt.

The reverse of the .ckpt→npz conversion the zoo loader does on import:
a scratch/QAT demixer trained in this framework (train_demixer.py /
train_qat_demixer.py → flat .npz) becomes a checkpoint the reference
ecosystem consumes directly (``NWDUNet().load_from_checkpoint(path)``,
reference neural_waveform_demixing.py:27) — so a torch rig can use a
TPU-trained demixer without installing jax.

Usage:
    python -m circuitmap_tpu export-ckpt demixers/nwd_ie_ChroME2f_scratch.npz out.ckpt
    python -m circuitmap_tpu export-ckpt in.npz out.ckpt --epoch 150
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="export a trained demixer (.npz, or any loadable "
                    "checkpoint) as a reference-compatible Lightning "
                    ".ckpt")
    ap.add_argument("src", help="input checkpoint (.npz native format, "
                                "or .ckpt to re-export)")
    ap.add_argument("dst", help="output .ckpt path")
    ap.add_argument("--epoch", type=int, default=0,
                    help="epoch stamp for the checkpoint metadata")
    ap.add_argument("--global-step", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure re-keying: no chip

    from circuitmap_tpu.demix import convert

    params = convert.load_params(args.src)
    convert.save_lightning_checkpoint(args.dst, params, epoch=args.epoch,
                                      global_step=args.global_step)
    n = sum(1 for _ in _leaves(params))
    print(f"wrote {args.dst} ({n} tensors + BN counters, "
          "reference NWDUNet layout)")


def _leaves(params):
    for block in params.values():
        for group in block.values():
            yield from group.values()


if __name__ == "__main__":
    main()
