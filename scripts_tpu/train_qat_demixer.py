"""Quantisation-aware fine-tune of an NWD demixer for the int4 wire.

The int4 trace wire (demix/demixer.py transfer_dtype="int4") halves the
host->TPU upload versus int8, but its ~7%-of-peak quantisation step is
visible to stock checkpoints: WIRE_STUDY.json measured a -0.028 mean
truth-R2 drop. The step noise is *in magnitude range* of the training
noise (noise_std_upper 0.02-0.1 of peak) — the network just never saw
its staircase structure. Fine-tuning on int4-quantised inputs (targets
stay clean) teaches the demixer to treat the quantisation floor as one
more noise source, recovering int8-level fidelity at half the transfer.

Protocol: same dataset generator + presets as train_demixer.py
(reference train_psc_demixer.py:34-64), inputs quantised with the exact
wire rule (per-trace abs-peak / (2^{bits-1}-1), round-to-nearest,
clip), SGD/MSE fine-tune from the converted reference checkpoint.

Usage:
  python scripts_tpu/train_qat_demixer.py --epochs 150 --size 50000 \
      --pretrained demixers/nwd_ie_ChroME2f.npz \
      --out demixers/nwd_ie_ChroME2f_int4qat.npz
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wire_quantise(traces, bits=4, decimate=1):
    """Apply the trace-wire transform host-side — delegated to the
    single source of truth in demix/demixer.py (wire_transform), so the
    corruption the network trains on IS the transform the device
    reconstructs at serve time (incl. the int4d2 mean-pool + linear
    upsample when ``decimate=2``)."""
    from circuitmap_tpu.demix.demixer import wire_transform

    return wire_transform(traces, bits=bits, decimate=decimate)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--size", type=int, default=50000)
    parser.add_argument("--epochs", type=int, default=150)
    parser.add_argument("--bits", type=int, default=4)
    parser.add_argument("--decimate", type=int, default=1,
                        help="2 = the int4d2 wire (mean-pool 2x + "
                             "device upsample): quarter of the int8 "
                             "bytes")
    parser.add_argument("--learning_rate", type=float, default=2e-3)
    parser.add_argument("--pretrained",
                        default=os.path.join(REPO, "demixers",
                                             "nwd_ie_ChroME2f.npz"))
    parser.add_argument("--preset", default="chrome2f_ie")
    parser.add_argument("--out",
                        default=os.path.join(REPO, "demixers",
                                             "nwd_ie_ChroME2f_int4qat.npz"))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (small-scale probes)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from circuitmap_tpu import NeuralDemixer
    from train_demixer import PRESETS

    demixer = NeuralDemixer(path=args.pretrained, seed=args.seed)
    tr_lo, tr_hi, td_lo, td_hi = PRESETS[args.preset]
    demixer.generate_training_data(
        trial_dur=900,
        size=args.size,
        gp_scale=0.045,
        delta_lower=160,
        delta_upper=400,
        next_delta_lower=400,
        next_delta_upper=899,
        prev_delta_upper=150,
        tau_r_lower=tr_lo,
        tau_r_upper=tr_hi,
        tau_diff_lower=td_lo,
        tau_diff_upper=td_hi,
        noise_std_lower=0.001,
        noise_std_upper=0.02,
        gp_lengthscale=45,
        seed=args.seed,
    )
    # quantise inputs with the wire rule; supervision targets stay clean
    tr_in, tr_tgt = demixer.training_data
    te_in, te_tgt = demixer.test_data
    demixer.training_data = (
        wire_quantise(tr_in, args.bits, args.decimate), tr_tgt)
    demixer.test_data = (
        wire_quantise(te_in, args.bits, args.decimate), te_tgt)

    t0 = time.time()
    history = demixer.train(
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        save_path=args.out,
        seed=args.seed,
    )
    wall = time.time() - t0
    meta = {
        "pretrained": args.pretrained,
        "bits": args.bits,
        "decimate": args.decimate,
        "epochs": args.epochs,
        "size": args.size,
        "learning_rate": args.learning_rate,
        "preset": args.preset,
        "final_train_loss": history[-1]["train_loss"],
        "final_val_loss": history[-1]["val_loss"],
        "wall_seconds": round(wall, 1),
        "device": str(jax.devices()[0]),
    }
    json.dump(meta, open(args.out + ".meta.json", "w"), indent=2)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
