"""Verify frozen PLM layers are bit-unchanged after fine-tuning, and that
unfrozen ones moved (reference ``text.py:70-73`` freezing semantics;
VERDICT r4 task 5 done-criterion).

Usage:
  python benchmarks/plm_frozen_check.py <run_dir> [--hf data/statfix/plm4_pretrained]
          [--frozen 0 1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def find_encoder(tree):
    """Locate the TransformerEncoder subtree (key 'encoder') in the params."""
    if isinstance(tree, dict):
        if "encoder" in tree and isinstance(tree["encoder"], dict) \
                and "layer_0" in tree["encoder"]:
            return tree["encoder"]
        for v in tree.values():
            hit = find_encoder(v)
            if hit is not None:
                return hit
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--hf", default="data/statfix/plm4_pretrained")
    ap.add_argument("--frozen", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--which", default="best")
    args = ap.parse_args()

    import jax

    from newsreclib_tpu.models.components.plm import load_hf_torch_weights
    from newsreclib_tpu.training.checkpoint import Checkpointer

    ported, kwargs = load_hf_torch_weights(os.path.join(REPO, args.hf))
    params = Checkpointer(os.path.join(args.run_dir, "checkpoints")
                          ).restore_params(args.which)
    enc = find_encoder(params)
    assert enc is not None, "no TransformerEncoder subtree in checkpoint"

    ok = True
    for i in range(kwargs["num_layers"]):
        a = jax.tree.leaves(jax.tree.map(np.asarray, ported[f"layer_{i}"]))
        b = jax.tree.leaves(jax.tree.map(np.asarray, enc[f"layer_{i}"]))
        max_delta = max(float(np.abs(x - y).max()) for x, y in zip(a, b))
        frozen = i in args.frozen
        status = "FROZEN" if frozen else "train"
        want = (max_delta == 0.0) if frozen else (max_delta > 0.0)
        ok &= want
        print(f"layer_{i} [{status}]: max|delta| = {max_delta:.3e} "
              f"{'OK' if want else 'VIOLATION'}")
    print("frozen-layer check:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
