"""Stage a random-init Co-Mod-GAN teacher checkpoint (.npz).

The KD endurance leg (VERDICT r4 "Next" #4) needs the flagship training
WORKLOAD — every Gmain paying the 79M-param Co-Mod-GAN teacher forward
(reference lib/experiments/loss.py:171-186) — without the published
teacher weights, which cannot reach this zero-egress environment
(docs/REAL_WEIGHTS.md). A deterministic random-init teacher gives the
identical compute/memory/program shape; the resulting student quality is
meaningless and the config that consumes this file says so.

Usage:
    python scripts/make_random_teacher.py --resolution 128 \
        --out data/teachers/comodgan_rand_128.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="data/teachers/comodgan_rand_128.npz")
    args = ap.parse_args()

    # CPU is fine and keeps the TPU tunnel free for the training process.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    from migan_tpu.models.comodgan import CoModGANConfig, generator_init
    from migan_tpu.io.checkpoint import save_npz

    cfg = CoModGANConfig(resolution=args.resolution)
    params = generator_init(jax.random.PRNGKey(args.seed), cfg)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_npz(args.out, params)
    print(f"wrote {args.out}: CoModGAN G resolution={args.resolution} "
          f"params={n:,}")


if __name__ == "__main__":
    main()
