"""FLOP counting for the model zoo — analog of the reference fvcore tool
(reference: scripts/calculate_flops.py). Counted from the jitted XLA
computation's own cost analysis, so every op the compiler actually runs is
included (conv, matmul, elementwise), not just hooked module types.

    python -m migan_tpu.cli.calculate_flops [--models migan-256 migan-512 \
        comodgan-256 comodgan-512] [--batch 1]
"""

from __future__ import annotations

import argparse


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+",
                   default=["migan-256", "migan-512", "comodgan-256",
                            "comodgan-512"])
    p.add_argument("--batch", type=int, default=1)
    return p.parse_args(argv)


def flops_of(fn, *example_args) -> float:
    """FLOPs from XLA's cost analysis of the compiled computation."""
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def main(argv=None):
    args = get_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    for name in args.models:
        family, res = name.rsplit("-", 1)
        res = int(res)
        x = jnp.zeros((args.batch, res, res, 4), jnp.float32)
        if family == "migan":
            from ..models.migan_inference import (GeneratorConfig,
                                                  generator_init,
                                                  generator_apply)

            cfg = GeneratorConfig(resolution=res)
            params = generator_init(jax.random.PRNGKey(0), cfg)
            f = flops_of(lambda p, xx: generator_apply(p, xx, cfg), params,
                         x)
        elif family == "comodgan":
            from ..models.comodgan import (CoModGANConfig, generator_init,
                                           generator_apply)

            cfg = CoModGANConfig(resolution=res)
            params = generator_init(jax.random.PRNGKey(0), cfg)
            z = jnp.zeros((args.batch, cfg.z_dim), jnp.float32)
            f = flops_of(
                lambda p, xx, zz: generator_apply(p, xx, cfg, z=zz,
                                                  noise_mode="const"),
                params, x, z)
        else:
            raise ValueError(name)
        print(f"{name}: {f / 1e9 / args.batch:.2f} GFLOPs/image "
              f"(XLA cost analysis, batch {args.batch})")


if __name__ == "__main__":
    main()
