"""Subprocess entry for the real 2-process multi-host tests.

Launched (one per process) by tests/test_multihost.py with
JAX_PLATFORMS=cpu and 4 virtual devices per process; initializes the
JAX distributed runtime against a localhost coordinator (the
single-machine form of the reference's 8-process torch.distributed
launch, reference main.py:27 / lib/utils.py:41-46), trains the smoke
config for 3 steps, then evaluates a rank-strided generator shard —
the evaluate CLI's sharding contract — and saves everything for the
parent test to compare against a single-process run.
"""

import json
import sys


def main():
    cfg_path, pid, nproc, port, out_path = sys.argv[1:6]
    import jax

    # share compiled programs across runs (and with the sibling process
    # once one of them has written them) — the two workers compile
    # identical XLA programs
    from migan_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    jax.distributed.initialize(f"localhost:{port}",
                               num_processes=int(nproc),
                               process_id=int(pid))
    assert jax.process_count() == int(nproc)
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    import numpy as np

    from migan_tpu.data.sampler import ShardSampler
    from migan_tpu.models.registry import get_model
    from migan_tpu.train.loop import train_stage

    with open(cfg_path) as f:
        cfg = json.load(f)
    # SHARED log dir (the realistic multi-host layout: checkpoints are
    # collective orbax saves, so the path must be common); the parent
    # asserts chief-only artifacts appear exactly once in it
    state = train_stage(cfg, max_steps=3)

    # ---- one eval shard (evaluate CLI contract: rank-strided indices,
    # extend-padded, reassembled zipzap by the consumer) ----------------
    g_cfg = get_model()(cfg["model_g"]).cfg
    from migan_tpu.models.migan import generator_apply as g_apply

    ema = jax.tree_util.tree_map(np.asarray, state.params_G_ema)
    n_eval = 6
    idxs = ShardSampler(n_eval, num_shards=int(nproc), shard=int(pid),
                        shuffle=False, extend=True).epoch_indices(0)
    res = g_cfg.resolution
    outs = []
    for i in idxs:
        rng = np.random.RandomState(1000 + int(i))
        x = rng.randn(1, res, res, 4).astype(np.float32)
        outs.append(np.asarray(g_apply(ema, x, g_cfg, noise_mode="const")))
    eval_shard = np.concatenate(outs)

    leaves = jax.tree_util.tree_leaves({
        "G": state.params_G, "Gema": state.params_G_ema,
        "D": state.params_D, "optG": state.opt_G, "optD": state.opt_D,
        "step": state.step, "nimg": state.nimg,
    })
    np.savez(out_path, eval_shard=eval_shard, eval_idxs=idxs,
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    print(f"proc {pid}: done, {len(leaves)} leaves", flush=True)


if __name__ == "__main__":
    main()
