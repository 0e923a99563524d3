"""Training orchestration: the tick loop.

Re-implements the capability of the reference train_stage
(reference: lib/experiments/migan_default.py:132-597): phase scheduling with
lazy regularization, EMA, tick-based maintenance (status line, stats.jsonl,
image snapshot grids, checkpoints, metric-gated best tracking), resume.

TPU-native structure: ONE process per host drives the whole mesh (no
mp.spawn / DDP wraps); the jitted train_step carries Gmain+Dmain(+Dreg)
and the EMA update; stats come back as scalars.
"""

from __future__ import annotations

import itertools
import json
import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import numpy as np

from ..utils.logging import print_log
from ..utils import stats as training_stats
from .train_step import (TrainConfig, OptConfig, init_train_state,
                         make_train_step)
from .loss import LossConfig, KDConfig
from . import checkpoint as ckpt


def _train_config_from_cfg(cfgt: Dict[str, Any]) -> TrainConfig:
    def opt(section, reg_interval):
        kw = cfgt[section]
        return OptConfig(lr=kw["lr"], beta1=kw["betas"][0],
                         beta2=kw["betas"][1], eps=float(kw["eps"]),
                         reg_interval=reg_interval)

    kd = None
    kd_kwargs = cfgt.get("image_level_kd_kwargs")
    if kd_kwargs and kd_kwargs.get("use_image_level_kd"):
        kd = KDConfig(start_resolution=kd_kwargs["start_resolution"],
                      weight=kd_kwargs["weight"])
    return TrainConfig(
        g_opt=opt("g_opt_kwargs", cfgt.get("g_reg_interval")),
        d_opt=opt("d_opt_kwargs", cfgt.get("d_reg_interval")),
        loss=LossConfig(r1_gamma=cfgt["loss_kwargs"]["r1_gamma"], kd=kd),
        batch_size=cfgt["batch_size"],
        ema_kimg=cfgt.get("ema_kimg", 20),
        ema_rampup=cfgt.get("ema_rampup"),
        grad_accum_rounds=cfgt.get("grad_accum_rounds", 1),
    )


def _make_teacher(cfgt: Dict[str, Any]):
    """Load the Co-Mod-GAN teacher if configured and present
    (reference loss.py:55-121). Returns the (apply_fn, params) tuple
    form — the 310 MB of teacher weights must enter the jitted train
    programs as a traced argument, never as closure constants
    (train_step._normalize_teacher)."""
    kd_kwargs = cfgt.get("image_level_kd_kwargs")
    if not (kd_kwargs and kd_kwargs.get("use_image_level_kd")):
        return None
    path = kd_kwargs.get("teacher1_path")
    if not path or not osp.isfile(path):
        print_log(f"KD teacher not found at {path!r} — "
                  "training WITHOUT distillation")
        return None
    from ..models.comodgan import CoModGANConfig, make_teacher_apply

    res = kd_kwargs.get("inference_resolution", 256)
    cfg = CoModGANConfig(resolution=res)
    if path.endswith(".npz"):
        from ..io.checkpoint import load_npz

        params = load_npz(path)
    else:
        from ..io import load_torch_state_dict, import_migan_train

        params = import_migan_train(load_torch_state_dict(path))
    print_log(f"Loaded teacher 1 (CoModGAN) from {path}")
    return make_teacher_apply(cfg), params


def _save_image_grid(batch_nhwc: np.ndarray, path: str, grid=(8, 6)):
    """[-1,1] NHWC float -> tiled uint8 PNG (reference draw_functor,
    migan_default.py:43-129)."""
    from PIL import Image

    gw, gh = grid
    n, h, w, c = batch_nhwc.shape
    canvas = np.zeros((gh * h, gw * w, c), np.uint8)
    for i in range(min(n, gw * gh)):
        img = np.clip(batch_nhwc[i] * 127.5 + 127.5, 0, 255).astype(np.uint8)
        r, cc = divmod(i, gw)
        canvas[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = img
    Image.fromarray(canvas.squeeze()).save(path)


def _resource_stats() -> Dict[str, float]:
    """Host RSS + device memory telemetry (reference Resources/* stats,
    migan_default.py:444-448). Device stats come from PJRT memory_stats()
    when the backend reports them (TPU does; CPU returns nothing)."""
    import jax

    out: Dict[str, float] = {}
    try:
        import psutil

        out["Resources/cpu_mem_gb"] = (
            psutil.Process(os.getpid()).memory_info().rss / 2 ** 30)
    except Exception:  # pragma: no cover
        pass
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in ms:
            out["Resources/peak_device_mem_gb"] = (
                ms["peak_bytes_in_use"] / 2 ** 30)
        if "bytes_in_use" in ms:
            out["Resources/device_mem_gb"] = ms["bytes_in_use"] / 2 ** 30
    except Exception:  # pragma: no cover
        pass
    return out


def _make_tb_writer(log_dir: str):
    """TensorBoard scalar sink (reference migan_default.py:578-585);
    jsonl remains the primary sink, TB is best-effort. tensorboardX
    first (no torch dependency in the production loop); the torch
    writer only as a fallback for oracle-equipped dev environments."""
    try:
        from tensorboardX import SummaryWriter
    except Exception:
        try:
            from torch.utils.tensorboard import SummaryWriter
        except Exception as e:  # pragma: no cover
            print_log(f"tensorboard unavailable ({e}); jsonl only")
            return None
    try:
        return SummaryWriter(log_dir=log_dir)
    except Exception as e:  # pragma: no cover
        print_log(f"tensorboard unavailable ({e}); jsonl only")
        return None


def _encode_wire(x: np.ndarray, m: np.ndarray, wire: str):
    """Host side of the batch wire format (see train.wire_format and
    train_step._decode_batch). 'u8': images round((x+1)*127.5) -> uint8
    (values clip to [-1,1]; inputs are already nominally in that range),
    masks 0/1 uint8."""
    if wire == "u8":
        return (np.clip((x + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8),
                m.astype(np.uint8))
    return x, m


def _build_metric_ctx(cfg: Dict[str, Any]):
    """Set up the FID-inpainting metric machinery
    (reference migan_default.py:462-490 / metric_main registry) if the
    experiment configures metrics and detector weights are available.

    eval.allow_random_detector: true runs the metric plumbing with
    random Inception weights (mirrors the evaluate CLI's
    --allow-random-detector; FID values are meaningless but the branch
    — detector passes, Frechet, jsonl, best-checkpoint gating — is
    exercised end-to-end)."""
    cfgt = cfg["train"]
    metrics = cfgt.get("metrics") or []
    eval_cfg = cfg.get("eval") or {}
    if not metrics or "dataset" not in eval_cfg:
        return None
    from ..data.factory import get_dataset
    from ..evalx.inception import (inception_init, load_inception_weights,
                                   make_detector)

    weights = eval_cfg.get("inception_weights")
    if weights and osp.isfile(weights):
        # flavor: the reference's TRAINING-TIME FID uses the NVIDIA
        # TF-named TorchScript detector
        # (frechet_inception_distance.py:25-26), which gives different
        # numbers from the standalone pytorch_fid one (SURVEY §3.3).
        # Auto-detect from the weight file; override with
        # eval.inception_flavor for explicitness.
        params, flavor = load_inception_weights(
            weights, eval_cfg.get("inception_flavor", "auto"))
    elif eval_cfg.get("allow_random_detector"):
        import jax

        print_log("WARNING: random Inception weights for training-time "
                  "metrics — FID values are meaningless (plumbing only)")
        params, flavor = inception_init(jax.random.PRNGKey(0)), "pytorch_fid"
    else:
        print_log("metrics configured but no inception_weights found — "
                  "skipping metric evaluation (set eval.inception_weights "
                  "or eval.allow_random_detector)")
        return None
    print_log(f"training-time FID detector flavor: {flavor}")
    detector = make_detector(params, flavor)
    dataset = get_dataset(eval_cfg["dataset"])
    return {"metrics": metrics, "detector": detector, "dataset": dataset,
            "detector_tag": f"inception-{flavor}",
            "batch_size": eval_cfg.get("batch_size", 32),
            "max_items": eval_cfg.get("max_items")}


def _run_metrics(cfg, state, g_cfg, ctx, log_dir) -> Optional[float]:
    """Returns the first metric's FID (for best tracking)."""
    import jax

    from ..evalx import metrics as metric_main
    from ..models.migan import generator_apply as g_apply

    # The jitted generator is built ONCE per training run and takes the
    # params as an argument: every eval tick reuses the compiled program
    # (building a fresh jit closure per call would recompile the full
    # generator — ~90 s on TPU — at every metric evaluation).
    if "gen_jit" not in ctx:
        ctx["gen_jit"] = jax.jit(lambda params, x: g_apply(
            params, x, g_cfg, noise_mode="const"))
    # localize the (replicated, hence addressable) EMA params so the
    # chief-only eval never launches a global computation in multi-host runs
    ema_host = jax.tree_util.tree_map(np.asarray, state.params_G_ema)
    gen = lambda x: ctx["gen_jit"](ema_host, x)
    fid_value = None
    for name in ctx["metrics"]:
        if not metric_main.is_valid_metric(name):
            print_log(f"unknown metric {name!r}")
            continue
        result = metric_main.calc_metric(
            name, dataset=ctx["dataset"], generator_fn=gen,
            detector_fn=ctx["detector"],
            detector_tag=ctx.get("detector_tag", "inception"),
            batch_size=ctx["batch_size"],
            max_items=ctx.get("max_items"),
            cache_dir=osp.join(log_dir, "fid-cache"),
            dataset_tag=cfg.get("eval", {}).get("dataset", {}).get("name",
                                                                   ""))
        metric_main.report_metric(result, run_dir=log_dir)
        if fid_value is None:
            fid_value = result["results"].get("fid")
    return fid_value


def train_stage(cfg: Dict[str, Any], max_steps: Optional[int] = None):
    """Run training from a resolved experiment config dict."""
    import jax
    import jax.numpy as jnp

    from ..models.registry import get_model, count_params
    from ..data.factory import get_dataset
    from ..data.sampler import InfiniteSampler, DataLoader
    from ..parallel.mesh import (make_mesh, shard_batch,
                                 shard_batch_stacked, replicate)

    cfgt = cfg["train"]
    log_dir = cfgt["log_dir"]
    os.makedirs(log_dir, exist_ok=True)

    seed = cfg.get("env", {}).get("rnd_seed", 0)
    np.random.seed(seed)
    key = jax.random.PRNGKey(seed)

    # ----- data ------------------------------------------------------------
    trainset = get_dataset(cfgt["dataset"])
    print_log(f"train dataset: {cfgt['dataset']['name']} "
              f"({len(trainset)} items)")
    batch_size = cfgt["batch_size"]
    # multi-host: each process loads only its rank-strided shard; the global
    # batch is assembled device-side by shard_batch (parallel/mesh.py). The
    # seed-derived permutation makes every host agree on the order without
    # the reference's rank-0 broadcast (ds_sampler.py:77-85).
    n_proc = jax.process_count()
    proc = jax.process_index()
    is_chief = proc == 0
    assert batch_size % n_proc == 0, (batch_size, n_proc)
    local_bs = batch_size // n_proc
    # block=local_bs: process p loads the CONTIGUOUS rows
    # [p*local_bs, (p+1)*local_bs) of every global batch, so the global
    # array shard_batch assembles is row-for-row the single-process batch
    # (process p's devices are the mesh's rows p*local_bs.. in device-id
    # order) — multi-process training is bitwise-identical to
    # single-process (tests/test_multihost.py::test_two_process_train_parity)
    sampler = InfiniteSampler(len(trainset), num_shards=n_proc, shard=proc,
                              seed=seed, block=local_bs)

    # ----- models ----------------------------------------------------------
    g_handle = get_model()(cfg["model_g"])
    d_handle = get_model()(cfg["model_d"])
    g_cfg, d_cfg = g_handle.cfg, d_handle.cfg

    tcfg = _train_config_from_cfg(cfgt)
    teacher_fn = _make_teacher(cfgt)

    key, k_init = jax.random.split(key)
    state = init_train_state(k_init, g_cfg, d_cfg, tcfg)
    print_log(f"G params: {count_params(state.params_G):,}  "
              f"D params: {count_params(state.params_D):,}")

    # resume
    resume_path = cfgt.get("resume_path")
    if resume_path:
        path = ckpt.latest(resume_path) or resume_path
        state = ckpt.restore(path, state)
        print_log(f"resumed from {path} at step {int(state.step)}")

    # Stream-exact resume (stronger than the reference, which restarted
    # its data order and noise stream on every resume,
    # migan_default.py:309-312,387-396): the data pipeline is addressed by
    # absolute batch index — the sampler fast-forwards past the
    # `state.step` batches already consumed, per-item mask/flip RNG
    # continues at the same global item positions, and per-step noise keys
    # are fold_in(data_key, batch_idx) rather than a sequential split
    # chain — so kill+resume replays EXACTLY the uninterrupted run
    # (asserted bitwise in tests/test_train_loop.py).
    data_key = jax.random.fold_in(key, 0x5eed)
    skip_items = int(state.step) * local_bs
    sampler_it = iter(sampler)
    if skip_items:
        next(itertools.islice(sampler_it, skip_items - 1, skip_items))
    # seed=: per-item mask/flip RNG derived from (seed, GLOBAL item
    # position) — bit-reproducible at any dataset_num_workers (the
    # reference's torch DataLoader per-worker seeding gave determinism
    # only per worker count; the global-np.random fallback here isn't
    # even that). Positions are block-strided to match the sampler: this
    # shard's j-th item of its b-th batch sits at global position
    # b*batch_size + proc*local_bs + j, so shards never share a
    # mask/flip stream and a multi-process run draws EXACTLY the
    # single-process stream, row order included (bitwise train parity).
    loader = DataLoader(trainset, local_bs, indices=sampler_it,
                        num_workers=cfgt.get("dataset_num_workers") or 4,
                        seed=seed,
                        start_position=skip_items * n_proc
                        + proc * local_bs,
                        position_stride=n_proc,
                        position_block=local_bs)

    mesh = make_mesh()
    state = replicate(state, mesh)
    if isinstance(teacher_fn, tuple):
        # teacher weights live on-device once (replicated), then ride
        # through every step dispatch as a cheap traced argument — a
        # host-numpy pytree here would re-upload ~310 MB per call
        t_apply, t_params = teacher_fn
        teacher_fn = (t_apply, replicate(t_params, mesh))
    # steps_per_call > 1: one donated program advances k optimizer steps
    # per dispatch (make_fused_train_step) — throughput-neutral on one
    # chip but keeps the host out of the loop; batches are buffered and
    # stacked below. Default 1 = the four per-phase programs.
    spc = int(cfgt.get("steps_per_call") or 1)
    if spc > 1:
        from .train_step import make_fused_train_step

        fused_fn = make_fused_train_step(g_cfg, d_cfg, tcfg,
                                         teacher_fn=teacher_fn,
                                         steps_per_call=spc)
        step_fn = None
    else:
        fused_fn = None
        step_fn = make_train_step(g_cfg, d_cfg, tcfg, teacher_fn=teacher_fn)

    d_reg_interval = cfgt.get("d_reg_interval") or 0
    # wire_format 'u8': ship batches to the device as uint8 (4x fewer
    # bytes; decoded on-device, train_step._decode_batch). Worth it when
    # host->device bandwidth is the wall (remote-TPU tunnel). Default
    # 'f32' keeps the reference-exact float pipeline: u8 rounds training
    # inputs to the 1/127.5 grid and clips bicubic overshoot.
    wire = cfgt.get("wire_format") or "f32"
    if wire not in ("f32", "u8"):
        raise ValueError(f"train.wire_format must be f32|u8, got {wire!r}")

    # ----- loop ------------------------------------------------------------
    total_kimg = cfgt.get("total_kimg", 25000)
    kimg_per_tick = cfgt.get("kimg_per_tick", 4)
    snapshot = cfgt.get("snapshot", {})
    collector = training_stats.default_collector()
    stats_jsonl = (open(osp.join(log_dir, "stats.jsonl"), "at")
                   if is_chief else None)
    tb = _make_tb_writer(log_dir) if is_chief else None

    cur_nimg = int(state.nimg)
    batch_idx = int(state.step)
    cur_tick = 0
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()
    start_time = tick_start_time
    best_metric = None
    metric_ctx = _build_metric_ctx(cfg)

    ckpt_dir = osp.join(log_dir, "weight")

    drew_init = False
    done = False
    step_buf: list = []  # buffered (real, mask) host batches (spc > 1)
    key_buf: list = []
    pending_stats: list = []  # per-dispatch device stat dicts (spc > 1)

    def _drain_stats():
        """Materialize deferred per-dispatch stats (one pipelined
        device_get per dict) and report rows in dispatch order."""
        for sstats in pending_stats:
            host = jax.device_get(sstats)
            r1_ran = host.pop("Misc/r1_ran")
            for i in range(spc):
                row = {k: float(v[i]) for k, v in host.items()}
                if r1_ran[i] < 0.5:   # R1 skipped: don't report zeros
                    row.pop("Loss/r1_penalty", None)
                    row.pop("Loss/D/reg", None)
                training_stats._default_registry.report_dict(row)
        pending_stats.clear()
    for x, mask, _uid in loader:
        if not drew_init:
            # init grids (reference draw_functor isinit branch,
            # migan_default.py:99-129: reals / masks / erased sheets)
            drew_init = True
            if is_chief:
                m = mask[..., None]
                _save_image_grid(x, osp.join(log_dir, "reals.png"))
                _save_image_grid(m * 2 - 1, osp.join(log_dir, "masks.png"))
                _save_image_grid(x * m, osp.join(log_dir, "erased.png"))
        # noise key addressed by absolute optimizer-step index (resume- and
        # history-independent); in fused mode batch_idx advances only at
        # dispatch, so buffered batches take the next len(step_buf) indices
        k_step = jax.random.fold_in(data_key, batch_idx + len(step_buf))
        if fused_fn is not None:
            step_buf.append(_encode_wire(np.asarray(x),
                                         np.asarray(mask[..., None]), wire))
            key_buf.append(k_step)
            if len(step_buf) < spc:
                continue
            stacked = shard_batch_stacked({
                "real": np.stack([r for r, _ in step_buf]),
                "mask": np.stack([m for _, m in step_buf]),
            }, mesh)
            state, sstats = fused_fn(state, stacked, jnp.stack(key_buf))
            step_buf.clear()
            key_buf.clear()
            # Defer stats materialization to the tick boundary: fetching
            # the stat dict here blocks on the dispatch just enqueued,
            # serializing host batch-building with device compute and the
            # batch upload (measured 13.9 -> see BENCH notes on the
            # remote tunnel). Device arrays are tiny; drain in _drain().
            pending_stats.append(sstats)
            cur_nimg += batch_size * spc
            batch_idx += spc
        else:
            xw, mw = _encode_wire(np.asarray(x), np.asarray(mask[..., None]),
                                  wire)
            batch = shard_batch({
                "real": jnp.asarray(xw),
                "mask": jnp.asarray(mw),
            }, mesh)
            do_dr1 = (d_reg_interval > 0
                      and batch_idx % d_reg_interval == 0)
            state, stats = step_fn(state, batch, k_step, do_dr1=do_dr1)
            training_stats._default_registry.report_dict(
                {k: float(v) for k, v in stats.items()})
            cur_nimg += batch_size
            batch_idx += 1
        done = (cur_nimg >= total_kimg * 1000
                or (max_steps is not None and batch_idx >= max_steps))

        if (not done) and (cur_nimg < tick_start_nimg
                           + kimg_per_tick * 1000):
            continue

        # ---- tick maintenance (reference migan_default.py:429-585) -------
        _drain_stats()
        tick_time = time.time() - tick_start_time
        collector.update()
        resources = _resource_stats()
        fields = {
            "tick": cur_tick,
            "kimg": round(cur_nimg / 1000.0, 1),
            "time_sec": round(time.time() - start_time, 1),
            "sec_per_kimg": round(
                tick_time / max(cur_nimg - tick_start_nimg, 1) * 1000, 2),
        }
        line = "  ".join(f"{k} {v}" for k, v in fields.items())
        loss_keys = [k for k in collector.names() if k.startswith("Loss/")]
        line += "  " + "  ".join(
            f"{k.split('/', 1)[1]} {collector.mean(k):.3f}"
            for k in sorted(loss_keys)[:6])
        if "Resources/cpu_mem_gb" in resources:
            line += f"  cpumem {resources['Resources/cpu_mem_gb']:.2f}g"
        if "Resources/peak_device_mem_gb" in resources:
            line += (f"  devmem "
                     f"{resources['Resources/peak_device_mem_gb']:.2f}g")
        if is_chief:
            print_log(line)
            stats_jsonl.write(json.dumps(
                {**fields, **collector.as_dict(), **resources}) + "\n")
            stats_jsonl.flush()
        if tb is not None:
            for k in collector.names():
                tb.add_scalar(k, collector.mean(k), cur_nimg)
            for k, v in resources.items():
                tb.add_scalar(k, v, cur_nimg)
            tb.flush()

        if (is_chief and snapshot.get("image")
                and cur_tick % snapshot["image"] == 0):
            try:
                from ..models.migan import generator_apply as g_apply

                # host-local data (the global batch isn't addressable from
                # one process in multi-host runs); EMA params are
                # replicated, hence fetchable everywhere
                real = np.asarray(x)
                m = np.asarray(mask[..., None])
                ema_host = jax.tree_util.tree_map(np.asarray,
                                                  state.params_G_ema)
                demo = np.asarray(g_apply(
                    ema_host,
                    np.concatenate([m - 0.5, real * m], axis=-1),
                    g_cfg, noise_mode="const"))
                tag = f"{cur_nimg // 1000:06d}"
                _save_image_grid(demo,
                                 osp.join(log_dir, f"fakes{tag}.png"))
                # composited sheet (reference draw_functor's *_combined,
                # migan_default.py:52-129): known pixels from the real,
                # hole filled by the generator
                _save_image_grid(real * m + demo * (1 - m), osp.join(
                    log_dir, f"fakes{tag}_combined.png"))
            except Exception as e:  # pragma: no cover
                print_log(f"image snapshot failed: {e}")

        # NOTE on multi-process gating: orbax saves are COLLECTIVE —
        # PyTreeCheckpointer.save runs a cross-process sync barrier when
        # jax.process_count() > 1, so EVERY process must enter ckpt.save
        # (chief-only saving deadlocks the chief in the barrier; found
        # live by tests/test_multihost.py::test_two_process_train_parity).
        # The metric EVALUATION stays chief-only (local detector passes);
        # its verdict is broadcast so all processes agree on best-saves.
        if (snapshot.get("evaluate") and metric_ctx is not None
                and cur_tick % snapshot["evaluate"] == 0 and cur_tick > 0):
            fid = (_run_metrics(cfg, state, g_cfg, metric_ctx, log_dir)
                   if is_chief else None)
            if n_proc > 1:
                from jax.experimental import multihost_utils

                fid_b = multihost_utils.broadcast_one_to_all(
                    np.float32(np.nan if fid is None else fid))
                fid = None if np.isnan(fid_b) else float(fid_b)
            if fid is not None and is_chief:
                print_log(f"tick {cur_tick}  Metrics/fid {fid:.3f}")
                if stats_jsonl is not None:
                    stats_jsonl.write(json.dumps(
                        {"tick": cur_tick, "kimg": round(cur_nimg / 1e3, 1),
                         "Metrics/fid": fid}) + "\n")
                    stats_jsonl.flush()
                if tb is not None:
                    tb.add_scalar("Metrics/fid", fid, cur_nimg)
            if fid is not None and (best_metric is None
                                    or fid < best_metric):
                best_metric = fid   # reference is_better: lowest FID
                best_dir = osp.join(ckpt_dir, "best")
                path = ckpt.save(best_dir, batch_idx, state)
                # single best snapshot (reference keeps one best pkl,
                # migan_default.py:139-146): drop superseded best steps
                if is_chief:
                    import shutil

                    for d in os.listdir(best_dir):
                        full = osp.join(best_dir, d)
                        if full != path and d.startswith("step_"):
                            shutil.rmtree(full, ignore_errors=True)
                    print_log(f"new best FID {fid:.3f}: {path}")

        if snapshot.get("checkpoint") and (
                cur_tick % snapshot["checkpoint"] == 0 or done):
            path = ckpt.save(ckpt_dir, batch_idx, state)
            if is_chief:
                print_log(f"checkpoint: {path}")

        cur_tick += 1
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()
        if done:
            break

    if stats_jsonl is not None:
        stats_jsonl.close()
    if tb is not None:
        tb.close()
    return state
