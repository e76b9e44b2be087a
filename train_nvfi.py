#!/usr/bin/env python
"""Train / evaluate an NVFi scene (TPU-native).

CLI mirrors reference train_nvfi.py:462-515:

  python train_nvfi.py --config configs/synth/bat.yaml [--static|--static_dynamic|--vel]
                       [--checkpoint N] [--not_train] [--eval_test] [--eval_val]
                       [--full_res] [--iters N] [--synthetic]

Differences from the reference, on purpose:
  * --synthetic trains on the built-in analytic scene when no dataset exists
    on disk (the repo ships no NVFi data).
  * --devices N builds an N-chip data mesh (default: all available).
  * the broken reference paths are fixed: --vel works (optimizes only the
    velocity net), --eval_test does not NameError (SURVEY.md §2.3).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_dataset(cfg, args):
    if args.synthetic or not os.path.exists(
        os.path.join(cfg.dataset.basedir, "transforms_train.json")
    ):
        from nvfi_tpu.data import make_synthetic_scene

        if not args.synthetic:
            print(f"[data] {cfg.dataset.basedir} not found -> synthetic scene")
        return make_synthetic_scene(
            n_train=args.synth_frames, n_val=4, n_test=8,
            H=args.synth_res, W=args.synth_res,
            tmax_frac=float(cfg.nvfi.tmax),
            white_background=bool(cfg.dataset.white_background),
            objects=str(cfg.dataset.get("synthetic_objects", "bat")),
        )[:7]
    from nvfi_tpu.data import load_blender_data

    return load_blender_data(
        basedir=cfg.dataset.basedir,
        half_res=bool(cfg.dataset.half_res),
        testskip=int(cfg.dataset.test_skip),
        white_background=bool(cfg.dataset.white_background),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=int, default=0)
    parser.add_argument("--not_train", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--validate", action="store_true",
                        help="render a val view every validate_every iters")
    parser.add_argument("--eval_val", action="store_true")
    parser.add_argument("--eval_test", action="store_true")
    parser.add_argument("--full_res", action="store_true")
    parser.add_argument("--static", action="store_true")
    parser.add_argument("--vel", action="store_true")
    parser.add_argument("--static_dynamic", action="store_true")
    parser.add_argument("--iters", type=int, default=0, help="override train_iters")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synth_res", type=int, default=96)
    parser.add_argument("--synth_frames", type=int, default=48)
    parser.add_argument("--devices", type=int, default=0)
    parser.add_argument("--logdir", type=str, default="")
    parser.add_argument("--resume", action="store_true",
                        help="restore the latest checkpoint from --logdir and "
                             "continue training in place")
    parser.add_argument("--profile", type=int, default=0,
                        help="wrap the first N train steps in a "
                             "jax.profiler trace written to <logdir>/profile")
    parser.add_argument("--supervise", action="store_true",
                        help="run training under the in-framework supervisor: "
                             "stall detection on <logdir>/heartbeat + "
                             "auto-resume from the latest checkpoint "
                             "(nvfi_tpu/train/supervisor.py)")
    parser.add_argument("--stall_timeout", type=float, default=720.0,
                        help="seconds of heartbeat silence before the "
                             "supervisor kills and resumes the run")
    parser.add_argument("opts", nargs="*", help="dot-path config overrides: key value ...")
    args = parser.parse_args()

    from nvfi_tpu.config import load_config

    cfg = load_config(args.config, args.opts or None)
    if args.full_res:
        cfg.dataset.half_res = False

    mode = "static" if args.static else "vel" if args.vel else "static_dynamic" \
        if args.static_dynamic else "dynamic"

    logdir = args.logdir or os.path.join(
        str(cfg.experiment.logdir), str(cfg.wandb.project), str(cfg.wandb.name)
    )
    if args.checkpoint:
        logdir = os.path.join(logdir, "from_checkpoint")
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "config.yaml"), "w") as f:
        f.write(cfg.dump())

    if args.supervise:
        # re-exec the identical command as a supervised child (before any jax
        # import so the parent never holds the TPU); restarts resume from the
        # latest checkpoint in --logdir
        from nvfi_tpu.train.supervisor import run_supervised

        # -u: the child's log is tailed live by humans and watchdogs; without
        # it stdout buffers and the log lags minutes behind the heartbeat
        base = [sys.executable, "-u", os.path.abspath(sys.argv[0])] + [
            a for a in sys.argv[1:] if a != "--supervise"
        ]

        def build_argv(attempt):
            if attempt and "--resume" not in base:
                return base + ["--resume", "--logdir", logdir]
            return list(base)

        rc, n = run_supervised(
            build_argv, os.path.join(logdir, "heartbeat"),
            stall_timeout=args.stall_timeout,
        )
        sys.exit(rc)

    import jax

    mesh = None
    if args.devices > 1 or (args.devices == 0 and len(jax.devices()) > 1):
        from nvfi_tpu.parallel import make_mesh

        mesh = make_mesh(args.devices or None)
        print(f"[mesh] data axis over {mesh.devices.size} devices")

    dataset = build_dataset(cfg, args)
    print(f"[data] H W focal = {dataset[6]}; train frames = {dataset[3]['train']}")

    from nvfi_tpu.train.trainer import Trainer
    from nvfi_tpu.train import checkpoint as ckpt_mod

    if "Keyframe" not in str(cfg.nvfi.model_name):
        # static TensoRF family (TensorVMSplit / TensorCP)
        from nvfi_tpu.train.static import StaticTrainer

        trainer = StaticTrainer(cfg, dataset)

        def slog(m):
            print(f"[static] it={m['it']} loss={m['loss']:.5f} "
                  f"psnr0={m['psnr_0']:.2f} ({m['elapsed']:.0f}s)", flush=True)

        if not args.not_train:
            trainer.train(iters=args.iters or None, log_fn=slog)
        return

    trainer = Trainer(cfg, dataset, mode=mode, logdir=logdir, mesh=mesh)

    if args.checkpoint or args.not_train or args.resume:
        # resume from a numbered checkpoint, or (for eval-only/--resume) the latest
        base = os.path.dirname(logdir) if args.checkpoint and logdir.endswith("from_checkpoint") else logdir
        path = ckpt_mod.find_checkpoint(base, args.checkpoint or -1)
        if path:
            trainer.restore(path)
            print(f"[ckpt] restored {path} at step {trainer.global_step}")
        elif args.not_train:
            print(f"[ckpt] WARNING: no checkpoint under {base}; evaluating fresh init")

    wandb = None
    if args.wandb:
        try:
            import wandb as _wandb

            _wandb.init(project=str(cfg.wandb.project), name=str(cfg.wandb.name),
                        config=cfg.to_dict(), notes=str(cfg.wandb.get("notes", "")))
            wandb = _wandb
        except ImportError:
            print("[wandb] package not installed; falling back to JSONL metrics")

    if not args.not_train:
        iters = args.iters or None
        metrics_path = os.path.join(logdir, "metrics.jsonl")
        metrics_f = open(metrics_path, "a")

        def log(m):
            vm = f" |v|={m['vel_mag']:.4f}" if "vel_mag" in m else ""
            print(
                f"[train] it={m['it']} loss={m['loss']:.5f} "
                f"psnr0={m['psnr_0']:.2f} psnr_t={m['psnr_t']:.2f}{vm} "
                f"({m['elapsed']:.0f}s)", flush=True,
            )
            import json

            metrics_f.write(json.dumps(m) + "\n")
            metrics_f.flush()
            if wandb:
                wandb.log(m, step=m["it"])

        val_fn = None
        if args.validate and dataset[3].get("val"):
            from nvfi_tpu.render import rays as rays_mod
            from nvfi_tpu.render.renderer import render_image
            from nvfi_tpu.eval.metrics import psnr as psnr_fn

            def val_fn(tr, it):
                H, W, focal = dataset[6]
                idx = it // max(cfg.experiment.validate_every, 1) % dataset[3]["val"]
                cam = rays_mod.Camera(dataset[1]["val"][idx], H, W, focal,
                                      near=tr.meta.near_far[0], far=tr.meta.near_far[1])
                out = render_image(
                    tr.params, tr.meta, float(dataset[2]["val"][idx]),
                    cam.rays_o.reshape(H, W, 3), cam.rays_d.reshape(H, W, 3),
                    white_bg=bool(cfg.dataset.white_background),
                )
                p = psnr_fn(out["rgb"], dataset[0]["val"][idx])
                print(f"[val] it={it} view={idx} psnr={p:.2f}", flush=True)
                from nvfi_tpu.eval.harness import save_png
                from nvfi_tpu.utils.viz import visualize_depth

                depth_vis, _ = visualize_depth(out["depth"], minmax=tr.meta.near_far)
                save_png(os.path.join(logdir, f"val_{it:06d}.png"), out["rgb"])
                save_png(os.path.join(logdir, f"val_{it:06d}_depth.png"), depth_vis)
                if wandb:
                    # validation image/depth panels (reference
                    # train_nvfi.py:311-324)
                    wandb.log({
                        "val_psnr": p,
                        "validation/rgb": wandb.Image(np.asarray(out["rgb"])),
                        "validation/depth": wandb.Image(np.asarray(depth_vis)),
                    }, step=it)

        if args.profile and (args.iters or int(cfg.experiment.train_iters)) > 0:
            # jax.profiler trace around the first N steps (SURVEY.md §5.1)
            import jax.profiler

            trace_dir = os.path.join(logdir, "profile")
            n_prof = trainer.global_step + args.profile
            try:
                with jax.profiler.trace(trace_dir):
                    trainer.train(iters=n_prof, log_fn=log, val_fn=val_fn)
                print(f"[profile] trace for {args.profile} steps -> {trace_dir}",
                      flush=True)
            except Exception as e:  # tunnel backends may lack device tracing
                print(f"[profile] tracing unavailable on this backend: {e}",
                      flush=True)

        trainer.train(
            iters=iters, log_fn=log, val_fn=val_fn,
            progress=sys.stdout.isatty(),
            progress_refresh=int(cfg.get("pbar", {}).get("progress_refresh_rate", 10)),
        )
        metrics_f.close()
        trainer.save(os.path.join(logdir, f"model_{trainer.global_step - 1:05d}"))

        if dataset[3].get("val"):
            # time-sweep video panel from a fixed val pose (the reference logs
            # a GIF video of validation renders, train_nvfi.py:311-324)
            try:
                from nvfi_tpu.eval.harness import save_gif_time_sweep

                gif_path = os.path.join(logdir, "time_sweep.gif")
                frames = save_gif_time_sweep(
                    trainer.params, trainer.meta, dataset, gif_path,
                    white_bg=bool(cfg.dataset.white_background),
                )
                print(f"[video] {frames.shape[0]}-frame time sweep -> {gif_path}",
                      flush=True)
                if wandb:
                    wandb.log({"validation/video": wandb.Video(
                        (np.clip(frames, 0, 1) * 255).astype(np.uint8).transpose(0, 3, 1, 2),
                        fps=8, format="gif",
                    )})
            except Exception as e:
                print(f"[video] skipped: {e}", flush=True)

    if args.eval_test or args.eval_val:
        from nvfi_tpu.eval.harness import render_split

        split = "test" if args.eval_test else "val"
        preds, errors = render_split(
            trainer.params, trainer.meta, dataset, split,
            white_bg=bool(cfg.dataset.white_background),
            savedir=os.path.join(logdir, f"{split}_img"),
        )
        print(f"[eval:{split}]", errors)


if __name__ == "__main__":
    main()
