"""videoitg-train: grounding finetune / VLM SFT on VideoITG-format data.

TPU-native counterpart of the reference's train_itg.py AND train_vlm.py +
DeepSpeed launch (scripts/videoitg/*.sh): GSPMD mesh instead of ZeRO, optax
multi-LR groups (out_proj 10x), cosine + warmup, frozen vision tower,
gradient rematerialization, orbax checkpoints with auto-resume.

--objective grounding (default): BCE frame-relevance loss on
  {"video","question","clip_num"} records (train_itg.py).
--objective vlm: next-token CE over assistant spans on
  {"video"|"image","conversations"} records, plain or ChatML template
  (train_vlm.py; --fps -1 enables the random-fps augmentation).

Smoke run (no checkpoint, synthetic-capable):
  videoitg-train --preset tiny --random-init --data-path data.json \\
      --image-folder vids/ --total-steps 20 --cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("videoitg-train", description=__doc__)
    # model
    p.add_argument("--model", help="HF-format checkpoint dir to finetune")
    p.add_argument("--preset", default="videoitg-8b")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--tokenizer", help="tokenizer path (defaults to --model)")
    p.add_argument("--objective", default="grounding", choices=["grounding", "vlm"])
    p.add_argument("--conv-template", default="plain", choices=["plain", "chatml"],
                   help="vlm objective: conversation template (reference --version)")
    # data (reference flag names)
    p.add_argument("--data-path", required=True)
    p.add_argument("--image-folder", required=True)
    p.add_argument("--video-frames", type=int, default=1024)
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--pix-fmt", default="rgb", choices=["rgb", "yuv420"],
                   help="yuv420: decode ships native YUV planes (2x faster "
                        "host decode, half the upload); device converts")
    p.add_argument("--feature-cache", default=None, metavar="DIR",
                   help="grounding objective: cache frozen-tower features "
                        "here; cache hits skip decode+preprocess+tower "
                        "(the tower is frozen in every released recipe)")
    p.add_argument("--feature-cache-dtype", default="bf16",
                   choices=["bf16", "int8"],
                   help="feature storage: bf16 (exact vs bf16 training) "
                        "or int8 (4x smaller, ~0.4%% feature error)")
    p.add_argument("--precompute-features", action="store_true",
                   help="fill --feature-cache over the whole dataset, "
                        "then exit (no training)")
    p.add_argument("--vision-token-num", type=int, default=None,
                   help="seq_mlp total vision-token budget override "
                        "(reference --vision_token_num; the grounding "
                        "recipe uses 16384)")
    p.add_argument("--vision-min-num", type=int, default=None,
                   help="lower bound of the training-time random HW draw "
                        "(reference --vision_min_num)")
    # optimization (reference defaults)
    p.add_argument("--learning-rate", type=float, default=2e-5)
    p.add_argument("--out-proj-lr", type=float, default=2e-4)
    p.add_argument("--mm-projector-lr", type=float, default=None)
    p.add_argument("--tune-projector-only", action="store_true",
                   help="stage-1 adapter pretrain: train only the projector "
                        "(reference --tune_mm_mlp_adapter True)")
    p.add_argument("--lora", type=int, default=0, metavar="RANK",
                   help="train LoRA adapters of this rank (+ the scoring "
                        "head) instead of full weights (reference "
                        "--lora_enable/--lora_r, train_itg.py:192-197)")
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--quantize-base", choices=["int8", "int4"], default=None,
                   help="with --lora: freeze the LM base in this quantized "
                        "form (QLoRA; reference bits=8/4 + peft)")
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--warmup-ratio", type=float, default=0.05)
    p.add_argument("--lr-scheduler-type", default="cosine")
    p.add_argument("--num-train-epochs", type=int, default=1)
    p.add_argument("--total-steps", type=int, default=None,
                   help="override steps (else epochs * len(data) / batch)")
    p.add_argument("--per-device-train-batch-size", type=int, default=1)
    p.add_argument("--gradient-accumulation-steps", type=int, default=1)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    # infra
    p.add_argument("--output-dir", default="./checkpoints-itg")
    p.add_argument("--report-to", default="jsonl", help="jsonl | jsonl,wandb | none")
    p.add_argument("--run-name", default=None)
    p.add_argument("--save-steps", type=int, default=500)
    p.add_argument("--save-total-limit", type=int, default=2)
    p.add_argument("--async-save", action="store_true",
                   help="serialize periodic checkpoints in the background "
                        "(pods: overlaps the disk write with training; a "
                        "kill before finalization loses the newest save)")
    p.add_argument("--logging-steps", type=int, default=1)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--tp", type=int, default=None)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel axis size: the grounding LM's "
                        "long sequence trains as custom-VJP ring attention "
                        "over this many chips (no reference counterpart)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages: the decoder stack is "
                        "layer-sharded over this many chips and microbatch-"
                        "pipelined (parallel/pipeline.py; no reference "
                        "counterpart). Global batch must be divisible by "
                        "--pp-microbatches when set")
    p.add_argument("--pp-microbatches", type=int, default=None,
                   help="microbatches per pipeline step (default: largest "
                        "divisor of the global batch <= pp)")
    p.add_argument("--offload-optimizer", action="store_true",
                   help="park optimizer state in pinned host memory between "
                        "steps (ZeRO-3-offload equivalent; TPU only)")
    p.add_argument("--dtype", default=None, choices=[None, "bfloat16", "float32"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from videoitg_tpu.config import preset
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.parallel.mesh import batch_sharding, make_mesh
    from videoitg_tpu.parallel.sharding import grounding_param_specs, shard_params
    from videoitg_tpu.train.checkpointing import TrainCheckpointer
    from videoitg_tpu.train.collate import collate_grounding
    from videoitg_tpu.train.dataset import (
        GroundingDataset, make_batches, prefetch_batches,
    )
    from videoitg_tpu.train.optimizer import make_grounding_optimizer
    from videoitg_tpu.train.train_step import (
        create_train_state, make_train_step, run_step,
    )

    from videoitg_tpu.utils.common import (
        CharTokenizer, enable_persistent_compilation_cache, resolve_dtype,
    )

    enable_persistent_compilation_cache()
    on_cpu = jax.default_backend() == "cpu"
    dtype = resolve_dtype(args.dtype)

    # ---- model + tokenizer ----
    def causal_variant(c, tie=None):
        from videoitg_tpu.config import GroundingConfig, LMConfig

        # tie=True only for random init (no lm_head to load); pretrained
        # checkpoints keep the preset's setting (Qwen2-7B is untied — forcing
        # tie would silently drop the checkpoint's lm_head).
        lm_kw = {**c.lm.__dict__, "causal": True}
        if tie is not None:
            lm_kw["tie_word_embeddings"] = tie
        return GroundingConfig(
            vision=c.vision, projector=c.projector, lm=LMConfig(**lm_kw),
            max_text_len=c.max_text_len,
        )

    if args.model:
        from transformers import AutoTokenizer

        if args.objective == "vlm":
            from videoitg_tpu.checkpoint import convert_vlm_checkpoint, load_hf_state_dict

            cfg = causal_variant(preset(args.preset))
            params = convert_vlm_checkpoint(load_hf_state_dict(args.model), cfg,
                                            dtype=dtype)
        else:
            from videoitg_tpu.checkpoint import load_grounding_model

            params, cfg = load_grounding_model(args.model, dtype=dtype)
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer or args.model)
    elif args.random_init:
        cfg = preset(args.preset)
        if args.objective == "vlm":
            cfg = causal_variant(cfg, tie=True)
        params = init_grounding(jax.random.PRNGKey(args.seed), cfg, dtype=dtype)

        tokenizer = CharTokenizer(cfg.lm.vocab_size)
    else:
        print("error: pass --model or --random-init", file=sys.stderr)
        return 2

    if args.vision_token_num is not None or args.vision_min_num is not None:
        # Training projector-budget overrides (reference train_itg.py
        # ModelArguments: --vision_token_num 16384 --vision_min_num 1 in the
        # grounding recipe); copied into the config so checkpoints stay
        # self-describing, like the reference's model.config copy-in.
        import dataclasses as _dc

        proj = cfg.projector
        if args.vision_token_num is not None:
            proj = _dc.replace(proj, vision_token_num=args.vision_token_num)
        if args.vision_min_num is not None:
            proj = _dc.replace(proj, vision_min_num=args.vision_min_num)
        cfg = _dc.replace(cfg, projector=proj)

    # ---- data ----
    if args.objective == "vlm":
        from videoitg_tpu.train.vlm_sft import VLMDataset

        dataset = VLMDataset(
            args.data_path, args.image_folder, tokenizer, cfg,
            template=args.conv_template, video_frames=args.video_frames,
            fps=args.fps, seed=args.seed,
        )
    else:
        dataset = GroundingDataset(
            args.data_path, args.image_folder, tokenizer, cfg,
            video_frames=args.video_frames, fps=args.fps, seed=args.seed,
            pix_fmt=args.pix_fmt,
        )
    if args.quantize_base and not args.lora:
        print("error: --quantize-base requires --lora (a quantized base "
              "cannot be trained directly; QLoRA trains adapters over it)",
              file=sys.stderr)
        return 2
    if args.lora:
        # LoRA / QLoRA (reference train_itg.py:1252-1268 peft wrap, with
        # bitsandbytes 8/4-bit base when --quantize-base is set). The base
        # stays frozen (quantized leaves get float0 grads -> set_to_zero);
        # adapters + the scoring head train.
        from videoitg_tpu.train.lora import add_lora

        if args.quantize_base == "int8":
            from videoitg_tpu.ops.quant import quantize_grounding_int8

            params = quantize_grounding_int8(params)
        elif args.quantize_base == "int4":
            from videoitg_tpu.ops.quant import quantize_qwen2_int4

            params = dict(params, lm=quantize_qwen2_int4(params["lm"]))
        params = add_lora(params, jax.random.PRNGKey(args.seed + 1),
                          rank=args.lora, alpha=args.lora_alpha)

    if args.feature_cache:
        if args.objective != "grounding":
            print("error: --feature-cache supports the grounding objective "
                  "only (the VLM SFT tower also trains on image samples)",
                  file=sys.stderr)
            return 2
        from videoitg_tpu.train.feature_cache import (
            CachedFeatureDataset, FeatureCache,
        )

        cache = FeatureCache(args.feature_cache,
                             store_dtype=args.feature_cache_dtype)
        dataset = CachedFeatureDataset(dataset, cache, params, cfg,
                                       use_flash=not on_cpu)
        if args.precompute_features:
            t0 = time.time()
            for i in range(len(dataset)):
                dataset[i]
                if (i + 1) % 10 == 0 or i + 1 == len(dataset):
                    print(f"[feature-cache] {i + 1}/{len(dataset)} "
                          f"({cache.stats()}, {time.time() - t0:.0f}s)")
            print(f"[feature-cache] done: {cache.stats()} in "
                  f"{args.feature_cache}")
            return 0

    batch_size = args.per_device_train_batch_size
    n_devices = len(jax.devices())
    mesh = None
    if n_devices > 1:
        from videoitg_tpu.parallel.sharding import adapt_specs_to_params

        mesh = make_mesh(dp=args.dp, tp=args.tp, sp=args.sp, pp=args.pp)
        dp = mesh.shape["dp"]
        batch_size = batch_size * dp
        params = shard_params(
            params,
            adapt_specs_to_params(
                grounding_param_specs(pp=args.pp > 1), params),
            mesh)

    total_steps = args.total_steps or max(
        1, args.num_train_epochs * len(dataset) // batch_size
    )

    # ---- optimizer / state ----
    if args.lora:
        from videoitg_tpu.train.lora import make_lora_optimizer

        tx = make_lora_optimizer(
            params,
            learning_rate=args.learning_rate,
            out_proj_lr=args.out_proj_lr,
            total_steps=total_steps,
            warmup_ratio=args.warmup_ratio,
            schedule=args.lr_scheduler_type,
            weight_decay=args.weight_decay,
            max_grad_norm=args.max_grad_norm,
            accum_steps=args.gradient_accumulation_steps,
        )
    else:
        tx = make_grounding_optimizer(
            params,
            learning_rate=args.learning_rate,
            out_proj_lr=args.out_proj_lr,
            projector_lr=args.mm_projector_lr,
            weight_decay=args.weight_decay,
            total_steps=total_steps,
            warmup_ratio=args.warmup_ratio,
            schedule=args.lr_scheduler_type,
            max_grad_norm=args.max_grad_norm,
            accum_steps=args.gradient_accumulation_steps,
            tune_projector_only=args.tune_projector_only,
        )
    state = create_train_state(params, tx)

    offload_wrap = None
    if args.offload_optimizer:
        from videoitg_tpu.train.offload import (
            make_offloaded_train_step, offload_opt_state, supports_host_offload,
        )

        if supports_host_offload():
            dev_shardings = jax.tree.map(lambda x: x.sharding, state.opt_state)
            state = state._replace(opt_state=offload_opt_state(state.opt_state, mesh))
            offload_wrap = lambda fn: make_offloaded_train_step(fn, dev_shardings, mesh)  # noqa: E731
        else:
            print("[train] host offload unsupported on this backend; ignoring")

    from videoitg_tpu.utils.metrics_logger import MetricsLogger

    mlog = MetricsLogger(args.output_dir, report_to=args.report_to,
                         run_name=args.run_name, config=vars(args))
    ckpt = TrainCheckpointer(args.output_dir, max_to_keep=args.save_total_limit,
                             save_interval=args.save_steps,
                             async_save=args.async_save)
    resume_step, restored = ckpt.restore_latest(state)
    if restored is not None:
        state = restored
        print(f"[train] auto-resumed from step {resume_step}")

    step_fns = {}
    start = int(state.step)
    step = last_logged = start
    t_window = time.time()
    # Decode-ahead: a producer thread keeps 2 batches of decoded frames
    # ready (libav releases the GIL, so decode overlaps the device step —
    # the reference's dataloader_num_workers=6 counterpart).
    for epoch_batches in [prefetch_batches(
            make_batches(dataset, batch_size, cfg,
                         epochs=args.num_train_epochs, seed=args.seed))]:
        for t_bucket, hw, samples in epoch_batches:
            if step >= total_steps:
                break
            if mesh is not None and len(samples) % mesh.shape["dp"] != 0:
                # leftover group smaller than the dp axis: drop (the
                # reference's DataLoader drop_last equivalent)
                print(f"[train] dropping leftover batch of {len(samples)} "
                      f"(not divisible by dp={mesh.shape['dp']})")
                continue
            if args.objective == "vlm":
                from videoitg_tpu.train.vlm_sft import collate_vlm

                batch = collate_vlm(samples, t_bucket, cfg, dtype=dtype)
            else:
                batch = collate_grounding(samples, t_bucket, cfg, dtype=dtype)
            if mesh is not None:
                bs = batch_sharding(mesh)
                batch = jax.tree.map(lambda x: jax.device_put(x, bs), batch)
            key = (hw, t_bucket, len(samples))
            if key not in step_fns:
                if args.objective == "vlm":
                    from videoitg_tpu.train.vlm_sft import make_vlm_train_step

                    fn = make_vlm_train_step(cfg, tx, hw=hw,
                                             use_flash=not on_cpu, remat=True,
                                             donate=True)
                else:
                    fn = make_train_step(cfg, tx, hw=hw, use_flash=not on_cpu,
                                         remat=True, donate=True)
                step_fns[key] = offload_wrap(fn) if offload_wrap else fn
            state, metrics = run_step(step_fns[key], state, batch, mesh=mesh,
                                      microbatches=args.pp_microbatches)
            step = int(state.step)
            if step % args.logging_steps == 0:
                m = {k: float(v) for k, v in metrics.items()}
                mlog.log(step, m)
                extras = " ".join(f"{k}={v:.3f}" for k, v in m.items()
                                  if k not in ("loss", "grad_norm"))
                # Windowed step time (since the last log line): the first
                # window absorbs compile; later windows are steady-state.
                now = time.time()
                s_per_step = (now - t_window) / max(1, step - last_logged)
                t_window, last_logged = now, step
                print(f"[train] step {step}/{total_steps} "
                      f"loss={m['loss']:.4f} grad_norm={m['grad_norm']:.3f} "
                      f"{extras} "
                      f"({s_per_step:.1f}s/step)")
            ckpt.maybe_save(step, state)

    ckpt.maybe_save(step, state, force=True)
    ckpt.close()
    mlog.close()
    print(f"[train] done at step {step}; checkpoints in {ckpt.directory}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
