"""videoitg-select: single-video Top-K frame selection (infer.py parity CLI).

Mirrors the reference demo (infer.py:34-101): sample 512 frames at
target_fps=2 with the infer-path rounding, score against the prompt, print
the Top-K original frame indices sorted ascending, optionally dump them as
JPEGs.

Examples:
  videoitg-select --model /ckpts/VideoITG-8B --video clip.mp4 \\
      --prompt "Which scene shows the rocket launch?" --topk 32
  videoitg-select --preset tiny --random-init --video clip.mp4 --prompt "q"
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("videoitg-select", description=__doc__)
    p.add_argument("--model", help="HF-format VideoITG checkpoint directory")
    p.add_argument("--preset", default="videoitg-8b", help="model preset name")
    p.add_argument("--random-init", action="store_true",
                   help="random weights (smoke tests; no checkpoint needed)")
    p.add_argument("--video", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--topk", type=int, default=32)
    p.add_argument("--num-frames", type=int, default=512)
    p.add_argument("--target-fps", type=float, default=2.0)
    p.add_argument("--sampling", choices=["infer", "eval"], default="infer")
    p.add_argument("--save-frames", metavar="DIR",
                   help="save selected frames as JPEGs to DIR")
    p.add_argument("--json", action="store_true",
                   help="print the full results.jsonl-style record")
    p.add_argument("--dtype", default=None, choices=[None, "bfloat16", "float32"])
    p.add_argument("--quantize", default=None, choices=[None, "int8", "int4", "act8"],
                   help="serving quantization of the LM: int8 / int4 weights, "
                        "act8 = int8 weights + dynamic int8 activations "
                        "(an 8B bf16 does not fit one v5e chip)")
    p.add_argument("--export-serving", metavar="DIR",
                   help="after loading (+ --quantize), persist a ready-to-"
                        "serve checkpoint (pre-quantized params + config + "
                        "tokenizer); later runs pass it as --model and skip "
                        "the HF convert + quantization cold-start work")
    p.add_argument("--transfer", default="rgb", choices=["rgb", "yuv420"],
                   help="yuv420: ship native YUV planes (half the "
                        "host->device bytes) and convert on device")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from videoitg_tpu.engine import SelectionEngine
    from videoitg_tpu.utils.common import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from videoitg_tpu.utils.common import resolve_dtype

    dtype = resolve_dtype(args.dtype)

    from videoitg_tpu.cli._model_loading import load_grounding_components

    try:
        params, cfg, tokenizer = load_grounding_components(
            args.model, args.preset, args.random_init, dtype,
            quantize=args.quantize, tool="videoitg-select")
    except SystemExit as e:
        print(e, file=sys.stderr)
        return 2

    if args.export_serving:
        from videoitg_tpu.checkpoint import save_serving_checkpoint

        out = save_serving_checkpoint(
            params, cfg, args.export_serving, quantize=args.quantize,
            tokenizer_dir=args.model if args.model else None)
        print(f"[videoitg-select] serving checkpoint written to {out}",
              file=sys.stderr)

    engine = SelectionEngine(
        params, cfg, tokenizer, dtype=dtype,
        num_frames=args.num_frames, target_fps=args.target_fps,
        transfer=args.transfer,
    )
    result = engine.select_from_file(args.video, args.prompt, sampling=args.sampling)
    selected = result.topk(args.topk)

    if args.json:
        print(json.dumps(result.to_reference_json(), ensure_ascii=False))
    else:
        print(selected)

    if args.save_frames:
        from PIL import Image

        from videoitg_tpu.data.video import VideoReader

        os.makedirs(args.save_frames, exist_ok=True)
        with VideoReader(args.video) as vr:
            for i, frame_idx in enumerate(selected):
                img = Image.fromarray(vr[frame_idx])
                img.save(os.path.join(
                    args.save_frames, f"frame_{i:03d}_idx{frame_idx}.jpg"), "JPEG")
        print(f"saved {len(selected)} frames to {args.save_frames}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
