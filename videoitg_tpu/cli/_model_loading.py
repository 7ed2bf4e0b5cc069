"""Shared model/tokenizer resolution for the serving CLIs.

videoitg-select and videoitg-serve accept the same trio of knobs
(--model DIR | --preset NAME --random-init, plus --quantize); this is the
one implementation both call.
"""

from __future__ import annotations

import sys


def load_grounding_components(model: str | None, preset_name: str,
                              random_init: bool, dtype,
                              quantize: str | None = None,
                              tool: str = "videoitg"):
    """(params, cfg, tokenizer) from a checkpoint dir or a random-init
    preset, with optional serving quantization applied."""
    import jax

    from videoitg_tpu.utils.common import CharTokenizer

    if model:
        from transformers import AutoTokenizer

        from videoitg_tpu.checkpoint import (
            is_serving_checkpoint, load_grounding_model,
            load_serving_checkpoint,
        )

        if is_serving_checkpoint(model):
            # Pre-quantized serving checkpoint: skip the HF convert +
            # quantization passes entirely (cold-start path).
            params, cfg, saved_tier = load_serving_checkpoint(model)
            if quantize and quantize != saved_tier:
                raise SystemExit(
                    f"error: serving checkpoint was saved with "
                    f"quantize={saved_tier!r}; requested {quantize!r}")
            quantize = None  # already applied at save time
        else:
            params, cfg = load_grounding_model(model, dtype=dtype)
        tokenizer = AutoTokenizer.from_pretrained(model)
    elif random_init:
        from videoitg_tpu.config import preset as get_preset
        from videoitg_tpu.models.grounding import init_grounding

        cfg = get_preset(preset_name)
        params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=dtype)
        tokenizer = CharTokenizer(cfg.lm.vocab_size)
        print(f"[{tool}] WARNING: random weights — scores are noise",
              file=sys.stderr)
    else:
        raise SystemExit("error: pass --model DIR or --random-init")

    if quantize:
        from videoitg_tpu.ops.quant import apply_quantization_tier

        params = apply_quantization_tier(params, quantize)
    return params, cfg, tokenizer
