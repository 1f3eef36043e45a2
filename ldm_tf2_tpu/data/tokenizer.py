"""BERT WordPiece tokenization for prompts (host-side only).

The reference tokenizes with HuggingFace `BertTokenizerFast` loaded from a
local vocab dir (run_ldm_sampler.py:28-46, dataset.py:43-70); tokenization
never touches the device, so we use the same library.
"""

from __future__ import annotations

import numpy as np


def load_tokenizer(vocab_dir: str):
    from transformers import BertTokenizerFast

    return BertTokenizerFast.from_pretrained(vocab_dir)


def tokenize_prompts(
    tokenizer, prompts: list[str], max_length: int = 77
) -> np.ndarray:
    """[len(prompts), max_length] int32 token ids, padded to max_length."""
    out = tokenizer(
        prompts,
        truncation=True,
        max_length=max_length,
        padding="max_length",
    )["input_ids"]
    return np.asarray(out, dtype=np.int32)


def cfg_token_ids(
    tokenizer, prompt, batch_size: int, max_length: int = 77,
    negative_prompt: str = "",
) -> np.ndarray:
    """[2B, L] ids: B copies of the tokenized ``negative_prompt`` (uncond
    half — "" by default, the reference semantics, run_ldm_sampler.py:28-46)
    then the B cond rows.

    ``prompt`` may be a single string (tiled over the batch, the reference
    semantics) or a list of ``batch_size`` strings — per-example prompts in
    one CFG batch (additive; the reference only samples one prompt).
    ``negative_prompt`` steers the guidance direction *away* from its
    content (standard CFG negative-prompting: the uncond branch becomes a
    negated condition; additive — the reference hard-codes "")."""
    prompts = [prompt] if isinstance(prompt, str) else list(prompt)
    if len(prompts) not in (1, batch_size):
        raise ValueError(
            f"text_prompt must be one string or a list of {batch_size}, "
            f"got {len(prompts)} prompts"
        )
    ids = tokenize_prompts(
        tokenizer, [negative_prompt] + prompts, max_length
    )
    uncond, cond = ids[0], ids[1:]
    if cond.shape[0] == 1:
        cond = np.tile(cond, (batch_size, 1))
    return np.concatenate([np.tile(uncond, (batch_size, 1)), cond])


def packed_cfg_token_ids(
    tokenizer, prompts: list[str], negative_prompts: list[str],
    max_length: int = 77,
) -> np.ndarray:
    """[2B, L] ids for a micro-batched CFG call: per-slot uncond rows
    (one negative prompt PER slot, unlike :func:`cfg_token_ids`'s single
    shared negative) followed by the per-slot cond rows.

    Used by the serving loop (cli/serve_ldm.py) to pack several requests
    — each with its own prompt/negative — into one compiled pipeline
    call.  Beyond reference (the reference samples one prompt per run,
    run_ldm_sampler.py:28-46)."""
    if len(prompts) != len(negative_prompts):
        raise ValueError(
            f"{len(prompts)} prompts vs {len(negative_prompts)} negatives"
        )
    ids = tokenize_prompts(
        tokenizer, list(negative_prompts) + list(prompts), max_length
    )
    return ids  # already [uncond rows; cond rows]


def null_condition_ids(batch_size: int, max_length: int = 77) -> np.ndarray:
    """Tokenized "" = [CLS][SEP] pad ids, tiled over the batch
    (run_ldm_trainer.py:71-75)."""
    row = np.zeros((max_length,), dtype=np.int64)
    row[0], row[1] = 101, 102
    return np.tile(row, (batch_size, 1))
