"""Model download helper (parity with `gpt-fast/scripts/download.py:12-22`).

Thin wrapper over `huggingface_hub.snapshot_download`, restricted to the
files the loader consumes. Requires network access; in hermetic
environments point `--checkpoint` at an existing local snapshot instead.
"""

from __future__ import annotations

import os
from typing import Optional


def hf_download(repo_id: str, out_dir: str,
                hf_token: Optional[str] = None) -> str:
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover
        raise ImportError("huggingface_hub is required for downloading") from e

    os.makedirs(out_dir, exist_ok=True)
    path = snapshot_download(
        repo_id,
        local_dir=os.path.join(out_dir, repo_id.replace("/", "--")),
        token=hf_token,
        allow_patterns=[
            "*.safetensors", "*.json", "tokenizer.model", "*.txt",
        ],
    )
    return path
