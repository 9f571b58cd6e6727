"""Named-embedder resolution.

The reference selects the content encoder by name — contentvec (the
default) or language-specialized HuBERT bases — and loads the matching
checkpoint from its models dir (`rvc/lib/utils.py:load_embedding`,
`rvc_cli.py:765-775`: contentvec | chinese-hubert-base |
japanese-hubert-base | korean-hubert-base | custom). All variants share
the HuBERT-base architecture, so they load through the same converter
(`rvc_tpu/utils/weights.py:convert_hubert_state_dict`).
"""

from __future__ import annotations

import os
from typing import Optional

EMBEDDER_MODELS = (
    "contentvec",
    "chinese-hubert-base",
    "japanese-hubert-base",
    "korean-hubert-base",
    "custom",
)

_CKPT_NAMES = ("model.safetensors", "pytorch_model.bin", "model.pt",
               "model.pth")


def models_dir() -> str:
    return os.environ.get("RVC_TPU_MODELS_DIR", "models")


def resolve_embedder(embedder_model: str = "contentvec",
                     embedder_model_custom: Optional[str] = None,
                     ) -> Optional[str]:
    """Return the checkpoint path for a named embedder, or None when the
    default contentvec is requested but not present locally (callers
    fall back to random init — benchmarks/tests run weight-free).

    A non-default embedder that cannot be found raises: the user asked
    for specific weights, silently substituting others would convert
    with the wrong content encoder.
    """
    if embedder_model not in EMBEDDER_MODELS:
        raise ValueError(
            f"unknown embedder_model {embedder_model!r}; choose from "
            f"{list(EMBEDDER_MODELS)}")
    if embedder_model == "custom":
        if not embedder_model_custom:
            raise ValueError(
                "embedder_model='custom' requires embedder_model_custom "
                "(path to the checkpoint)")
        if not os.path.exists(embedder_model_custom):
            raise FileNotFoundError(
                f"custom embedder not found: {embedder_model_custom}")
        return embedder_model_custom

    root = os.path.join(models_dir(), "embedders", embedder_model)
    for name in _CKPT_NAMES:
        p = os.path.join(root, name)
        if os.path.exists(p):
            return p
    if embedder_model == "contentvec":
        return None
    raise FileNotFoundError(
        f"embedder {embedder_model!r} not found under {root}; fetch it "
        f"with `rvc-tpu prerequisites --embedders` or place one of "
        f"{_CKPT_NAMES} there")
