"""Caption -> embedding for the text-conditioned generator.

Parity with the reference's frozen CLIP text encoder
(`generator_3_self_attn.py:64-75`, commented-in in `generator_3.py`): the
encoder runs OUTSIDE the TPU graph (host-side torch CPU via transformers);
the generator consumes the pooled embedding through its `textConditioned`
path. Gated: requires locally cached CLIP weights (this environment has no
egress), otherwise raises with instructions.
"""
import logging
from typing import List, Optional

import numpy as np

logger = logging.getLogger("mcquic_tpu.text")

_MODEL = "openai/clip-vit-base-patch32"


class ClipTextEncoder:
    """Frozen CLIP text encoder; returns pooled embeddings [n, 512]."""

    def __init__(self, modelName: str = _MODEL):
        try:
            from transformers import CLIPProcessor, CLIPTextModel
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("transformers is required for text conditioning") from e
        try:
            self._model = CLIPTextModel.from_pretrained(modelName, local_files_only=True)
            self._processor = CLIPProcessor.from_pretrained(modelName, local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f"CLIP weights for {modelName} are not cached locally and this "
                "environment cannot download them. Pre-cache with "
                "`transformers-cli download` on a connected machine, or feed "
                "precomputed caption embeddings to the generator's "
                "textConditioned path directly.") from e
        self._model.eval()
        for p in self._model.parameters():
            p.requires_grad_(False)

    @property
    def dim(self) -> int:
        return self._model.config.hidden_size

    def __call__(self, captions: List[str]) -> np.ndarray:
        import torch
        batch = self._processor(text=captions, return_tensors="pt", padding=True,
                                truncation=True)
        with torch.no_grad():
            out = self._model(batch.input_ids, attention_mask=batch.attention_mask,
                              return_dict=True)
        return out.pooler_output.numpy()


def tryLoadTextEncoder(modelName: str = _MODEL) -> Optional[ClipTextEncoder]:
    try:
        return ClipTextEncoder(modelName)
    except RuntimeError as e:
        logger.warning("text encoder unavailable: %s", e)
        return None
