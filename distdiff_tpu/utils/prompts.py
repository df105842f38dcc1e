"""Prompt template banks (reference ``utils/prompts_helper.py``): the
standard CLIP ensemble "photo" templates plus hooks for per-dataset CuPL
sentence banks (loaded from ``data/{dataset}_le.pkl`` by SDDataset when
``--language_enhance`` is on)."""

from __future__ import annotations

from typing import Dict, List, Sequence

# The 7-template "photo" ensemble commonly used for zero-shot heads.
PHOTO_TEMPLATES: List[str] = [
    "itap of a {}.",
    "a bad photo of the {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
]

SIMPLE_TEMPLATE = "a photo of a {}."


def expand_templates(
    classnames: Sequence[str], templates: Sequence[str] = PHOTO_TEMPLATES
) -> Dict[str, List[str]]:
    """class -> list of filled prompt sentences."""
    return {c: [t.format(c) for t in templates] for c in classnames}


def zero_shot_prompts(classnames: Sequence[str]) -> List[str]:
    """One simple prompt per class (the reference's zero-shot head uses the
    per-dataset CUSTOM_TEMPLATES; this is the generic fallback)."""
    return [SIMPLE_TEMPLATE.format(c) for c in classnames]
